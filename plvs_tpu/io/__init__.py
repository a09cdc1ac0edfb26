from . import evaluation, synthetic  # noqa: F401
