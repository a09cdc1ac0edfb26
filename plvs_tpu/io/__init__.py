from . import datasets, evaluation, serialization, synthetic, trajectory  # noqa: F401
