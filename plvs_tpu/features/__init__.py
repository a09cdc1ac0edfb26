from . import pyramid, fast, orb, matching  # noqa: F401
