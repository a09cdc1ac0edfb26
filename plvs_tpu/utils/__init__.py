from . import logging, profiling  # noqa: F401
