from . import lie, cameras, triangulation  # noqa: F401
