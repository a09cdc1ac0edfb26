from . import mapping, meshing, processing, stereo_depth, tsdf  # noqa: F401
