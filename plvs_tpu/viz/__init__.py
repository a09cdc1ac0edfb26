"""Visualization layer (headless-first).

TPU-native replacement for the reference's Pangolin/OpenGL viewer stack
(reference: src/Viewer.cc, src/FrameDrawer.cc, src/MapDrawer.cc,
src/PointCloudDrawer.cc + GLSL programs under Shaders/, and the optional
Rerun stream include/RerunSingleton.h). The GL pipeline is replaced by:

* ``frame_drawer`` — per-frame 2D overlays (keypoints, keylines, tracking
  state) rendered into numpy RGB images;
* ``map_drawer`` — 3D map rendering (keyframe frusta, covisibility graph,
  landmarks, dense cloud) via matplotlib when present, plus PLY export that
  any point-cloud viewer opens;
* ``rerun_logger`` — optional structured streaming when the ``rerun`` SDK is
  importable (no-op otherwise), mirroring the reference's WITH_RERUN flag.
"""

from . import frame_drawer, map_drawer, rerun_logger  # noqa: F401
