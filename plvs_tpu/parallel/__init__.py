from . import pipeline, sharded_ba, sharded_pose_graph, sharded_tsdf  # noqa: F401
