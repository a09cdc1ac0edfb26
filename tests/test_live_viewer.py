"""Interactive live viewer (reference: Pangolin Viewer menu controls,
src/Viewer.cc:305-393): HTTP state snapshots + pause/resume/save verbs,
exercised end-to-end against a running System through a real socket."""

import json
import os
import urllib.request

import numpy as np

from plvs_tpu.geometry import cameras
from plvs_tpu.io import synthetic
from plvs_tpu.slam import System, SystemConfig
from plvs_tpu.viz.live_server import LiveViewer

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                      bf=24.0)


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}",
                                timeout=10) as r:
        return r.read()


class TestLiveViewer:
    def test_state_and_controls(self, tmp_path):
        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=0)
        system = System(CAM, SystemConfig(num_features=512, n_levels=4,
                                          max_kf=64, max_pts=16384,
                                          local_ba=False,
                                          loop_closing=False))
        for ts, gray, depth, _, _ in scene.sequence(n_frames=6):
            system.track_rgbd(gray, depth, ts)
        save_path = os.path.join(tmp_path, "live_map.npz")
        viewer = LiveViewer(system, save_path=save_path)
        try:
            page = _get(viewer.port, "/")
            assert b"canvas" in page
            assert b"webgl" in page  # 3-D renderer served
            state = json.loads(_get(viewer.port, "/state.json"))
            assert state["stats"]["keyframes"] >= 1
            assert len(state["trajectory"]) == 6
            assert len(state["points"]) > 0
            assert state["pose"] is not None
            # 3-D payload: line landmarks, covisibility edges, camera
            # frustum (reference: MapDrawer draws all three)
            assert "lines" in state and "covis" in state
            assert state["frustum"] is not None
            assert len(state["frustum"]) == 12
            mesh = json.loads(_get(viewer.port, "/mesh.json"))
            assert "tris" in mesh  # empty without a dense mapper
            # the camera moved along +x; the last pose must reflect that
            assert state["trajectory"][-1][0] > state["trajectory"][0][0]

            _get(viewer.port, "/cmd?op=pause")
            assert json.loads(_get(viewer.port, "/state.json"))["paused"]
            viewer.wait_if_paused(timeout=0.1)  # returns via timeout
            _get(viewer.port, "/cmd?op=resume")
            assert not json.loads(_get(viewer.port, "/state.json"))["paused"]

            _get(viewer.port, "/cmd?op=save")
            assert os.path.exists(save_path)

            _get(viewer.port, "/cmd?op=localization")
            assert system.tracker.only_tracking
            _get(viewer.port, "/cmd?op=mapping")
            assert not system.tracker.only_tracking
        finally:
            viewer.close()
