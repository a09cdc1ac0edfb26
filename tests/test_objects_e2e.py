"""MapObject integration: detection at keyframes, Sim3 refinement in the
backend, correction at loop closure (VERDICT r1 item 8; reference:
src/Tracking.cc:1510-1544 detection, src/Optimizer.cc:1115-1196 refinement,
object update in CorrectLoop)."""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import synthetic
from plvs_tpu.slam import System, SystemConfig

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                      bf=24.0)

# full 25-frame sequence with object detection at every KF: too heavy for
# the default gate (object-store units stay in tests/test_map_objects.py)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def object_run():
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=1)
    cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                       max_pts=16384)
    system = System(CAM, cfg)
    # the object template is a crop of the wall texture itself: a known
    # world-plane rectangle at z = wall_z, placed in the middle of the
    # camera sweep's field of view
    crop_px = 256
    off_px = 20
    tpl_img = scene.tex[off_px:off_px + crop_px, off_px:off_px + crop_px]
    metric_w = crop_px / scene.tex_scale
    oid = system.add_map_object(tpl_img, metric_w)
    for ts, gray, depth, R_gt, t_gt in scene.sequence(n_frames=25):
        system.track_rgbd(gray, depth, ts)
    return system, oid, off_px / scene.tex_scale, metric_w


class TestObjectIntegration:
    def test_detected_during_tracking(self, object_run):
        system, oid, off_m, metric_w = object_run
        rec = system.object_store.objects[oid]
        assert rec.detected, "object never detected at any keyframe"
        assert len(rec.obs) >= 1

    def test_pose_matches_wall_plane(self, object_run):
        system, oid, off_m, metric_w = object_run
        rec = system.object_store.objects[oid]
        corners = rec.corners_world()
        assert corners is not None
        # all corners on the wall plane z = 3 (tolerance: SLAM drift + Sim3)
        assert np.allclose(corners[:, 2], 3.0, atol=0.25), corners[:, 2]
        # corner xy near the known crop rectangle
        exp0 = np.array([off_m, off_m])
        assert np.linalg.norm(corners[0, :2] - exp0) < 0.25, (
            corners[0, :2], exp0)
        # size preserved by the Sim3 refinement
        w_est = np.linalg.norm(corners[1] - corners[0])
        assert abs(w_est - metric_w) < 0.2 * metric_w, (w_est, metric_w)

    def test_loop_correction_moves_object(self, object_run):
        system, oid, _, _ = object_run
        rec = system.object_store.objects[oid]
        if not rec.detected:
            pytest.skip("not detected")
        st = system.store
        lc = system.loop_closer
        live = np.nonzero(st.kf_mask)[0]
        if len(live) < 3:
            pytest.skip("too few keyframes")
        before = rec.t_wo.copy()
        R_rel = np.eye(3, dtype=np.float32)
        t_rel = np.array([0.25, 0.0, 0.0], np.float32)
        lc._correct(int(live[-1]), int(live[0]), R_rel, t_rel,
                    fuse_pairs=[])
        moved = np.linalg.norm(rec.t_wo - before)
        assert moved > 1e-3, "object did not move with the loop correction"
