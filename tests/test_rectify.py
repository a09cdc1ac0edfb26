"""Image-level stereo rectification (reference: Camera.needRectification +
cv::stereoRectify maps in Settings, src/Settings.cc:205-207,280): distorted
calibrated pairs are warped to a common row-aligned pinhole pair before the
rectified fast path runs."""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras, rectify
from plvs_tpu.io import synthetic

# distorted pinhole pair with a slightly rotated rig
CAM_L = cameras.pinhole(280.0, 280.0, 160.0, 120.0,
                        dist=(-0.25, 0.06, 0.0, 0.0, 0.0),
                        width=320, height=240)
CAM_R = cameras.pinhole(276.0, 276.0, 158.0, 121.0,
                        dist=(-0.22, 0.05, 0.0, 0.0, 0.0),
                        width=320, height=240)


def _rig_T(baseline=0.12, yaw=0.01):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = synthetic._so3_exp_np(np.array([0.0, yaw, 0.0]))
    T[:3, 3] = [baseline, 0.0, 0.0]
    return T


class TestRectifyGeometry:
    def test_rows_align_and_disparity_matches_depth(self):
        T = _rig_T()
        maps = rectify.stereo_rectify(CAM_L, CAM_R, T)
        rng = np.random.default_rng(0)
        X_l = np.stack([rng.uniform(-1, 1, 64), rng.uniform(-0.7, 0.7, 64),
                        rng.uniform(2.0, 6.0, 64)], -1)
        R_lr, t_lr = T[:3, :3], T[:3, 3]
        X_r = (X_l - t_lr) @ R_lr  # R_lr^T (X - t)
        Xr_l = X_l @ maps.R_rect_l.T
        Xr_r = X_r @ maps.R_rect_r.T
        c = maps.cam
        uv_l = np.stack([c.fx * Xr_l[:, 0] / Xr_l[:, 2] + c.cx,
                         c.fy * Xr_l[:, 1] / Xr_l[:, 2] + c.cy], -1)
        uv_r = np.stack([c.fx * Xr_r[:, 0] / Xr_r[:, 2] + c.cx,
                         c.fy * Xr_r[:, 1] / Xr_r[:, 2] + c.cy], -1)
        # row-aligned epipolar geometry
        np.testing.assert_allclose(uv_l[:, 1], uv_r[:, 1], atol=1e-3)
        # disparity = bf / z_rect
        disp = uv_l[:, 0] - uv_r[:, 0]
        np.testing.assert_allclose(disp, c.bf / Xr_l[:, 2], rtol=1e-4,
                                   atol=1e-3)

    def test_remap_matches_directly_rendered_rectified_view(self):
        T = _rig_T(yaw=0.0)
        rec = rectify.StereoRectifier(CAM_L, CAM_R, T)
        tex = synthetic.make_texture(1024, np.random.default_rng(4))
        scene_d = synthetic.SyntheticRGBD(CAM_L, wall_z=3.0, texture=tex)
        scene_r = synthetic.SyntheticRGBD(rec.cam, wall_z=3.0, texture=tex)
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        gray_d, _ = scene_d.render(R0, t0)
        # the rectified-left frame is rotated by R_rect_l wrt cam_l
        Rr = rec.maps.R_rect_l @ R0
        tr = rec.maps.R_rect_l @ t0
        gray_direct, _ = scene_r.render(Rr.astype(np.float32),
                                        tr.astype(np.float32))
        warped = np.asarray(rectify.remap_bilinear(
            np.asarray(gray_d, np.float32),
            np.asarray(rec.maps.map_l)))
        # compare the interior (borders lose coverage to the warp)
        a = warped[40:-40, 40:-40]
        b = gray_direct[40:-40, 40:-40]
        ok = a > 0
        err = np.abs(a[ok] - b[ok])
        assert np.median(err) < 6.0, np.median(err)


@pytest.mark.slow
class TestRectifiedStereoE2E:
    def test_distorted_input_tracks(self):
        from plvs_tpu.io import evaluation
        from plvs_tpu.slam import System, SystemConfig

        T = _rig_T()
        tex = synthetic.make_structured_texture(
            1024, np.random.default_rng(5))
        scene_l = synthetic.SyntheticRGBD(CAM_L, wall_z=3.0, texture=tex)
        scene_r = synthetic.SyntheticRGBD(CAM_R, wall_z=3.0, texture=tex)
        cfg = SystemConfig(sensor="stereo", num_features=512, n_levels=4,
                           max_kf=64, max_pts=16384, rectify=True,
                           loop_closing=False)
        system = System(CAM_L, cfg, cam2=CAM_R, T_c1_c2=T)
        assert system.rectifier is not None
        R_lr, t_lr = T[:3, :3], T[:3, 3]
        gt = []
        for ts, gray_l, _d, R_gt, t_gt in scene_l.sequence(n_frames=20):
            # render the right view through the rig extrinsics
            R_r = (R_lr.T @ R_gt).astype(np.float32)
            t_r = (R_lr.T @ (t_gt - R_gt @ (-t_lr) * 0
                             ) - R_lr.T @ t_lr * 0).astype(np.float32)
            # X_c2 = R_lr^T (X_c1 - t_lr); X_c1 = R_gt X_w + t_gt
            t_r = (R_lr.T @ t_gt - R_lr.T @ t_lr).astype(np.float32)
            gray_r, _ = scene_r.render(R_r, t_r)
            system.track_stereo(gray_l, gray_r, ts)
            gt.append(-R_gt.T @ t_gt)
        traj = system.trajectory_tum()
        # the rectified world frame is rotated by R_rect_l: aligned ATE
        rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        assert rmse < 0.08, rmse
        assert system.store.num_keyframes >= 2
