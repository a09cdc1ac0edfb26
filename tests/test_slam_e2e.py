"""End-to-end RGB-D SLAM on a synthetic ground-truth sequence."""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import evaluation, synthetic
from plvs_tpu.slam import System, SystemConfig


CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240, bf=24.0)


@pytest.fixture(scope="module")
def slam_run():
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=1)
    cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64, max_pts=16384)
    system = System(CAM, cfg)
    gt = []
    states = []
    for ts, gray, depth, R_gt, t_gt in scene.sequence(n_frames=40):
        state, R, t = system.track_rgbd(gray, depth, ts)
        gt.append((R_gt, t_gt))
        states.append(state)
    return system, gt, states


class TestE2E:
    def test_tracking_never_lost(self, slam_run):
        _, _, states = slam_run
        from plvs_tpu.slam.tracking import OK
        # all frames after the first should be tracked
        assert all(s == OK for s in states[1:]), states

    def test_ate_small(self, slam_run):
        system, gt, _ = slam_run
        traj = system.trajectory_tum()
        est_xyz = traj[:, 1:4]
        gt_xyz = np.stack([-R.T @ t for R, t in gt])
        rmse_raw = evaluation.ate_rmse(est_xyz, gt_xyz, align=False)
        rmse = evaluation.ate_rmse(est_xyz, gt_xyz, align=True)
        # camera travels ~0.9m; require cm-level ATE on this easy scene
        assert rmse < 0.03, (rmse, rmse_raw)

    def test_map_grows(self, slam_run):
        system, _, _ = slam_run
        stats = system.map_statistics()
        assert stats["keyframes"] >= 2
        assert stats["points"] > 300
        assert stats["frames"] == 40


class TestEvaluation:
    def test_umeyama_recovers_transform(self, rng):
        src = rng.normal(size=(100, 3))
        import jax.numpy as jnp
        from plvs_tpu.geometry import lie
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
        t_gt = np.array([1.0, -2.0, 0.5])
        dst = (1.7 * (R_gt @ src.T)).T + t_gt
        s, R, t = evaluation.umeyama_alignment(src, dst, with_scale=True)
        np.testing.assert_allclose(s, 1.7, rtol=1e-5)
        np.testing.assert_allclose(R, R_gt, atol=1e-5)
        assert evaluation.ate_rmse(src, dst, align=True, with_scale=True) < 1e-5

    def test_benchmark_gate(self):
        stats = evaluation.benchmark_statistics(
            [0.01, 0.012, 0.011, 0.5], [0.0, 0.01, 0.02, 0.5]
        )
        assert not stats["failed"]
        assert stats["discarded"] == 1
        np.testing.assert_allclose(stats["median_rmse"], 0.011)
        stats2 = evaluation.benchmark_statistics([0.01] * 4, [0.5] * 4)
        assert stats2["failed"]
