import jax
import jax.numpy as jnp
import numpy as np

from plvs_tpu.geometry import cameras, lie
from plvs_tpu.solvers import ba, pose_opt, robust


CAM = cameras.pinhole(520.0, 520.0, 320.0, 240.0, width=640, height=480, bf=40.0)


def synth_scene(rng, n=200):
    Xw = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n), rng.uniform(3.0, 8.0, n)], -1
    ).astype(np.float32)
    return jnp.asarray(Xw)


def perturbed_pose(rng, scale_rot=0.05, scale_t=0.1):
    w = rng.normal(size=3).astype(np.float32) * scale_rot
    t = rng.normal(size=3).astype(np.float32) * scale_t
    return lie.so3_exp(jnp.asarray(w)), jnp.asarray(t)


class TestRobust:
    def test_huber(self):
        w = robust.huber_weight(jnp.array([1.0, 5.991, 24.0]), 5.991)
        np.testing.assert_allclose(w[0], 1.0)
        np.testing.assert_allclose(w[1], 1.0, atol=1e-6)
        assert w[2] < 0.51


class TestPoseOpt:
    def test_converges_mono(self, rng):
        Xw = synth_scene(rng)
        R_gt, t_gt = perturbed_pose(rng, 0.3, 0.5)
        uv = cameras.project(CAM, lie.se3_apply(R_gt, t_gt, Xw))
        uvr = jnp.concatenate([uv, -jnp.ones((200, 1))], axis=-1)
        obs = pose_opt.make_pose_obs(
            Xw, uvr, jnp.ones((200,)), jnp.ones((200,), bool)
        )
        R0, t0 = perturbed_pose(rng, 0.03, 0.05)
        R0, t0 = R_gt @ R0, t_gt + t0
        R, t, inl, _, n_inl = pose_opt.pose_optimize(CAM, R0, t0, obs)
        np.testing.assert_allclose(R, R_gt, atol=1e-3)
        np.testing.assert_allclose(t, t_gt, atol=1e-3)
        assert int(n_inl) > 190

    def test_converges_stereo_with_outliers(self, rng):
        n = 300
        Xw = synth_scene(rng, n)
        R_gt, t_gt = perturbed_pose(rng, 0.2, 0.4)
        Xc = lie.se3_apply(R_gt, t_gt, Xw)
        uv = cameras.project(CAM, Xc)
        uR = uv[:, 0] - CAM.bf / Xc[:, 2]
        uvr = jnp.concatenate([uv, uR[:, None]], axis=-1)
        # corrupt 20% with gross outliers + add pixel noise
        noise = jnp.asarray(rng.normal(size=(n, 3)) * 0.3, jnp.float32)
        uvr = uvr + noise
        n_out = n // 5
        out_idx = rng.choice(n, n_out, replace=False)
        uvr = uvr.at[out_idx].add(
            jnp.asarray(rng.uniform(30, 80, (n_out, 3)) * rng.choice([-1, 1], (n_out, 3)), jnp.float32)
        )
        obs = pose_opt.make_pose_obs(Xw, uvr, jnp.ones((n,)), jnp.ones((n,), bool))
        dR, dt = perturbed_pose(rng, 0.02, 0.05)
        R, t, inl, _, n_inl = pose_opt.pose_optimize(CAM, dR @ R_gt, t_gt + dt, obs)
        err_rot = np.linalg.norm(np.asarray(lie.so3_log(R @ R_gt.T)))
        err_t = np.linalg.norm(np.asarray(t - t_gt))
        assert err_rot < 2e-3, err_rot
        assert err_t < 5e-3, err_t
        # most outliers flagged
        assert np.asarray(inl)[out_idx].mean() < 0.2

    def test_with_lines(self, rng):
        n, nl = 120, 40
        Xw = synth_scene(rng, n)
        R_gt, t_gt = perturbed_pose(rng, 0.2, 0.3)
        uv = cameras.project(CAM, lie.se3_apply(R_gt, t_gt, Xw))
        uvr = jnp.concatenate([uv, -jnp.ones((n, 1))], axis=-1)
        # synthetic 3D segments + their measured image lines under gt pose
        Xs = synth_scene(rng, nl)
        d = rng.normal(size=(nl, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        Xe = Xs + jnp.asarray(d)
        uvs = cameras.project(CAM, lie.se3_apply(R_gt, t_gt, Xs))
        uve = cameras.project(CAM, lie.se3_apply(R_gt, t_gt, Xe))
        dl = uve - uvs
        nrm = jnp.stack([-dl[:, 1], dl[:, 0]], axis=-1)
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        dd = -jnp.sum(nrm * uvs, axis=-1)
        nld = jnp.concatenate([nrm, dd[:, None]], axis=-1)
        obs = pose_opt.make_pose_obs(
            Xw, uvr, jnp.ones((n,)), jnp.ones((n,), bool),
            Xs, Xe, nld, jnp.ones((nl,)), jnp.ones((nl,), bool),
        )
        dR, dt = perturbed_pose(rng, 0.02, 0.04)
        R, t, _, l_inl, _ = pose_opt.pose_optimize(CAM, dR @ R_gt, t_gt + dt, obs)
        np.testing.assert_allclose(R, R_gt, atol=2e-3)
        np.testing.assert_allclose(t, t_gt, atol=2e-3)
        assert np.asarray(l_inl).mean() > 0.9


class TestBA:
    def _make_problem(self, rng, K=6, P=300, noise=0.3, drop=0.3):
        Xw = np.stack(
            [rng.uniform(-3, 3, P), rng.uniform(-2, 2, P), rng.uniform(4.0, 10.0, P)], -1
        ).astype(np.float32)
        R_gt = np.zeros((K, 3, 3), np.float32)
        t_gt = np.zeros((K, 3), np.float32)
        for k in range(K):
            Rk = lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.05, jnp.float32))
            R_gt[k] = np.asarray(Rk)
            t_gt[k] = np.array([-0.3 * k, 0, 0], np.float32) + rng.normal(size=3).astype(np.float32) * 0.02
        R_gt, t_gt = jnp.asarray(R_gt), jnp.asarray(t_gt)
        Xw = jnp.asarray(Xw)

        obs_cam, obs_pt, obs_uvr = [], [], []
        for k in range(K):
            Xc = lie.se3_apply(R_gt[k], t_gt[k], Xw)
            uv = cameras.project(CAM, Xc)
            vis = np.asarray(cameras.in_image(CAM, uv)) & (np.asarray(Xc[:, 2]) > 0.5)
            keep = vis & (rng.uniform(size=P) > drop)
            idx = np.nonzero(keep)[0]
            obs_cam.append(np.full(len(idx), k, np.int32))
            obs_pt.append(idx.astype(np.int32))
            u = np.asarray(uv)[idx] + rng.normal(size=(len(idx), 2)) * noise
            obs_uvr.append(np.concatenate([u, -np.ones((len(idx), 1))], -1).astype(np.float32))
        obs_cam = jnp.asarray(np.concatenate(obs_cam))
        obs_pt = jnp.asarray(np.concatenate(obs_pt))
        obs_uvr = jnp.asarray(np.concatenate(obs_uvr))
        M = obs_cam.shape[0]
        fixed = jnp.zeros((K,), bool).at[0].set(True).at[1].set(True)
        # perturb initial estimates
        R0 = np.asarray(R_gt).copy()
        t0 = np.asarray(t_gt).copy()
        for k in range(K):
            if not bool(fixed[k]):
                R0[k] = np.asarray(
                    lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.01, jnp.float32)) @ R_gt[k]
                )
                t0[k] = t_gt[k] + rng.normal(size=3).astype(np.float32) * 0.03
        pts0 = Xw + jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32) * 0.05)
        prob = ba.make_problem(
            jnp.asarray(R0), jnp.asarray(t0), fixed, pts0,
            obs_cam, obs_pt, obs_uvr, jnp.ones((M,)), jnp.ones((M,), bool),
        )
        return prob, R_gt, t_gt, Xw

    def test_ba_reduces_error(self, rng):
        prob, R_gt, t_gt, Xw = self._make_problem(rng)
        R, t, pts, _, _, info = ba.bundle_adjust(CAM, prob, num_iters=12, cg_iters=50)
        assert float(info["cost"]) < float(info["cost0"]) * 0.1
        # camera error after << before
        err_t0 = np.linalg.norm(np.asarray(prob.t - t_gt), axis=-1).max()
        err_t = np.linalg.norm(np.asarray(t - t_gt), axis=-1).max()
        assert err_t < err_t0 * 0.35, (err_t0, err_t)
        err_p0 = np.linalg.norm(np.asarray(prob.points - Xw), axis=-1)
        err_p = np.linalg.norm(np.asarray(pts - Xw), axis=-1)
        assert np.median(err_p) < np.median(err_p0) * 0.35

    def test_fixed_cameras_unchanged(self, rng):
        prob, *_ = self._make_problem(rng)
        R, t, *_ = ba.bundle_adjust(CAM, prob, num_iters=4, cg_iters=20)
        np.testing.assert_allclose(R[:2], prob.R[:2], atol=1e-7)
        np.testing.assert_allclose(t[:2], prob.t[:2], atol=1e-7)

    def test_ba_jit_compiles_once(self, rng):
        prob, *_ = self._make_problem(rng, K=4, P=100)
        f = jax.jit(lambda p: ba.bundle_adjust(CAM, p, num_iters=2, cg_iters=10))
        out1 = f(prob)
        out2 = f(prob._replace(points=prob.points + 0.01))
        assert np.isfinite(float(out1[-1]["cost"]))
        assert np.isfinite(float(out2[-1]["cost"]))
