import jax
import jax.numpy as jnp
import pytest
import numpy as np

from plvs_tpu.geometry import lie
from plvs_tpu.imu import preintegration as pre


def simulate_trajectory(T=200, dt=0.005, seed=0):
    """Ground-truth body trajectory + perfect IMU measurements.

    Body rotates with varying angular velocity and accelerates in world;
    accelerometer measures specific force f_b = R_wb^T (a_w - g).
    """
    rng = np.random.default_rng(seed)
    g = np.array([0.0, 0.0, -9.81], np.float32)
    R = np.eye(3, dtype=np.float32)
    p = np.zeros(3, np.float32)
    v = np.array([0.3, -0.1, 0.05], np.float32)
    gyros, accs, dts = [], [], []
    states = [(R.copy(), p.copy(), v.copy())]
    for i in range(T):
        t = i * dt
        w = np.array([0.4 * np.sin(t * 3), 0.3 * np.cos(t * 2), 0.2], np.float32)
        a_w = np.array(
            [0.5 * np.sin(t * 4), 0.4 * np.cos(t * 3), 0.3 * np.sin(t * 2)], np.float32
        )
        f_b = R.T @ (a_w - g)
        gyros.append(w)
        accs.append(f_b)
        dts.append(dt)
        # integrate ground truth (same order as preintegration: p,v with old R)
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
        states.append((R.copy(), p.copy(), v.copy()))
    return (
        jnp.asarray(np.stack(gyros)), jnp.asarray(np.stack(accs)),
        jnp.asarray(np.asarray(dts, np.float32)), states,
    )


class TestPreintegration:
    def test_zero_motion(self):
        T = 50
        g = np.array([0, 0, -9.81], np.float32)
        gyro = jnp.zeros((T, 3))
        acc = jnp.tile(jnp.asarray(-g), (T, 1))  # stationary: f = -g in body
        dts = jnp.full((T,), 0.01)
        p = pre.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(p.dR, np.eye(3), atol=1e-6)
        r = pre.inertial_residual(
            p, jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(r, 0.0, atol=1e-4)

    def test_residual_zero_on_true_states(self):
        gyro, acc, dts, states = simulate_trajectory()
        p = pre.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3))
        R1, p1, v1 = states[0]
        R2, p2, v2 = states[-1]
        r = pre.inertial_residual(
            p, jnp.asarray(R1), jnp.asarray(p1), jnp.asarray(v1),
            jnp.asarray(R2), jnp.asarray(p2), jnp.asarray(v2),
            jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-3)

    def test_bias_jacobians_first_order(self):
        gyro, acc, dts, _ = simulate_trajectory(T=100)
        b0g = jnp.zeros(3)
        b0a = jnp.zeros(3)
        p0 = pre.preintegrate(gyro, acc, dts, b0g, b0a)
        db_g = jnp.asarray([0.002, -0.001, 0.0015])
        db_a = jnp.asarray([0.01, -0.02, 0.015])
        # exact re-integration at the new bias
        p1 = pre.preintegrate(gyro, acc, dts, b0g + db_g, b0a + db_a)
        # first-order corrected getters from the old preintegration
        dR_corr = pre.delta_rotation(p0, b0g + db_g)
        dV_corr = pre.delta_velocity(p0, b0g + db_g, b0a + db_a)
        dP_corr = pre.delta_position(p0, b0g + db_g, b0a + db_a)
        err_R = np.linalg.norm(np.asarray(lie.so3_log(p1.dR.T @ dR_corr)))
        assert err_R < 5e-5, err_R
        np.testing.assert_allclose(dV_corr, p1.dV, atol=5e-4)
        np.testing.assert_allclose(dP_corr, p1.dP, atol=5e-4)

    def test_covariance_psd_and_grows(self):
        gyro, acc, dts, _ = simulate_trajectory(T=100)
        p_half = pre.preintegrate(gyro[:50], acc[:50], dts[:50], jnp.zeros(3), jnp.zeros(3))
        p_full = pre.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3))
        for p in (p_half, p_full):
            eig = np.linalg.eigvalsh(np.asarray(p.cov))
            assert eig.min() > -1e-10
        assert np.trace(np.asarray(p_full.cov)) > np.trace(np.asarray(p_half.cov))

    def test_masked_samples_ignored(self):
        gyro, acc, dts, _ = simulate_trajectory(T=100)
        mask = jnp.arange(100) < 60
        p_m = pre.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3), mask=mask)
        p_60 = pre.preintegrate(gyro[:60], acc[:60], dts[:60], jnp.zeros(3), jnp.zeros(3))
        np.testing.assert_allclose(p_m.dR, p_60.dR, atol=1e-6)
        np.testing.assert_allclose(p_m.dP, p_60.dP, atol=1e-6)
        np.testing.assert_allclose(float(p_m.dT), float(p_60.dT), atol=1e-6)

    def test_gravity_only_freefall(self):
        """Free-fall body (zero specific force): dP = 0 in the preintegrated
        frame; world position follows 0.5 g t^2 via the residual model."""
        T = 100
        dt = 0.01
        gyro = jnp.zeros((T, 3))
        acc = jnp.zeros((T, 3))
        dts = jnp.full((T,), dt)
        p = pre.preintegrate(gyro, acc, dts, jnp.zeros(3), jnp.zeros(3))
        tt = T * dt
        g = np.array([0, 0, -9.81])
        p2 = 0.5 * g * tt ** 2
        v2 = g * tt
        r = pre.inertial_residual(
            p, jnp.eye(3), jnp.zeros(3), jnp.zeros(3),
            jnp.eye(3), jnp.asarray(p2, jnp.float32), jnp.asarray(v2, jnp.float32),
            jnp.zeros(3), jnp.zeros(3),
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-4)


class TestInertialInit:
    @pytest.mark.slow
    def test_recovers_gravity_scale_bias(self):
        """Simulate KFs on a trajectory with tilted gravity, scaled visual
        map and nonzero biases; the init must recover all of them."""
        from plvs_tpu.imu import initialization as ini

        dt = 0.005
        n_kf = 8
        steps_per_kf = 40
        rng = np.random.default_rng(1)
        true_bg = np.array([0.004, -0.003, 0.002], np.float32)
        true_ba = np.array([0.05, -0.03, 0.08], np.float32)
        # gravity tilted by a small rotation
        g_rot = np.asarray(lie.so3_exp(jnp.asarray([0.06, -0.04, 0.0], jnp.float32)))
        g_w = g_rot @ np.array([0, 0, -9.81], np.float32)

        R = np.eye(3, dtype=np.float32); p = np.zeros(3, np.float32)
        v = np.array([0.2, 0.1, -0.05], np.float32)
        kf_R, kf_p = [R.copy()], [p.copy()]
        preints = []
        gyro_buf, acc_buf = [], []
        for i in range(n_kf - 1):
            gy, ac = [], []
            for k in range(steps_per_kf):
                t = (i * steps_per_kf + k) * dt
                w = np.array([0.5 * np.sin(3 * t), 0.4 * np.cos(2 * t), 0.3], np.float32)
                a_w = np.array([0.6 * np.sin(4 * t), 0.5 * np.cos(3 * t), 0.4 * np.sin(2 * t)], np.float32)
                f_b = R.T @ (a_w - g_w)
                gy.append(w + true_bg); ac.append(f_b + true_ba)
                p = p + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
            kf_R.append(R.copy()); kf_p.append(p.copy())
            preints.append(pre.preintegrate(
                jnp.asarray(np.stack(gy)), jnp.asarray(np.stack(ac)),
                jnp.full((steps_per_kf,), dt), jnp.zeros(3), jnp.zeros(3)))

        true_scale = 2.5  # visual map is metric/2.5
        R_wb = jnp.asarray(np.stack(kf_R))
        p_wb = jnp.asarray(np.stack(kf_p) / true_scale)
        out = ini.inertial_only_optimize(R_wb, p_wb, ini.stack_preints(preints))
        np.testing.assert_allclose(float(out.scale), true_scale, rtol=0.03)
        np.testing.assert_allclose(np.asarray(out.gravity), g_w, atol=0.15)
        np.testing.assert_allclose(np.asarray(out.bias_gyro), true_bg, atol=2e-3)


class TestVIBA:
    @pytest.mark.slow
    def test_recovers_perturbed_states(self):
        """Simulated VI setup: camera observes landmarks from body poses,
        IMU preintegrations between keyframes; perturbed states + points
        must converge back (reference: Optimizer::LocalInertialBA)."""
        from plvs_tpu.geometry import cameras
        from plvs_tpu.solvers import vi_ba

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=24.0)
        dt = 0.005
        spk = 40
        K = 6
        g_w = np.array([0, 0, -9.81], np.float32)
        true_bg = np.array([0.002, -0.001, 0.0015], np.float32)
        true_ba = np.array([0.02, -0.01, 0.03], np.float32)

        R = np.eye(3, dtype=np.float32)
        p = np.zeros(3, np.float32)
        v = np.array([0.4, 0.1, -0.05], np.float32)
        kf_R, kf_p, kf_v = [R.copy()], [p.copy()], [v.copy()]
        preints = []
        for i in range(K - 1):
            gy, ac = [], []
            for k in range(spk):
                t = (i * spk + k) * dt
                w = np.array([0.4 * np.sin(3 * t), 0.3 * np.cos(2 * t), 0.2],
                             np.float32)
                a_w = np.array([0.5 * np.sin(4 * t), 0.4 * np.cos(3 * t),
                                0.3 * np.sin(2 * t)], np.float32)
                f_b = R.T @ (a_w - g_w)
                gy.append(w + true_bg)
                ac.append(f_b + true_ba)
                p = p + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = R @ np.asarray(lie.so3_exp(jnp.asarray(w * dt)))
            kf_R.append(R.copy()); kf_p.append(p.copy()); kf_v.append(v.copy())
            preints.append(pre.preintegrate(
                jnp.asarray(np.stack(gy)), jnp.asarray(np.stack(ac)),
                jnp.full((spk,), dt), jnp.asarray(true_bg),
                jnp.asarray(true_ba)))
        kf_R = np.stack(kf_R); kf_p = np.stack(kf_p); kf_v = np.stack(kf_v)

        # landmarks in front of the trajectory (world z ~ 3-6)
        rng = np.random.default_rng(0)
        P = 300
        pts = np.stack([rng.uniform(-2, 3, P), rng.uniform(-2, 2, P),
                        rng.uniform(2.5, 6.0, P)], -1).astype(np.float32)
        # identity body-camera extrinsics
        R_cb = np.eye(3, dtype=np.float32)
        t_cb = np.zeros(3, np.float32)
        obs_kf, obs_pt, obs_uvr = [], [], []
        from plvs_tpu.geometry import cameras as cmod
        for k in range(K):
            R_cw = R_cb @ kf_R[k].T
            t_cw = -R_cw @ kf_p[k]
            Xc = pts @ R_cw.T + t_cw
            uv = np.asarray(cmod.project(cam, jnp.asarray(Xc)))
            vis = (Xc[:, 2] > 0.3) & np.asarray(
                cmod.in_image(cam, jnp.asarray(uv)))
            idx = np.nonzero(vis)[0]
            obs_kf.append(np.full(len(idx), k, np.int32))
            obs_pt.append(idx.astype(np.int32))
            u = uv[idx] + rng.normal(size=(len(idx), 2)).astype(np.float32) * 0.3
            obs_uvr.append(np.concatenate(
                [u, -np.ones((len(idx), 1), np.float32)], -1))
        obs_kf = np.concatenate(obs_kf); obs_pt = np.concatenate(obs_pt)
        obs_uvr = np.concatenate(obs_uvr)
        M = len(obs_kf)

        # perturb states (except fixed KF0) and points
        pr = np.random.default_rng(1)
        R0 = kf_R.copy(); p0 = kf_p.copy(); v0 = kf_v.copy()
        for k in range(1, K):
            R0[k] = np.asarray(lie.so3_exp(
                jnp.asarray(pr.normal(size=3) * 0.01, jnp.float32))) @ kf_R[k]
            p0[k] = kf_p[k] + pr.normal(size=3).astype(np.float32) * 0.03
            v0[k] = kf_v[k] + pr.normal(size=3).astype(np.float32) * 0.05
        pts0 = pts + pr.normal(size=(P, 3)).astype(np.float32) * 0.03
        fixed = np.zeros((K,), bool); fixed[0] = True

        from plvs_tpu.imu.initialization import stack_preints
        prob = vi_ba.VIProblem(
            jnp.asarray(R0), jnp.asarray(p0), jnp.asarray(v0),
            jnp.zeros((K, 3)), jnp.zeros((K, 3)),
            jnp.asarray(fixed), jnp.ones((K,), bool),
            jnp.asarray(R_cb), jnp.asarray(t_cb),
            jnp.asarray(pts0), jnp.ones((P,), bool),
            jnp.asarray(obs_kf), jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
            jnp.ones((M,)), jnp.ones((M,), bool),
            stack_preints(preints), jnp.ones((K - 1,), bool),
            jnp.asarray(g_w),
        )
        Rn, pn, vn, bgn, ban, ptsn, info = vi_ba.vi_bundle_adjust(
            cam, prob, num_iters=10, cg_iters=40)
        assert float(info["cost"]) < float(info["cost0"]) * 0.2, info
        e_p0 = np.linalg.norm(p0 - kf_p, axis=-1).max()
        e_p = np.linalg.norm(np.asarray(pn) - kf_p, axis=-1).max()
        assert e_p < e_p0 * 0.4, (e_p0, e_p)
        e_v = np.linalg.norm(np.asarray(vn) - kf_v, axis=-1).mean()
        assert e_v < 0.05, e_v
        # biases move toward the negative of the integration error... here
        # preints used the TRUE bias, states should estimate bias ~ 0 delta
        assert np.abs(np.asarray(bgn)).max() < 5e-3


class TestPredictState:
    def test_full_state_prediction_matches_ground_truth(self):
        """InertialRuntime.predict_state propagates the camera pose through
        a preintegrated gap to the ground-truth next pose (reference:
        Tracking::PredictStateIMU src/Tracking.cc:2034)."""
        from plvs_tpu.slam.inertial import InertialRuntime

        gyros, accs, dts, states = simulate_trajectory(T=40, dt=0.005)
        rt = InertialRuntime()          # identity camera-body extrinsics
        rt.gravity = np.array([0.0, 0.0, -9.81], np.float32)
        R0, p0, v0 = states[0]
        rt._cur_velocity = v0.copy()

        p = pre.preintegrate(gyros, accs, dts, jnp.zeros(3), jnp.zeros(3),
                             pre.ImuCalib())
        # camera pose of the start state (R_cb = I so cam == body)
        R_cw = R0.T
        t_cw = -R0.T @ p0
        out = rt.predict_state(R_cw, t_cw, p)
        assert out is not None
        R_cw2, t_cw2 = out
        R1, p1, v1 = states[-1]
        C_pred = -R_cw2.T @ t_cw2
        assert np.linalg.norm(C_pred - p1) < 1e-3, (C_pred, p1)
        err_R = np.asarray(lie.so3_log(jnp.asarray(R_cw2 @ R1)))
        assert np.linalg.norm(err_R) < 1e-3, err_R
        np.testing.assert_allclose(rt._cur_velocity, v1, atol=1e-3)

    def test_requires_init_and_velocity(self):
        from plvs_tpu.slam.inertial import InertialRuntime

        gyros, accs, dts, states = simulate_trajectory(T=10, dt=0.005)
        rt = InertialRuntime()
        p = pre.preintegrate(gyros, accs, dts, jnp.zeros(3), jnp.zeros(3),
                             pre.ImuCalib())
        assert rt.predict_state(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), p) is None
        rt.gravity = np.array([0.0, 0.0, -9.81], np.float32)
        assert rt.predict_state(np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32), p) is None

    def test_note_frame_pose_estimates_velocity(self):
        from plvs_tpu.slam.inertial import InertialRuntime

        rt = InertialRuntime()
        R = np.eye(3, dtype=np.float32)
        for i in range(3):
            C = np.array([0.1 * i, 0.0, 0.0], np.float32)
            rt.note_frame_pose(R, -R @ C, i / 30.0)
        np.testing.assert_allclose(rt._cur_velocity, [3.0, 0.0, 0.0],
                                   atol=1e-5)


class TestInertialKFCulling:
    """Keyframe culling on inertial maps: the runtime re-chains the culled
    keyframe's preintegration into its next temporal neighbour EXACTLY (by
    re-running the scan over the concatenated raw windows — reference: the
    inertial branch of LocalMapping::KeyFrameCulling + ImuTypes'
    Reintegrate/MergePrevious)."""

    def _runtime_with_chain(self):
        import numpy as np

        from plvs_tpu.slam.inertial import InertialRuntime

        rt = InertialRuntime()
        rng = np.random.default_rng(0)
        t = 0.0
        samples = []
        for i in range(300):
            t += 1.0 / 100.0
            samples.append((t, rng.normal(0, 0.2, 3).astype(np.float32),
                            rng.normal(0, 1.0, 3).astype(np.float32)))
        rt.add_samples(samples)

        class _St:
            kf_mask = np.ones(16, bool)

        st = _St()
        # keyframes at t = 0.5, 1.0, 1.5, 2.0, 2.5
        prev = None
        for k, tk in enumerate([0.5, 1.0, 1.5, 2.0, 2.5]):
            rt.on_keyframe(k, prev, tk, st)
            prev = tk
        return rt, samples

    def test_max_cull_gap(self):
        rt, _ = self._runtime_with_chain()
        assert rt.max_cull_gap(0) is None          # chain head
        assert rt.max_cull_gap(4) is None          # chain tail
        g = rt.max_cull_gap(2)                     # interior: (1.0, 2.0]
        assert g is not None and abs(g - 1.0) < 0.02

    def test_rechain_matches_direct_preintegration(self):
        import numpy as np

        rt, samples = self._runtime_with_chain()
        # direct preintegration over the union window (1.0, 2.0] from the
        # raw measurements (the runtime itself trims consumed samples)
        sel = [(t, w, a) for t, w, a in samples if 1.0 < t <= 2.0]
        direct = rt._preintegrate_raw(1.0, sel)
        assert rt.remove_keyframe(2)
        assert rt.kf_chain == [0, 1, 3, 4]
        merged = rt.kf_preint[3]
        for name in ("dT", "dR", "dV", "dP"):
            a = np.asarray(getattr(merged, name))
            b = np.asarray(getattr(direct, name))
            assert np.allclose(a, b, atol=1e-5), (name, a, b)

    def test_cull_tail_then_new_kf_keeps_chain_consistent(self):
        import numpy as np

        rt, _ = self._runtime_with_chain()
        assert rt.remove_keyframe(1)
        # chain skips 1; preint of 2 now spans (0.5, 1.5]
        p2 = rt.kf_preint[2]
        assert abs(float(np.asarray(p2.dT)) - 1.0) < 0.02
