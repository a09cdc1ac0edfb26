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

    def test_trajectory_export_formats(self, slam_run, tmp_path):
        system, _, _ = slam_run
        tum = tmp_path / "t.txt"
        kitti = tmp_path / "k.txt"
        euroc = tmp_path / "e.csv"
        kf_tum = tmp_path / "kf.txt"
        system.save_trajectory_tum(str(tum))
        system.save_trajectory_kitti(str(kitti))
        system.save_trajectory_euroc(str(euroc))
        system.save_keyframe_trajectory_tum(str(kf_tum))
        n = len(system.trajectory)
        assert len(np.loadtxt(str(tum))) == n
        k = np.loadtxt(str(kitti))
        assert k.shape == (n, 12)
        e = np.loadtxt(str(euroc), delimiter=",", skiprows=1)
        assert e.shape == (n, 8)
        kf = np.atleast_2d(np.loadtxt(str(kf_tum)))
        assert kf.shape[0] == system.map_statistics()["keyframes"]
        # keyframe positions are a subset of (close to) the frame trajectory
        full = np.loadtxt(str(tum))
        d = np.linalg.norm(kf[:, None, 1:4] - full[None, :, 1:4], axis=-1)
        assert d.min(axis=1).max() < 0.05


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


@pytest.mark.slow
class TestLoopClosing:
    def test_no_false_loops_on_connected_map(self):
        """Long out-and-back sweep where tracking re-connects to the old map:
        BoW candidates fire on the self-similar texture but geometric
        verification must reject them (no false loop closures), and ATE
        stays bounded."""
        from plvs_tpu.io import evaluation as ev

        cam = CAM
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=3,
                                        tex_size=2048, tex_scale=220.0)
        n = 60
        poses = []
        for i in range(n):
            s = i / (n - 1)
            x = 3.0 * np.sin(np.pi * s) ** 2
            C = np.array([x, 0.0, 0.0], np.float32)
            R = np.eye(3, dtype=np.float32)
            poses.append((R, (-R @ C).astype(np.float32)))
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=96,
                           max_pts=32768, max_kf_interval=5)
        system = System(cam, cfg)
        gt = []
        for ts, gray, depth, R_gt, t_gt in scene.sequence(poses=poses):
            system.track_rgbd(gray, depth, ts)
            gt.append(-R_gt.T @ t_gt)
        traj = system.trajectory_tum()
        rmse = ev.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        assert rmse < 0.08, rmse

    def test_drifted_revisit_is_closed(self):
        """Constructed genuine loop: a revisit keyframe duplicating the first
        keyframe's view but with a drifted pose estimate and its own
        duplicate landmarks (no covisibility). The closer must detect the
        revisit, verify it geometrically, and pull the drifted pose back."""
        cam = CAM
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=4,
                                        tex_size=2048, tex_scale=220.0)
        n = 40
        poses = []
        for i in range(n):
            s = i / (n - 1)
            C = np.array([2.5 * s, 0.0, 0.0], np.float32)
            R = np.eye(3, dtype=np.float32)
            poses.append((R, (-R @ C).astype(np.float32)))
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=96,
                           max_pts=32768, max_kf_interval=5, loop_closing=True)
        system = System(cam, cfg)
        for ts, gray, depth, R_gt, t_gt in scene.sequence(poses=poses):
            system.track_rgbd(gray, depth, ts)
        st = system.store
        assert len(system.loops_closed) == 0

        # manufacture the drifted revisit of keyframe 0
        drift = np.array([0.25, 0.1, -0.15], np.float32)
        kf0 = 0
        kf_new = st.alloc_kf()
        st.kf_mask[kf_new] = True
        st.kf_frame_id[kf_new] = system.tracker.frame_id + 100
        st.kf_R[kf_new] = st.kf_R[kf0]
        st.kf_t[kf_new] = st.kf_t[kf0] + drift  # drifted estimate
        for a in ("kf_kp_xy", "kf_kp_uvr", "kf_kp_desc", "kf_kp_octave",
                  "kf_kp_angle", "kf_kp_mask"):
            getattr(st, a)[kf_new] = getattr(st, a)[kf0]
        # duplicate landmarks back-projected with the drifted pose
        sel = np.nonzero(st.kf_kp_mask[kf0] & (st.kf_kp_pt[kf0] >= 0))[0]
        old_pts = st.kf_kp_pt[kf0][sel]
        new_ids = st.alloc_pts(len(sel))
        Rwc = st.kf_R[kf_new].T
        twc = -Rwc @ st.kf_t[kf_new]
        Xc = (st.pt_xyz[old_pts] @ st.kf_R[kf0].T + st.kf_t[kf0])
        st.pt_xyz[new_ids] = Xc @ Rwc.T + twc
        st.pt_desc[new_ids] = st.pt_desc[old_pts]
        st.pt_mask[new_ids] = True
        st.pt_ref_kf[new_ids] = kf_new
        st.pt_first_kf[new_ids] = kf_new
        st.add_observations(kf_new, new_ids, sel)

        err_before = np.linalg.norm(st.kf_t[kf_new] - st.kf_t[kf0])
        info = system.loop_closer.process_keyframe(kf_new)
        assert info is not None, "loop not closed"
        assert info["candidate"] == kf0 or info["candidate"] <= 2, info
        err_after = np.linalg.norm(st.kf_t[kf_new] - st.kf_t[kf0])
        assert err_after < err_before * 0.25, (err_before, err_after)


@pytest.mark.slow
class TestRelocalization:
    def test_kidnapped_camera_recovers(self):
        """Blank out frames mid-sequence (tracking loss), then return to a
        mapped view: the system must relocalize and continue with a pose
        consistent with ground truth."""
        import jax.numpy as jnp

        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=7)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, loop_closing=False,
                           max_kf_interval=4)
        system = System(CAM, cfg)
        poses = synthetic.default_trajectory(30)
        from plvs_tpu.slam.tracking import LOST, OK

        states = []
        gt = []
        for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
                scene.sequence(poses=poses)):
            if 15 <= i < 20:  # kidnap: blank input
                gray = np.zeros_like(gray)
                depth = np.zeros_like(depth)
            state, R, t = system.track_rgbd(gray, depth, ts)
            states.append(state)
            gt.append((R_gt, t_gt))
        assert LOST in states[14:22], states
        # must recover to OK after the blackout
        assert all(s == OK for s in states[23:]), states
        # recovered pose should be close to ground truth
        _, R_est, t_est = system.trajectory[-1][0], *[
            x for x in (system.trajectory[-1][1], system.trajectory[-1][2])]
        R_gt, t_gt = gt[-1]
        C_est = -R_est.T @ t_est
        C_gt = -R_gt.T @ t_gt
        assert np.linalg.norm(C_est - C_gt) < 0.1, np.linalg.norm(C_est - C_gt)

    def test_recently_lost_grace_then_lost(self):
        """On a mature map a tracking failure enters RECENTLY_LOST (grace
        period with per-frame relocalization attempts), and only falls to
        LOST after the deadline expires (reference: RECENTLY_LOST state
        include/Tracking.h:176 with the 5s time_recently_lost deadline,
        src/Tracking.cc:86,2361-2371)."""
        from plvs_tpu.slam.tracking import LOST, OK, RECENTLY_LOST

        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=9)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, loop_closing=False,
                           max_kf_interval=4)
        system = System(CAM, cfg)
        system.tracker.min_kf_recently_lost = 3   # map matures quickly here
        system.tracker.time_recently_lost = 4.5 / 30.0  # ~4 frames at 30fps
        poses = synthetic.default_trajectory(34)

        states = []
        for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
                scene.sequence(poses=poses)):
            if 16 <= i < 28:  # long blackout: outlasts the grace deadline
                gray = np.zeros_like(gray)
                depth = np.zeros_like(depth)
            state, R, t = system.track_rgbd(gray, depth, ts)
            states.append(state)
        # the first failures are the grace state, not LOST
        assert states[16] == RECENTLY_LOST, states
        assert LOST not in states[16:20], states
        # the deadline expires inside the blackout -> LOST
        assert LOST in states[20:28], states
        # and the system still recovers once the view returns
        assert OK in states[28:], states

    def test_recently_lost_recovers_within_grace(self):
        """A short occlusion is bridged entirely inside RECENTLY_LOST: the
        system relocalizes before the deadline and never reaches LOST."""
        from plvs_tpu.slam.tracking import LOST, OK

        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=11)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, loop_closing=False,
                           max_kf_interval=4)
        system = System(CAM, cfg)
        system.tracker.min_kf_recently_lost = 3
        poses = synthetic.default_trajectory(30)

        states = []
        for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
                scene.sequence(poses=poses)):
            if 16 <= i < 19:  # short occlusion, well under 5s
                gray = np.zeros_like(gray)
                depth = np.zeros_like(depth)
            state, R, t = system.track_rgbd(gray, depth, ts)
            states.append(state)
        assert LOST not in states, states
        assert all(s == OK for s in states[20:]), states


@pytest.mark.slow
class TestStereo:
    def test_stereo_slam(self):
        """Stereo pipeline: render left/right from the synthetic wall with a
        real baseline; ATE must stay small."""
        baseline = 0.08  # meters; bf = fx * b = 24 -> b = 24/300
        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=300.0 * baseline)
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=8)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, loop_closing=False)
        system = System(cam, cfg)
        gt = []
        for ts, (R_gt, t_gt) in zip(
                np.arange(20) / 30.0, synthetic.default_trajectory(20)):
            gl, _ = scene.render(R_gt, t_gt)
            # right camera: shifted along +x in the camera frame
            t_r = t_gt - R_gt @ np.array([0, 0, 0], np.float32) \
                - np.array([baseline, 0, 0], np.float32) @ np.eye(3)
            # world-to-right-cam: x_r = R_gt x + t_gt - [b,0,0]
            gr, _ = scene.render(R_gt, t_gt - np.array([baseline, 0, 0],
                                                       np.float32))
            state, R, t = system.track_stereo(gl, gr, ts)
            gt.append(-R_gt.T @ t_gt)
        traj = system.trajectory_tum()
        rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        assert rmse < 0.05, rmse
        stats = system.map_statistics()
        assert stats["points"] > 200, stats


@pytest.mark.slow
class TestMonocular:
    def test_mono_slam_up_to_scale(self):
        """Monocular pipeline: init by two-view reconstruction, map growth by
        triangulation; trajectory correct up to scale (Sim3-aligned ATE)."""
        cam = CAM
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=9)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, loop_closing=False, sensor="mono",
                           max_kf_interval=5, min_kf_inliers=25)
        system = System(cam, cfg)
        # translation-dominant trajectory for good init parallax
        n = 40
        poses = []
        for i in range(n):
            s = i / (n - 1)
            C = np.array([1.6 * s, 0.1 * np.sin(2 * np.pi * s), 0.3 * s],
                         np.float32)
            R = np.eye(3, dtype=np.float32)
            poses.append((R, (-R @ C).astype(np.float32)))
        gt = []
        states = []
        for ts, gray, depth, R_gt, t_gt in scene.sequence(poses=poses):
            state, R, t = system.track_monocular(gray, ts)
            states.append(state)
            gt.append(-R_gt.T @ t_gt)
        from plvs_tpu.slam.tracking import OK

        n_ok = sum(1 for s in states if s == OK)
        assert n_ok > 25, states
        # evaluate the OK segment with Sim3 (scale) alignment
        traj = system.trajectory_tum()
        sel = [i for i, s in enumerate(states) if s == OK]
        est = traj[sel, 1:4]
        gtx = np.stack([gt[i] for i in sel])
        rmse = evaluation.ate_rmse(est, gtx, align=True, with_scale=True)
        assert rmse < 0.05, rmse
        assert system.map_statistics()["points"] > 200


@pytest.mark.slow
class TestInertial:
    def test_rgbd_inertial(self):
        """RGB-D + IMU: gyro-aided prediction, online IMU initialization
        (gravity + biases) and VI local BA; ATE stays small and the
        estimated gravity matches the simulated one."""
        import jax.numpy as jnp
        from plvs_tpu.geometry import lie as lie_mod

        cam = CAM
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=11)
        # simulate body==camera motion by integrating an IMU with gravity
        # along +y (camera looks at the wall, y down)
        g_w = np.array([0.3, 9.7, -0.4], np.float32)
        g_w = g_w / np.linalg.norm(g_w) * 9.81
        dt = 1.0 / 300.0
        fps = 30
        n_frames = 80
        true_bg = np.array([0.002, -0.001, 0.001], np.float32)
        R = np.eye(3, dtype=np.float32)
        p = np.zeros(3, np.float32)
        v = np.array([0.3, 0.0, 0.08], np.float32)
        frames = []
        t_now = 0.0
        for i in range(n_frames):
            samples = []
            for k in range(300 // fps):
                t_now += dt
                w = np.array([0.1 * np.sin(2 * t_now), 0.15 * np.cos(t_now),
                              0.05], np.float32)
                a_w = np.array([0.25 * np.sin(3 * t_now),
                                0.2 * np.cos(2 * t_now),
                                0.15 * np.sin(t_now)], np.float32)
                f_b = R.T @ (a_w - g_w)
                samples.append((t_now, w + true_bg, f_b))
                p = p + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = R @ np.asarray(lie_mod.so3_exp(jnp.asarray(w * dt)))
            # camera pose: world-to-camera from body pose (R_cb = I)
            R_cw = R.T.copy()
            t_cw = (-R_cw @ p).copy()
            frames.append((t_now, R_cw, t_cw, samples))

        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=96,
                           max_pts=32768, loop_closing=False, use_imu=True,
                           max_kf_interval=4)
        system = System(cam, cfg)
        gt = []
        for ts, R_cw, t_cw, samples in frames:
            gray, depth = scene.render(R_cw.astype(np.float32),
                                       t_cw.astype(np.float32))
            system.track_rgbd(gray, depth, ts, imu_samples=samples)
            gt.append(-R_cw.T @ t_cw)
        assert system.inertial.initialized, "IMU never initialized"
        g_est = system.inertial.gravity
        cos = np.dot(g_est, g_w) / (np.linalg.norm(g_est) * 9.81)
        assert cos > 0.98, (g_est, g_w)
        assert np.linalg.norm(system.inertial.bias_gyro - true_bg) < 5e-3
        traj = system.trajectory_tum()
        rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        assert rmse < 0.04, rmse

    def test_mono_inertial_recovers_metric_scale(self):
        """Monocular + IMU: the map is born up-to-scale (mono two-view init
        normalizes median depth to 1) and the inertial initialization must
        recover the ABSOLUTE metric scale and rescale the whole map
        (reference: the mbMonocular branch of LocalMapping::InitializeIMU +
        ScaleRefinement, src/LocalMapping.cc:2164-2300, 2512-2544).
        Asserts scale within 5% and ATE WITHOUT scale alignment."""
        import jax.numpy as jnp
        from plvs_tpu.geometry import lie as lie_mod

        cam = CAM
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=13)
        g_w = np.array([0.2, 9.75, -0.3], np.float32)
        g_w = g_w / np.linalg.norm(g_w) * 9.81
        dt = 1.0 / 300.0
        fps = 30
        n_frames = 90
        true_bg = np.array([0.001, -0.002, 0.001], np.float32)
        R = np.eye(3, dtype=np.float32)
        p = np.zeros(3, np.float32)
        v = np.array([0.35, 0.0, 0.06], np.float32)
        frames = []
        t_now = 0.0
        for i in range(n_frames):
            samples = []
            for k in range(300 // fps):
                t_now += dt
                w = np.array([0.12 * np.sin(2 * t_now),
                              0.15 * np.cos(t_now), 0.05], np.float32)
                a_w = np.array([0.5 * np.sin(2.5 * t_now),
                                0.35 * np.cos(2 * t_now),
                                0.25 * np.sin(1.5 * t_now)], np.float32)
                f_b = R.T @ (a_w - g_w)
                samples.append((t_now, w + true_bg, f_b))
                p = p + v * dt + 0.5 * a_w * dt * dt
                v = v + a_w * dt
                R = R @ np.asarray(lie_mod.so3_exp(jnp.asarray(w * dt)))
            R_cw = R.T.copy()
            t_cw = (-R_cw @ p).copy()
            frames.append((t_now, R_cw, t_cw, samples))

        cfg = SystemConfig(num_features=768, n_levels=4, max_kf=96,
                           max_pts=32768, loop_closing=False, use_imu=True,
                           sensor="mono", max_kf_interval=4)
        system = System(cam, cfg)
        assert system.inertial.fix_scale is False  # mono: scale is free
        gt = []
        for ts, R_cw, t_cw, samples in frames:
            gray, _ = scene.render(R_cw.astype(np.float32),
                                   t_cw.astype(np.float32))
            system.track_monocular(gray, ts, imu_samples=samples)
            gt.append(-R_cw.T @ t_cw)
        assert system.inertial.initialized, "IMU never initialized"
        # the inertial init must actually have rescaled the map away from
        # the median-depth-1 birth scale (wall at 3 m -> factor far from 1)
        traj = system.trajectory_tum()
        gt_xyz = np.stack(gt)
        m = min(len(traj), len(gt_xyz))
        est = traj[:m, 1:4]
        gtm = gt_xyz[:m]
        # absolute scale: ratio of RMS displacement about the centroid
        # after rigid (NO-scale) alignment; assert the recovered metric
        # scale is within 5 percent of truth
        s_est = np.sqrt(((est - est.mean(0)) ** 2).sum(1).mean())
        s_gt = np.sqrt(((gtm - gtm.mean(0)) ** 2).sum(1).mean())
        assert abs(s_est / s_gt - 1.0) < 0.05, (s_est, s_gt)
        # ATE with rigid alignment only — scale must NOT be fitted away
        rmse = evaluation.ate_rmse(est, gtm, align=True, with_scale=False)
        rmse_s = evaluation.ate_rmse(est, gtm, align=True, with_scale=True)
        assert rmse < 0.08, rmse
        # the no-scale ATE is close to the scale-fitted one: residual scale
        # error is not the dominant error term
        assert rmse < max(1.5 * rmse_s, 0.05), (rmse, rmse_s)


@pytest.mark.slow
class TestSystemModes:
    """Localization-only mode, resets, image scaling (reference:
    include/System.h:157-167, Camera.imageScale)."""

    def _cam(self):
        from plvs_tpu.geometry import cameras
        return cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                               width=320, height=240, bf=24.0)

    def _frames(self, n=16):
        from plvs_tpu.io import synthetic
        scene = synthetic.SyntheticRGBD(self._cam(), wall_z=3.0, seed=0)
        return list(scene.sequence(n_frames=n))

    def test_localization_mode_freezes_map(self):
        from plvs_tpu.slam.system import System, SystemConfig
        sys_ = System(self._cam(), SystemConfig(num_features=512, n_levels=4,
                                                loop_closing=False))
        frames = self._frames(16)
        for ts, gray, depth, R, t in frames[:8]:
            sys_.track_rgbd(gray, depth, ts)
        kfs_before = sys_.store.num_keyframes
        pts_before = sys_.store.num_points
        sys_.activate_localization_mode()
        res = [sys_.track_rgbd(g, d, ts) for ts, g, d, R, t in frames[8:]]
        assert sys_.store.num_keyframes == kfs_before
        assert sys_.store.num_points == pts_before
        # still tracking OK
        assert res[-1][0] == 2
        sys_.deactivate_localization_mode()
        assert not sys_.tracker.only_tracking

    def test_reset_active_map(self):
        from plvs_tpu.slam.system import System, SystemConfig
        sys_ = System(self._cam(), SystemConfig(num_features=512, n_levels=4,
                                                loop_closing=False))
        frames = self._frames(12)
        for ts, gray, depth, R, t in frames[:6]:
            sys_.track_rgbd(gray, depth, ts)
        assert sys_.store.num_keyframes > 0
        sys_.reset_active_map()
        assert sys_.store.num_keyframes == 0
        assert sys_.tracker.state == 1  # NOT_INITIALIZED
        # re-initializes on the next frames and tracks again
        res = [sys_.track_rgbd(g, d, ts) for ts, g, d, R, t in frames[6:]]
        assert res[-1][0] == 2

    def test_full_reset(self):
        from plvs_tpu.slam.system import System, SystemConfig
        sys_ = System(self._cam(), SystemConfig(num_features=512, n_levels=4,
                                                loop_closing=False))
        frames = self._frames(12)
        for ts, gray, depth, R, t in frames[:6]:
            sys_.track_rgbd(gray, depth, ts)
        n_traj = len(sys_.trajectory)
        sys_.reset()
        assert sys_.store.num_keyframes == 0
        assert len(sys_.trajectory) == n_traj  # log survives
        res = [sys_.track_rgbd(g, d, ts) for ts, g, d, R, t in frames[6:]]
        assert res[-1][0] == 2

    def test_image_scale_tracks(self):
        from plvs_tpu.slam.system import System, SystemConfig
        sys_ = System(self._cam(), SystemConfig(num_features=512, n_levels=4,
                                                loop_closing=False,
                                                image_scale=0.5))
        assert sys_.cam.width == 160 and sys_.cam.height == 120
        res = [sys_.track_rgbd(g, d, ts)
               for ts, g, d, R, t in self._frames(8)]
        assert res[-1][0] == 2  # OK at half resolution

    def test_fov_centers_criterion_creates_kfs(self):
        from plvs_tpu.slam.system import System, SystemConfig
        base = SystemConfig(num_features=512, n_levels=4, loop_closing=False,
                            max_kf_interval=10000, kf_ratio=0.0)
        frames = self._frames(12)
        s_off = System(self._cam(), base)
        for ts, g, d, R, t in frames:
            s_off.track_rgbd(g, d, ts)
        import dataclasses as _dc
        s_on = System(self._cam(), _dc.replace(
            base, fov_centers_kf=True, max_fov_centers_distance=0.05))
        for ts, g, d, R, t in frames:
            s_on.track_rgbd(g, d, ts)
        # the translating synthetic camera moves its fov center; with the
        # ratio/interval criteria disabled only the fov criterion adds KFs
        assert s_on.store.num_keyframes > s_off.store.num_keyframes


class TestGlobalBA:
    def test_global_ba_improves_or_keeps_map(self):
        """Full-map BA runs over every keyframe and keeps the map finite
        (reference: GlobalBundleAdjustemnt after a loop closure)."""
        import numpy as np
        from plvs_tpu.geometry import cameras
        from plvs_tpu.io import synthetic
        from plvs_tpu.slam.system import System, SystemConfig

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                              width=320, height=240, bf=24.0)
        sys_ = System(cam, SystemConfig(num_features=512, n_levels=4,
                                        loop_closing=False))
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=0)
        for ts, gray, depth, R, t in scene.sequence(n_frames=12):
            sys_.track_rgbd(gray, depth, ts)
        assert sys_.store.num_keyframes >= 2
        t_before = sys_.store.kf_t.copy()
        sys_.local_mapper.global_ba()
        st = sys_.store
        live = np.nonzero(st.kf_mask)[0]
        assert np.isfinite(st.kf_t[live]).all()
        assert np.isfinite(st.pt_xyz[np.nonzero(st.pt_mask)[0]]).all()
        # poses may move but not explode
        assert np.linalg.norm(st.kf_t[live] - t_before[live], axis=-1).max() < 0.5
