"""Flagship end-to-end scenario at reference scale (VERDICT r1 item 10):
640x480, 1024 features, 8 pyramid levels, lines on, local BA + loop closing
— an out-and-back trajectory that accumulates drift and must close the loop
on return (reference protocol: full-resolution TUM runs through
Benchmarking/benchmark_tum.sh; this is the synthetic stand-in CI can gate)."""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import evaluation, synthetic
from plvs_tpu.slam import System, SystemConfig

pytestmark = pytest.mark.slow

CAM = cameras.pinhole(520.9, 521.0, 325.1, 249.7, width=640, height=480,
                      bf=40.0)


def _loop_trajectory(n: int = 64):
    """Out along +x with yaw wiggle, then back to the exact start pose:
    drift accumulates outbound, the return leg must be recognized."""
    poses = []
    for i in range(n):
        s = i / (n - 1)
        u = 2.0 * s if s < 0.5 else 2.0 * (1.0 - s)  # 0 -> 1 -> 0
        yaw = 0.12 * np.sin(2 * np.pi * s)
        C = np.array([1.2 * u, 0.08 * np.sin(4 * np.pi * s), 0.3 * u],
                     np.float32)
        R = synthetic._so3_exp_np(np.array([0.0, yaw, 0.0]))
        t = (-R @ C).astype(np.float32)
        poses.append((R, t))
    return poses


def _run(loop_closing: bool, depth_noise: float = 0.0):
    """depth_noise: per-frame gaussian depth noise sigma = depth_noise * z^2
    (the RGB-D quadratic error model) — odometry drift accumulates as a
    random walk the loop closure must retro-correct."""
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.2, seed=2, tex_size=2048,
                                    tex_scale=420.0)
    cfg = SystemConfig(
        num_features=1024, n_levels=8, max_kf=128, max_pts=65536,
        use_lines=True, max_lines=128, local_ba=True,
        loop_closing=loop_closing,
    )
    system = System(CAM, cfg)
    poses = _loop_trajectory()
    gt, est_states = [], []
    for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
            scene.sequence(poses=poses)):
        if depth_noise:
            rng = np.random.default_rng(1000 + i)
            depth = depth + rng.normal(
                0.0, depth_noise, depth.shape).astype(np.float32) * depth ** 2
        state, R, t = system.track_rgbd(gray, depth, ts)
        gt.append(-R_gt.T @ t_gt)
        est_states.append(state)
    traj = system.trajectory_tum()
    rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
    return system, rmse, est_states


class TestFlagshipLoop:
    def test_full_scale_run_closes_loop(self):
        system, rmse, states = _run(loop_closing=True)
        from plvs_tpu.slam.tracking import OK

        # never lost after initialization
        assert all(s == OK for s in states[1:]), states
        # full-resolution accuracy: centimeters on a ~2.4 m loop
        assert rmse < 0.06, rmse
        st = system.store
        assert st.num_keyframes >= 4
        assert int(st.pt_mask.sum()) > 500
        assert st.num_lines >= 0  # lines allowed but not required on texture

    def test_loop_closure_improves_drifty_trajectory(self):
        """A genuine place-recognition loop (four-wall room, 1.375-lap
        orbit: mid-orbit keyframes share NO landmarks with the start, the
        second pass re-recognizes it) under depth noise. The loop closure +
        retro-corrected export must IMPROVE full-trajectory ATE — not
        merely not hurt (reference: trajectory export reconstructs every
        frame through the loop-corrected keyframe poses,
        src/System.cc:860-1006; a single always-covisible wall can never
        exercise this code path, which is why this scenario is a room)."""
        from plvs_tpu.io import evaluation

        def run_room(loop_closing: bool):
            # texture resolution must outresolve the camera (a 1024-px
            # texture at 640x480 is blurry -> weak descriptors -> false
            # loop matches)
            room = synthetic.SyntheticRoom(CAM, half=3.0, tex_size=2048,
                                           seed=3)
            poses = synthetic.orbit_loop_trajectory(
                n_frames=132, radius=1.0, laps=1.375)
            cfg = SystemConfig(
                num_features=1024, n_levels=8, max_kf=128, max_pts=65536,
                use_lines=False, local_ba=True, loop_closing=loop_closing)
            system = System(CAM, cfg)
            gt = []
            for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
                    room.sequence(poses)):
                rng = np.random.default_rng(1000 + i)
                depth = depth + rng.normal(
                    0, 0.01, depth.shape).astype(np.float32) * depth ** 2
                system.track_rgbd(gray, depth, ts)
                gt.append(-R_gt.T @ t_gt)
            traj = system.trajectory_tum()
            rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt),
                                       align=True)
            return system, rmse

        sys_on, rmse_on = run_room(True)
        _, rmse_off = run_room(False)
        assert len(sys_on.loops_closed) >= 1, "loop was not closed"
        assert rmse_off > 0.01, (
            f"scenario not drifty enough to be meaningful: {rmse_off}")
        assert rmse_on < 0.6 * rmse_off, (rmse_on, rmse_off)


class TestBenchConfigLoop:
    def test_room_loop_under_bench_flags(self):
        """The loop closes in the SHIPPED realtime configuration — the
        exact bench flags (pipelined depth 4 + interleaved backend + lines
        + dense + fixed shapes), not just the synchronous test config
        (VERDICT r4 item 1: this was the only configuration never asked to
        close a loop in CI, and it shipped closing zero). The rotation-
        adaptive pipeline depth + velocity warm-up are what make tracking
        survive the orbit's 3.75 deg/frame yaw (reference bar: loops close
        while the realtime threads run, src/LoopClosing.cc:377-459,
        src/System.cc:315-317)."""
        room = synthetic.SyntheticRoom(CAM, half=3.0, tex_size=2048, seed=3)
        poses = synthetic.orbit_loop_trajectory(n_frames=132, radius=1.0,
                                                laps=1.375)
        cfg = SystemConfig(
            num_features=1024, n_levels=8, scale=1.2,
            max_kf=256, max_pts=65536,
            use_lines=True, max_lines=128,
            local_ba=True, loop_closing=True,
            dense_mapping=True, dense_voxel_size=0.02,
            backend_fixed_shapes=True,
            pipelined=True, pipeline_depth=4, pipeline_overlap=True,
        )
        system = System(CAM, cfg)
        assert system._interleaved
        rng = np.random.default_rng(1)
        states = []
        gt = []
        for ts, gray, depth, R_gt, t_gt in room.sequence(poses):
            depth = depth + rng.normal(0, 0.01, depth.shape).astype(
                np.float32) * depth ** 2
            st, _, _ = system.track_rgbd(gray, depth, ts)
            states.append(st)
            gt.append(-R_gt.T @ t_gt)
        system.flush()
        from plvs_tpu.slam.tracking import LOST

        assert LOST not in states[5:], states
        assert len(system.loops_closed) >= 1, \
            "loop did not close under the bench configuration"
        traj = system.trajectory_tum()
        rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        assert rmse < 0.12, rmse
        stats = system.map_statistics()
        assert stats["lines"] >= 100, stats
