"""Async mapper actor: overlap, interruptible BA, consistency.

VERDICT r1 item 3 acceptance: keyframe-frame latency no longer carries the
full local-BA + loop-detect cost (reference: the LocalMapping/LoopClosing
threads overlap Tracking, src/System.cc:315-398; interruptible BA via
mbAbortBA, src/LocalMapping.cc:139).
"""

import time

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import evaluation, synthetic
from plvs_tpu.slam import System, SystemConfig

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                      bf=24.0)


def _run(async_mapping: bool, n_frames: int = 30):
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=1)
    cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                       max_pts=16384, async_mapping=async_mapping)
    system = System(CAM, cfg)
    lat = []
    kf_flags = []
    gt = []
    n_kf_before = 0
    for ts, gray, depth, R_gt, t_gt in scene.sequence(n_frames=n_frames):
        t0 = time.perf_counter()
        system.track_rgbd(gray, depth, ts)
        lat.append(time.perf_counter() - t0)
        n_kf = system.store.num_keyframes
        kf_flags.append(n_kf > n_kf_before)
        n_kf_before = n_kf
        gt.append((R_gt, t_gt))
    if system.actor is not None:
        assert system.actor.wait_idle(120.0)
    traj = system.trajectory_tum()
    gt_xyz = np.stack([-R.T @ t for R, t in gt])
    ate = evaluation.ate_rmse(traj[:, 1:4], gt_xyz, align=True)
    return system, np.asarray(lat), np.asarray(kf_flags), ate


class TestAsyncRuntime:
    @pytest.fixture(scope="class")
    def async_run(self):
        return _run(async_mapping=True)

    def test_tracks_and_maps(self, async_run):
        system, _, _, ate = async_run
        stats = system.map_statistics()
        assert stats["keyframes"] >= 2
        assert stats["points"] > 300
        assert ate < 0.05, ate

    def test_kf_latency_not_dominated_by_backend(self, async_run):
        _, lat, kf_flags, _ = async_run
        # drop the first frames (compiles); compare steady-state medians
        lat, kf_flags = lat[5:], kf_flags[5:]
        if kf_flags.sum() == 0:
            pytest.skip("no keyframes in steady state")
        med_kf = np.median(lat[kf_flags])
        med_nokf = np.median(lat[~kf_flags])
        # async target: a KF frame costs at most ~2.5x a normal frame
        # (the backend runs on the actor thread)
        assert med_kf <= 2.5 * med_nokf + 0.02, (med_kf, med_nokf)

    def test_matches_sync_quality(self, async_run):
        _, _, _, ate_async = async_run
        _, _, _, ate_sync = _run(async_mapping=False)
        assert ate_async <= max(ate_sync * 2.0, 0.04), (ate_async, ate_sync)

    def test_shutdown_clean(self):
        system, _, _, _ = _run(async_mapping=True, n_frames=12)
        system.shutdown()
        assert not system.actor.thread.is_alive()
