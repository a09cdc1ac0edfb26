"""Interleaved keyframe backend (SystemConfig.interleaved_backend): the
staged per-KF backend whose stages run between frame dispatches must
deliver the same quality as the synchronous inline backend, and the
budgeted mesher must converge to the unbudgeted mesh.

Reference behavior being modeled: tracking never waits for LocalMapping
(/root/reference/src/System.cc:315-317) — here the single-submitting-thread
tunnel constraint is honored by time-slicing backend stages on the tracking
thread with helper-thread fetches.
"""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import evaluation, synthetic
from plvs_tpu.slam import System, SystemConfig

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                      bf=24.0)


def _run(interleaved: bool, n_frames: int = 40, sync_fetch: bool = False):
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=1)
    cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                       max_pts=16384, pipelined=True, pipeline_depth=4,
                       local_ba=True, loop_closing=True, dense_mapping=True,
                       interleaved_backend=interleaved)
    system = System(CAM, cfg)
    if sync_fetch and interleaved:
        # deterministic stepping for quality comparison: with an inline
        # fetcher every staged future is complete when polled, so backend
        # progress is gated purely on FRAME COUNT (2 stages/frame), not on
        # helper-thread timing — accuracy no longer varies with host load
        from plvs_tpu.slam.local_mapping import _SyncFetch

        system._submit_backend_fetch = _SyncFetch()
    gt = []
    for ts, gray, depth, R, t in scene.sequence(n_frames=n_frames):
        system.track_rgbd(gray, depth, ts)
        gt.append((R, t))
    system.flush()
    traj = system.trajectory_tum()
    gt_xyz = np.stack([-R.T @ t for R, t in gt])
    rmse = evaluation.ate_rmse(traj[:, 1:4], gt_xyz, align=True)
    return system, rmse


class TestInterleavedBackend:
    def test_active_only_when_pipelined(self):
        cfg = SystemConfig(num_features=256, n_levels=3, max_kf=8,
                           max_pts=1024)
        assert not System(CAM, cfg)._interleaved
        cfg = SystemConfig(num_features=256, n_levels=3, max_kf=8,
                           max_pts=1024, pipelined=True)
        assert System(CAM, cfg)._interleaved

    def test_quality_matches_synchronous(self):
        # deterministic stepping (inline fetch): backend progress is gated
        # on frame count, so this comparison cannot flake under host load
        sys_i, rmse_i = _run(True, sync_fetch=True)
        sys_s, rmse_s = _run(False)
        assert sys_i._interleaved and not sys_s._interleaved
        # both must meet the ideal-scene gate; interleaving must not
        # degrade accuracy materially
        assert rmse_s < 0.03, rmse_s
        assert rmse_i < 0.03, rmse_i
        si, ss = sys_i.map_statistics(), sys_s.map_statistics()
        assert si["keyframes"] >= 2 and si["points"] > 300
        assert abs(si["keyframes"] - ss["keyframes"]) <= 2
        # the staged backend completed for every keyframe
        assert not sys_i._backend_q

    def test_threaded_fetch_quality_bounded(self):
        """The REAL helper-thread fetcher: stage timing varies with host
        load, so assert a BOUND on degradation (and the stage-deadline
        backstop — System.BACKEND_STAGE_DEADLINE — caps staleness at ~2
        frames), not exact equality with the synchronous run."""
        sys_i, rmse_i = _run(True)
        assert sys_i._interleaved
        assert rmse_i < 0.06, rmse_i
        si = sys_i.map_statistics()
        assert si["keyframes"] >= 2 and si["points"] > 300
        assert not sys_i._backend_q

    def test_dense_map_converges(self):
        sys_i, _ = _run(True)
        # flush drained every staged mesh update; a final unbudgeted
        # update must find (almost) nothing left dirty
        mesher = sys_i.dense_mapper.mesher
        pend_before = mesher.pending
        V, F = sys_i.dense_mapper.mesh_incremental()
        assert len(V) > 0 and len(F) > 0
        assert pend_before == 0 or mesher.pending == 0


class TestMeshBudget:
    def _volume_with_sphere(self):
        from plvs_tpu.dense.mapping import DenseMapper

        cam = CAM
        dm = DenseMapper(cam, voxel_size=0.04, max_blocks=2048,
                         filter_depth=False, mesh_every=1, mesh_budget=16)
        rng = np.random.default_rng(0)
        depth = np.full((120, 160), 2.0, np.float32)
        yy, xx = np.mgrid[0:120, 0:160]
        depth += 0.3 * np.sin(xx / 17.0) * np.cos(yy / 13.0)
        return dm, depth

    def test_budgeted_updates_converge_to_full_mesh(self):
        dm, depth = self._volume_with_sphere()
        small = depth[::2, ::2]
        cam = cameras.scale(CAM, 0.5) if hasattr(cameras, "scale") else CAM
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        dm.insert_keyframe_rgbd(0, np.full_like(depth, 90.0), depth, R, t)
        # budget 16 left most blocks pending on the first insert
        assert dm.mesher.pending > 0
        for _ in range(200):
            dm.mesher.update(assemble=False, budget=16)
            if dm.mesher.pending == 0:
                break
        assert dm.mesher.pending == 0
        V_b, F_b = dm.mesher.update()  # assembled, nothing dirty
        # reference: one unbudgeted extraction over the same volume
        from plvs_tpu.dense.meshing import IncrementalMesher

        ref = IncrementalMesher(dm.volume)
        V_r, F_r = ref.update()
        assert len(V_b) == len(V_r)
        # same triangle soup up to ordering
        sb = np.sort(V_b.round(5).view([("x", "f4"), ("y", "f4"),
                                        ("z", "f4")]), axis=0)
        sr = np.sort(V_r.round(5).view([("x", "f4"), ("y", "f4"),
                                        ("z", "f4")]), axis=0)
        assert np.array_equal(sb, sr)

    def test_staged_update_equals_monolithic(self):
        dm, depth = self._volume_with_sphere()
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)
        dm.mesh_every = 0  # no auto-mesh
        dm.insert_keyframe_rgbd(0, np.full_like(depth, 90.0), depth, R, t)
        from plvs_tpu.dense.meshing import IncrementalMesher

        a = IncrementalMesher(dm.volume)
        ctx = a.update_begin()
        a.update_finish(ctx)
        Va, Fa = a.update()  # assembly only (nothing newly dirty)
        b = IncrementalMesher(dm.volume)
        Vb, Fb = b.update()
        assert len(Va) == len(Vb)
