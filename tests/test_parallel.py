"""Multi-device paths on the virtual 8-device CPU mesh (conftest forces
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.geometry import cameras, lie
from plvs_tpu.parallel import pipeline, sharded_ba, sharded_pose_graph, sharded_tsdf
from plvs_tpu.solvers import ba, pose_graph


def _cam():
    return cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                           width=320, height=240, bf=24.0)


def _ba_problem(rng, K=6, P=128, M=1024, noise=1.0):
    cam = _cam()
    pts = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.5, 1.5, P),
                    rng.uniform(3, 8, P)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.zeros((K, 3), np.float32)
    t[:, 0] = np.linspace(0, -0.5, K)
    obs_cam = rng.integers(0, K, M).astype(np.int32)
    obs_pt = rng.integers(0, P, M).astype(np.int32)
    Xc = lie.se3_apply(jnp.asarray(R)[obs_cam], jnp.asarray(t)[obs_cam],
                       jnp.asarray(pts)[obs_pt])
    uv = cameras.project(cam, Xc) + noise * rng.normal(size=(M, 2))
    uvr = jnp.concatenate([jnp.asarray(uv, jnp.float32), -jnp.ones((M, 1))], -1)
    fixed = np.zeros((K,), bool)
    fixed[0] = True
    prob = ba.make_problem(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(fixed), jnp.asarray(pts),
        jnp.asarray(obs_cam), jnp.asarray(obs_pt), uvr,
        jnp.ones((M,)), jnp.ones((M,), bool))
    return cam, prob


class TestShardedBA:
    def test_matches_single_device(self, rng):
        cam, prob = _ba_problem(rng)
        mesh = sharded_ba.make_mesh(8)
        out_s = sharded_ba.bundle_adjust_sharded(cam, prob, mesh,
                                                 num_iters=3, cg_iters=10)
        out_1 = ba.bundle_adjust(cam, prob, num_iters=3, cg_iters=10)
        # same final cost (deterministic program, sharding only changes
        # reduction layout)
        np.testing.assert_allclose(float(out_s[-1]["cost"]),
                                   float(out_1[-1]["cost"]), rtol=1e-3)


class TestShardedPoseGraph:
    def _ring_problem(self, rng, K=16):
        # chain + one loop edge with drift (same construction as the
        # single-device pose-graph test)
        R_gt, t_gt = [np.eye(3, dtype=np.float32)], [np.zeros(3, np.float32)]
        for k in range(1, K):
            ang = 2 * np.pi / K
            dR = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0])))
            R_gt.append((dR @ R_gt[-1]).astype(np.float32))
            t_gt.append((t_gt[-1] + np.asarray([0.3, 0, 0])).astype(np.float32))
        R_n = [r.copy() for r in R_gt]
        t_n = [t.copy() + 0.05 * rng.normal(size=3).astype(np.float32)
               for t in t_gt]
        t_n[0] = t_gt[0]
        pairs = [(k, k + 1) for k in range(K - 1)] + [(0, K - 1)]
        E = len(pairs)
        # pad edges to a multiple of 8 for the mesh
        Epad = ((E + 7) // 8) * 8
        ei = np.zeros(Epad, np.int32)
        ej = np.zeros(Epad, np.int32)
        eR = np.tile(np.eye(3, dtype=np.float32), (Epad, 1, 1))
        et = np.zeros((Epad, 3), np.float32)
        es = np.ones(Epad, np.float32)
        ew = np.ones(Epad, np.float32)
        em = np.zeros(Epad, bool)
        for n, (i, j) in enumerate(pairs):
            ei[n], ej[n] = i, j
            Rij, tij, sij = pose_graph.make_edges_from_poses(
                jnp.asarray(np.stack(R_gt)), jnp.asarray(np.stack(t_gt)),
                jnp.ones((K,)), np.asarray([[i, j]]))
            eR[n] = np.asarray(Rij)[0]
            et[n] = np.asarray(tij)[0]
            es[n] = float(np.asarray(sij)[0])
            em[n] = True
        fixed = np.zeros(K, bool)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            jnp.asarray(np.stack(R_n)), jnp.asarray(np.stack(t_n)),
            jnp.ones((K,)), jnp.asarray(fixed),
            jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(eR),
            jnp.asarray(et), jnp.asarray(es), jnp.asarray(ew),
            jnp.asarray(em))
        return prob, np.stack(t_gt)

    def test_sharded_matches_and_reduces_error(self, rng):
        prob, t_gt = self._ring_problem(rng)
        mesh = sharded_pose_graph.make_mesh(8)
        R_s, t_s, s_s, info = sharded_pose_graph.optimize_sharded(
            prob, mesh, num_iters=10, cg_iters=30, fix_scale=True)
        assert float(info["cost"]) < float(info["cost0"])
        err0 = np.linalg.norm(np.asarray(prob.t) - t_gt, axis=-1).mean()
        err1 = np.linalg.norm(np.asarray(t_s) - t_gt, axis=-1).mean()
        assert err1 < err0 * 0.5


class TestShardedTSDF:
    def test_matches_single_device_wall(self):
        cam = _cam()
        depth = np.full((240, 320), 2.0, np.float32)
        color = np.zeros((240, 320, 3), np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)

        from plvs_tpu.dense.tsdf import TSDFVolume
        ref = TSDFVolume(cam, voxel_size=0.05, max_blocks=4096)
        ref.integrate(depth, color, R, t)

        mesh = sharded_tsdf.make_mesh(8)
        vol = sharded_tsdf.ShardedTSDFVolume(mesh, cam, voxel_size=0.05,
                                             max_blocks=4096)
        vol.integrate(depth, color, R, t)
        assert vol.n_blocks == ref.n_blocks
        n = ref.n_blocks
        np.testing.assert_allclose(vol.tsdf[:n], ref.tsdf[:n], atol=1e-5)
        np.testing.assert_allclose(vol.weight[:n], ref.weight[:n], atol=1e-5)


class TestPipeline:
    def test_device_placed_tsdf_matches(self):
        cam = _cam()
        depth = np.full((240, 320), 2.0, np.float32)
        color = np.zeros((240, 320, 3), np.float32)
        R = np.eye(3, dtype=np.float32)
        t = np.zeros(3, np.float32)

        from plvs_tpu.dense.tsdf import TSDFVolume
        ref = TSDFVolume(cam, voxel_size=0.05, max_blocks=4096)
        dev = jax.devices()[1]
        vol = pipeline.DevicePlacedTSDF(dev, cam, voxel_size=0.05,
                                        max_blocks=4096)
        for _ in range(2):
            ref.integrate(depth, color, R, t)
            vol.integrate(depth, color, R, t)
        vol.flush()
        n = ref.n_blocks
        np.testing.assert_allclose(vol.tsdf[:n], ref.tsdf[:n], atol=1e-5)
        pts_ref, _ = ref.occupied_cloud()
        pts, _ = vol.occupied_cloud()
        assert len(pts) == len(pts_ref)

    def test_pipelined_mapper(self):
        cam = _cam()
        mapper = pipeline.make_pipelined_dense_mapper(cam, voxel_size=0.05)
        depth = np.full((240, 320), 2.0, np.float32)
        color = np.zeros((240, 320, 3), np.float32)
        mapper.insert_keyframe_rgbd(0, color, depth,
                                    np.eye(3, dtype=np.float32),
                                    np.zeros(3, np.float32))
        pts, _ = mapper.cloud()
        assert len(pts) > 100
