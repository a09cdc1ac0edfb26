"""Multi-map Atlas tests: map creation on loss, cross-map merge welding."""

import numpy as np
import pytest

from plvs_tpu.slam.map_store import MapStore


def _store_with_map(rng, n_kf=4, n_pts=60, map_id=None):
    st = MapStore(max_kf=32, max_pts=1024, max_obs=8192, n_kp=64)
    if map_id is not None:
        st.active_map = map_id
        st.n_maps = map_id + 1
    kfs = []
    for k in range(n_kf):
        kf = st.alloc_kf()
        st.kf_mask[kf] = True
        st.kf_R[kf] = np.eye(3)
        st.kf_t[kf] = np.array([0.1 * k, 0, 0], np.float32)
        kfs.append(kf)
    pids = st.alloc_pts(n_pts)
    st.pt_mask[pids] = True
    st.pt_xyz[pids] = rng.normal(size=(n_pts, 3)).astype(np.float32)
    st.pt_ref_kf[pids] = kfs[0]
    for pid in pids:
        st.add_observations(kfs[0], np.array([pid]),
                            np.array([int(rng.integers(0, 64))]))
    return st, kfs, pids


class TestAtlasStore:
    def test_create_map_partitions_keyframes(self, rng):
        st, kfs0, _ = _store_with_map(rng)
        assert st.n_maps == 1
        mid = st.create_map()
        assert mid == 1 and st.active_map == 1
        kf_new = st.alloc_kf()
        st.kf_mask[kf_new] = True
        assert st.kf_map[kf_new] == 1
        np.testing.assert_array_equal(st.kfs_of_map(0), kfs0)
        np.testing.assert_array_equal(st.kfs_of_map(1), [kf_new])

    def test_points_of_map(self, rng):
        st, kfs0, pids0 = _store_with_map(rng)
        st.create_map()
        kf1 = st.alloc_kf()
        st.kf_mask[kf1] = True
        p1 = st.alloc_pts(10)
        st.pt_mask[p1] = True
        st.pt_ref_kf[p1] = kf1
        np.testing.assert_array_equal(np.sort(st.points_of_map(0)),
                                      np.sort(pids0))
        np.testing.assert_array_equal(np.sort(st.points_of_map(1)),
                                      np.sort(p1))

    def test_merge_transforms_geometry(self, rng):
        from plvs_tpu.geometry import lie
        import jax.numpy as jnp
        import jax

        st, kfs0, pids0 = _store_with_map(rng)
        st.create_map()
        kf1 = st.alloc_kf()
        st.kf_mask[kf1] = True
        R1 = np.asarray(jax.device_get(
            lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1]))), np.float32)
        t1 = np.array([0.3, -0.2, 0.5], np.float32)
        st.kf_R[kf1] = R1
        st.kf_t[kf1] = t1
        p1 = st.alloc_pts(20)
        st.pt_mask[p1] = True
        xyz1 = rng.normal(size=(20, 3)).astype(np.float32)
        st.pt_xyz[p1] = xyz1
        st.pt_ref_kf[p1] = kf1

        G_R = np.asarray(jax.device_get(
            lie.so3_exp(jnp.asarray([0.0, 0.5, 0.0]))), np.float32)
        G_t = np.array([1.0, 2.0, 3.0], np.float32)
        # camera-frame coords of map-1 points before the weld
        cam_before = xyz1 @ R1.T + t1
        st.merge_map_into(1, 0, G_R, G_t)
        assert st.active_map == 0
        assert (st.kf_map[kf1] == 0) and len(st.kfs_of_map(1)) == 0
        # world points moved by G
        np.testing.assert_allclose(st.pt_xyz[p1], xyz1 @ G_R.T + G_t,
                                   atol=1e-5)
        # but their camera-frame coordinates are invariant
        cam_after = st.pt_xyz[p1] @ st.kf_R[kf1].T + st.kf_t[kf1]
        np.testing.assert_allclose(cam_after, cam_before, atol=1e-5)


class TestAtlasTracking:
    def test_new_map_created_after_lost_deadline(self):
        """Long blackout: the tracker parks the mature map and initializes a
        fresh one; both maps survive in the store."""
        from plvs_tpu.geometry import cameras
        from plvs_tpu.io import synthetic
        from plvs_tpu.slam import System, SystemConfig
        from plvs_tpu.slam.tracking import OK

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=24.0)
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=11)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, loop_closing=False,
                           max_kf_interval=3, new_map_after_lost=4)
        system = System(cam, cfg)
        poses = synthetic.default_trajectory(30)
        states = []
        for i, (ts, gray, depth, R_gt, t_gt) in enumerate(
                scene.sequence(poses=poses)):
            if 15 <= i < 24:  # long blackout: beyond the 4-frame deadline
                gray = np.zeros_like(gray)
                depth = np.zeros_like(depth)
            state, R, t = system.track_rgbd(gray, depth, ts)
            states.append(state)
        st = system.store
        assert st.n_maps == 2, st.n_maps
        assert system.tracker.maps_created == 1
        # both maps hold keyframes; tracking is OK again in the new map
        assert len(st.kfs_of_map(0)) >= 3
        assert len(st.kfs_of_map(1)) >= 1
        assert states[-1] == OK
        assert (st.kf_map[st.kfs_of_map(1)] == 1).all()

    def test_cross_map_merge_welds_into_old_map(self, rng):
        """Two atlas maps covering the same scene, the second drifted: a
        verified cross-map place match must weld map 1 into map 0 and put
        the welded keyframes where map 0's geometry says they belong."""
        from plvs_tpu.slam.keyframe_database import KeyFrameDatabase
        from plvs_tpu.slam.loop_closing import LoopCloser

        st = MapStore(max_kf=32, max_pts=4096, max_obs=32768, n_kp=256)
        # shared synthetic landmarks (a wall of points)
        n_pts = 220
        xyz = np.stack([
            rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(2.8, 3.2, n_pts)], -1).astype(np.float32)
        desc = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)

        def add_kf(t_cw, pt_ids):
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
            st.kf_R[kf] = np.eye(3, dtype=np.float32)
            st.kf_t[kf] = t_cw
            st.kf_frame_id[kf] = kf * 100  # defeat the temporal gate
            n = len(pt_ids)
            st.kf_kp_desc[kf, :n] = st.pt_desc[pt_ids]
            st.kf_kp_mask[kf, :n] = True
            st.add_observations(kf, pt_ids, np.arange(n))
            return kf

        # map 0: two keyframes observing the true landmarks
        p0 = st.alloc_pts(n_pts)
        st.pt_mask[p0] = True
        st.pt_xyz[p0] = xyz
        st.pt_desc[p0] = desc
        kf0 = add_kf(np.zeros(3, np.float32), p0)
        st.pt_ref_kf[p0] = kf0
        add_kf(np.array([0.05, 0, 0], np.float32), p0)

        # map 1: duplicate landmarks, whole map drifted by +0.5m in x
        st.create_map()
        drift = np.array([0.5, 0.0, 0.0], np.float32)
        p1 = st.alloc_pts(n_pts)
        st.pt_mask[p1] = True
        st.pt_xyz[p1] = xyz + drift
        st.pt_desc[p1] = desc
        kf2 = add_kf((-np.eye(3) @ drift).astype(np.float32), p1)
        st.pt_ref_kf[p1] = kf2
        kf3 = add_kf((-drift + np.array([0.04, 0, 0])).astype(np.float32), p1)

        # single-shot detection: this test exercises the merge mechanics,
        # not the multi-keyframe coincidence gate (tested in test_loop /
        # test_place_recognition)
        closer = LoopCloser(st, kfdb=KeyFrameDatabase(
            st, min_train_descs=128, vocab_train_descs=512),
            required_coincidences=1)
        for k in (kf0, 1, kf2):
            closer.kfdb.add(k)
        info = closer.process_keyframe(kf3)
        assert info is not None and info.get("merge"), info
        assert st.n_maps == 2 and st.active_map == 0
        assert len(st.kfs_of_map(1)) == 0
        # welded keyframe pose must land at its true (undrifted) place:
        # kf2 observed the true wall from the origin
        np.testing.assert_allclose(st.kf_t[kf2], np.zeros(3), atol=0.05)
        # duplicated landmarks were fused into map 0's points
        assert info["n_fused"] >= 25
        assert st.pt_mask[p1].sum() < n_pts
