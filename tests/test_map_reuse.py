"""Sparse-map reuse: save an atlas, reload it frozen, relocalize and extend.

Covers the reference's SparseMapping.* flow (reference: System::LoadAtlas
src/System.cc:201-229 — load + freeze keyframes :212-216;
forceRelocalization enters Tracking::RELOCALIZE_IN_LOADED_MAP
:353-356; saveOnShutdown :829-844).
"""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import serialization, synthetic
from plvs_tpu.slam import System, SystemConfig
from plvs_tpu.slam.map_store import MapStore
from plvs_tpu.slam.tracking import OK, RELOCALIZE_IN_LOADED_MAP

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240, bf=24.0)
CFG = dict(num_features=512, n_levels=4, max_kf=64, max_pts=16384)


@pytest.fixture(scope="module")
def saved_session(tmp_path_factory):
    scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=3)
    system = System(CAM, SystemConfig(**CFG))
    poses = synthetic.default_trajectory(40)
    for ts, gray, depth, R, t in scene.sequence(poses=poses):
        system.track_rgbd(gray, depth, ts)
    path = str(tmp_path_factory.mktemp("reuse") / "atlas.npz")
    system.shutdown(save_map_path=path)
    return path, scene, poses, system


class TestMapReuse:
    def test_relocalize_in_loaded_map(self, saved_session):
        path, scene, poses, _ = saved_session
        system = System(CAM, SystemConfig(**CFG))
        system.load_map(path, freeze=True, force_relocalization=True)
        assert system.tracker.state == RELOCALIZE_IN_LOADED_MAP
        assert system.store.kf_fixed[system.store.kf_mask].all()

        # replay from the middle of the mapped trajectory: the system must
        # relocalize (absolute pose, no new map) and keep tracking
        states, errs = [], []
        for i in range(18, 30):
            R_gt, t_gt = poses[i]
            gray, depth = scene.render(R_gt, t_gt)
            state, R, t = system.track_rgbd(gray, depth, i / 30.0)
            states.append(state)
            if state == OK:
                C_est = -R.T @ t
                C_gt = -R_gt.T @ t_gt
                errs.append(np.linalg.norm(C_est - C_gt))
        assert OK in states, states
        # once relocalized the absolute pose matches the mapped session
        assert np.median(errs) < 0.05, errs
        # the loaded map was reused, not re-initialized
        assert system.store.n_maps == 1

    def test_frozen_keyframes_never_move(self, saved_session):
        path, scene, poses, _ = saved_session
        system = System(CAM, SystemConfig(**CFG))
        system.load_map(path, freeze=True, force_relocalization=True)
        frozen_ids = np.nonzero(system.store.kf_fixed)[0]
        R0 = system.store.kf_R[frozen_ids].copy()
        t0 = system.store.kf_t[frozen_ids].copy()
        n_pts0 = system.store.num_points
        # continue past the mapped trajectory so new keyframes are created
        ext = synthetic.default_trajectory(80)
        for i in range(20, 60):
            R_gt, t_gt = ext[i]
            gray, depth = scene.render(R_gt, t_gt)
            system.track_rgbd(gray, depth, i / 30.0)
        np.testing.assert_array_equal(system.store.kf_R[frozen_ids], R0)
        np.testing.assert_array_equal(system.store.kf_t[frozen_ids], t0)
        # frozen landmarks were not culled away
        assert system.store.num_points >= 0.5 * n_pts0

    def test_no_force_reloc_starts_lost(self, saved_session):
        path, _, _, _ = saved_session
        from plvs_tpu.slam.tracking import LOST

        system = System(CAM, SystemConfig(**CFG))
        system.load_map(path, freeze=False, force_relocalization=False)
        assert system.tracker.state == LOST
        assert not system.store.kf_fixed[system.store.kf_mask].any()


class TestAtlasFieldsRoundtrip:
    def test_multi_map_ids_survive(self, tmp_path):
        st = MapStore(max_kf=8, max_pts=64, n_kp=4)
        a = st.alloc_kf()
        st.kf_mask[a] = True
        st.create_map()
        b = st.alloc_kf()
        st.kf_mask[b] = True
        p = str(tmp_path / "atlas.npz")
        serialization.save_atlas(p, st)
        st2, _ = serialization.load_atlas(p)
        np.testing.assert_array_equal(st2.kf_map[:2], st.kf_map[:2])
        assert st2.active_map == st.active_map == 1
        assert st2.n_maps == 2
