"""Retro-corrected trajectory export: frame poses are stored RELATIVE to
their reference keyframe and reconstructed through the current (loop
corrected / BA-refined) keyframe poses at export (reference:
mlRelativeFramePoses include/Tracking.h:206-211; SaveTrajectoryTUM composes
them with current KF poses walking past culled keyframes,
src/System.cc:860-1006)."""

import numpy as np

from plvs_tpu.geometry import cameras
from plvs_tpu.slam.map_store import MapStore

CAM = cameras.pinhole(155.0, 155.0, 160.0, 120.0, width=320, height=240,
                      bf=17.0)


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    return np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


class TestResolveKfPose:
    def test_live_kf_resolves_to_current_pose(self):
        st = MapStore(max_kf=8, max_pts=64, n_kp=16)
        k = st.alloc_kf()
        st.kf_mask[k] = True
        st.kf_R[k] = _rot_z(0.3)
        st.kf_t[k] = np.asarray([1.0, 2.0, 3.0], np.float32)
        uid = int(st.kf_uid[k])
        R, t = st.resolve_kf_pose(uid)
        np.testing.assert_allclose(R, st.kf_R[k], atol=1e-6)
        np.testing.assert_allclose(t, st.kf_t[k], atol=1e-6)
        # pose moved (loop correction): resolution follows
        st.kf_t[k] = np.asarray([-1.0, 0.0, 5.0], np.float32)
        _, t2 = st.resolve_kf_pose(uid)
        np.testing.assert_allclose(t2, st.kf_t[k], atol=1e-6)

    def test_tombstone_chain_composes_through_culled_kf(self):
        st = MapStore(max_kf=8, max_pts=64, n_kp=16)
        ka = st.alloc_kf()
        st.kf_mask[ka] = True
        kb = st.alloc_kf()
        st.kf_mask[kb] = True
        st.kf_R[ka] = _rot_z(0.2)
        st.kf_t[ka] = np.asarray([0.5, 0.0, 0.0], np.float32)
        st.kf_R[kb] = _rot_z(-0.1)
        st.kf_t[kb] = np.asarray([0.0, 0.3, 0.0], np.float32)
        # shared observations so covisibility finds the anchor
        p = st.alloc_pts(20)
        st.pt_mask[p] = True
        st.add_observations(ka, p, np.arange(20) % st.n_kp)
        st.add_observations(kb, p, np.arange(20) % st.n_kp)
        uid_a = int(st.kf_uid[ka])
        R_a, t_a = st.kf_R[ka].copy(), st.kf_t[ka].copy()
        st.remove_keyframe(ka)
        # culled: resolves to its last absolute pose while the anchor has
        # not moved
        R, t = st.resolve_kf_pose(uid_a)
        np.testing.assert_allclose(R, R_a, atol=1e-5)
        np.testing.assert_allclose(t, t_a, atol=1e-5)
        # the ANCHOR moves (loop correction): the tombstone's relative pose
        # carries the culled keyframe with it
        dR = _rot_z(0.4)
        dt = np.asarray([0.1, -0.2, 0.05], np.float32)
        R_b_new = (st.kf_R[kb] @ dR).astype(np.float32)
        t_b_new = (st.kf_R[kb] @ dt + st.kf_t[kb]).astype(np.float32)
        T_ab_R = R_a @ st.kf_R[kb].T
        T_ab_t = t_a - T_ab_R @ st.kf_t[kb]
        st.kf_R[kb] = R_b_new
        st.kf_t[kb] = t_b_new
        R2, t2 = st.resolve_kf_pose(uid_a)
        np.testing.assert_allclose(R2, T_ab_R @ R_b_new, atol=1e-5)
        np.testing.assert_allclose(t2, T_ab_R @ t_b_new + T_ab_t, atol=1e-5)

    def test_unknown_uid_returns_none(self):
        st = MapStore(max_kf=8, max_pts=64, n_kp=16)
        assert st.resolve_kf_pose(123) is None


class TestSystemRetroExport:
    def test_export_reanchors_after_manual_correction(self):
        """Move the reference keyframe after tracking (as a loop closure
        would) — the exported trajectory must follow it, while the raw
        trajectory log keeps the stale absolute pose."""
        from plvs_tpu.slam import System, SystemConfig

        sys_ = System(CAM, SystemConfig(num_features=256, n_levels=4,
                                        local_ba=False, loop_closing=False))
        st = sys_.store
        k = st.alloc_kf()
        st.kf_mask[k] = True
        st.kf_R[k] = np.eye(3, dtype=np.float32)
        st.kf_t[k] = np.zeros(3, np.float32)
        sys_.tracker.ref_kf = k

        class Res:
            state = 2
            R = _rot_z(0.1)
            t = np.asarray([0.2, 0.0, 0.0], np.float32)
            is_keyframe = False
            kf_id = -1

        sys_._post_track(Res(), 1.0)
        # loop closure: the reference KF shifts by 0.5 in x
        st.kf_t[k] = np.asarray([0.5, 0.0, 0.0], np.float32)
        retro = sys_.retro_trajectory()
        assert len(retro) == 1
        _, R, t = retro[0]
        np.testing.assert_allclose(R, Res.R, atol=1e-6)
        np.testing.assert_allclose(
            t, Res.t + Res.R @ np.asarray([0.5, 0, 0], np.float32), atol=1e-5)
        # raw log unchanged
        np.testing.assert_allclose(sys_.trajectory[0][2], Res.t, atol=1e-6)
