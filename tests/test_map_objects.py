"""Planar map-object tests: homography RANSAC, planar pose recovery,
detection driver and Sim3 refinement on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.geometry import cameras as cam_mod
from plvs_tpu.geometry import lie
from plvs_tpu.slam import map_objects as mo


def _cam():
    return cam_mod.pinhole(320.0, 320.0, 320.0, 240.0)


def _look_at_pose(angle=0.3, dist=2.0, offset=0.0):
    """World->camera pose for a camera behind the z=0 plane looking at the
    object near the origin; ``offset`` translates the camera center so a
    multi-view set has parallax (scale observability)."""
    R_cw = np.asarray(jax.device_get(lie.so3_exp(jnp.asarray(
        [0.1, angle, 0.05]))))
    center = np.array([0.2 + offset, -0.1 - 0.5 * offset, -dist], np.float32)
    t_cw = -R_cw @ center
    return R_cw.astype(np.float32), t_cw.astype(np.float32)


def _project(cam, R_cw, t_cw, pw):
    pc = pw @ R_cw.T + t_cw
    return np.stack([cam.fx * pc[:, 0] / pc[:, 2] + cam.cx,
                     cam.fy * pc[:, 1] / pc[:, 2] + cam.cy], -1), pc[:, 2]


def _synthetic_object(rng, n=80):
    plane_xy = rng.uniform(0, 0.5, (n, 2)).astype(np.float32)
    desc = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
    corners = np.array([[0, 0], [0.5, 0], [0.5, 0.5], [0, 0.5]], np.float32)
    return mo.ObjectTemplate(plane_xy=plane_xy, desc=desc, corners=corners)


class TestPlanarPose:
    def test_pose_from_homography_exact(self, rng):
        # ground-truth object-in-camera pose
        R = np.asarray(jax.device_get(lie.so3_exp(jnp.asarray([0.2, -0.4, 0.1]))))
        t = np.array([0.1, -0.2, 2.5], np.float32)
        H = np.stack([R[:, 0], R[:, 1], t], axis=1)
        R_est, t_est = mo.pose_from_plane_homography(jnp.asarray(H * 3.7))
        np.testing.assert_allclose(np.asarray(R_est), R, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-5)

    def test_ransac_rejects_outliers(self, rng):
        n = 60
        plane = rng.uniform(0, 0.5, (n, 2)).astype(np.float32)
        R = np.asarray(jax.device_get(lie.so3_exp(jnp.asarray([0.1, 0.3, 0.0]))))
        t = np.array([0.0, 0.0, 2.0], np.float32)
        p3 = np.concatenate([plane, np.zeros((n, 1), np.float32)], -1)
        pc = p3 @ R.T + t
        pn = pc[:, :2] / pc[:, 2:]
        pn_noisy = pn.copy()
        out = rng.choice(n, 15, replace=False)
        pn_noisy[out] += rng.uniform(0.05, 0.3, (15, 2))
        H, inl, n_inl = mo.ransac_plane_homography(
            jnp.asarray(plane), jnp.asarray(pn_noisy),
            jnp.ones(n, bool), (1.0 / 320.0) ** 2, jax.random.PRNGKey(1))
        inl = np.asarray(inl)
        assert int(n_inl) >= n - 16
        assert not inl[out].any()
        R_est, t_est = mo.pose_from_plane_homography(H)
        np.testing.assert_allclose(np.asarray(R_est), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=5e-3)


class TestObjectStore:
    def _frame_with_object(self, rng, cam, tpl, R_cw, t_cw, n_bg=120):
        p3 = np.concatenate(
            [tpl.plane_xy, np.zeros((len(tpl.plane_xy), 1), np.float32)], -1)
        uv, z = _project(cam, R_cw, t_cw, p3)
        bg_uv = rng.uniform(0, [cam.width, cam.height], (n_bg, 2)).astype(
            np.float32)
        bg_desc = rng.integers(0, 2**32, (n_bg, 8), dtype=np.uint32)
        kp_xy = np.concatenate([uv, bg_uv]).astype(np.float32)
        desc = np.concatenate([tpl.desc, bg_desc])
        mask = np.ones(len(kp_xy), bool)
        return kp_xy, desc, mask

    def test_detect_and_corners(self, rng):
        cam = _cam()
        tpl = _synthetic_object(rng)
        store = mo.ObjectStore(cam)
        oid = store.add_template(tpl)
        R_cw, t_cw = _look_at_pose()
        kp_xy, desc, mask = self._frame_with_object(rng, cam, tpl, R_cw, t_cw)
        hits = store.detect_in_frame(kp_xy, desc, mask, R_cw, t_cw)
        assert hits == [oid]
        rec = store.objects[oid]
        assert rec.detected and rec.n_inliers >= mo.MIN_INLIERS
        cw = rec.corners_world()
        want = np.concatenate([tpl.corners, np.zeros((4, 1), np.float32)], -1)
        np.testing.assert_allclose(cw, want, atol=0.02)

    def test_no_detection_on_random_frame(self, rng):
        cam = _cam()
        tpl = _synthetic_object(rng)
        store = mo.ObjectStore(cam)
        store.add_template(tpl)
        kp_xy = rng.uniform(0, 640, (200, 2)).astype(np.float32)
        desc = rng.integers(0, 2**32, (200, 8), dtype=np.uint32)
        R_cw, t_cw = _look_at_pose()
        hits = store.detect_in_frame(kp_xy, desc, np.ones(200, bool),
                                     R_cw, t_cw)
        assert hits == []

    def test_refine_improves_perturbed_pose(self, rng):
        from plvs_tpu.slam.map_store import MapStore

        cam = _cam()
        tpl = _synthetic_object(rng)
        ostore = mo.ObjectStore(cam)
        oid = ostore.add_template(tpl)
        rec = ostore.objects[oid]

        st = MapStore(max_kf=8, max_pts=64, max_obs=256, n_kp=16)
        p3 = np.concatenate(
            [tpl.plane_xy, np.zeros((len(tpl.plane_xy), 1), np.float32)], -1)
        for ang, off in ((0.15, -0.4), (0.35, 0.0), (0.55, 0.5)):
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
            R_cw, t_cw = _look_at_pose(angle=ang, offset=off)
            st.kf_R[kf] = R_cw
            st.kf_t[kf] = t_cw
            uv, _ = _project(cam, R_cw, t_cw, p3)
            rec.obs[kf] = (uv.astype(np.float32),
                           np.ones(len(uv), bool))
        # ground truth object pose is identity/scale 1; perturb it
        rec.detected = True
        rec.R_wo = np.asarray(jax.device_get(
            lie.so3_exp(jnp.asarray([0.03, -0.02, 0.01]))), np.float32)
        rec.t_wo = np.array([0.02, -0.015, 0.01], np.float32)
        rec.s_wo = 1.08
        ostore.refine(st)
        np.testing.assert_allclose(rec.R_wo, np.eye(3), atol=2e-3)
        np.testing.assert_allclose(rec.t_wo, np.zeros(3), atol=2e-3)
        assert abs(rec.s_wo - 1.0) < 2e-3
