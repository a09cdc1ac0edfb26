import jax
import jax.numpy as jnp
import numpy as np

from plvs_tpu.geometry import cameras


def make_points(rng, n=256):
    """Camera-frame points within a realistic pinhole FOV (|x/z|,|y/z| < 0.5)."""
    p = np.empty((n, 3), np.float32)
    p[:, 2] = np.abs(rng.normal(size=n)).astype(np.float32) + 1.0
    p[:, 0] = rng.uniform(-0.5, 0.5, size=n).astype(np.float32) * p[:, 2]
    p[:, 1] = rng.uniform(-0.5, 0.5, size=n).astype(np.float32) * p[:, 2]
    return jnp.asarray(p)


class TestPinhole:
    CAM = cameras.pinhole(520.9, 521.0, 325.1, 249.7, [0.23, -0.35, -0.0003, 0.0002, 0.0])

    def test_project_unproject(self, rng):
        p = make_points(rng)
        uv = cameras.project(self.CAM, p)
        rays = cameras.unproject(self.CAM, uv)
        p_norm = p / p[:, 2:3]
        np.testing.assert_allclose(rays, p_norm, atol=1e-3)

    def test_project_jac_vs_autodiff(self, rng):
        cam = cameras.pinhole(520.9, 521.0, 325.1, 249.7)  # no distortion
        p = make_points(rng, 32)
        J = cameras.project_jac(cam, p)
        Jad = jax.vmap(jax.jacfwd(lambda x: cameras.project(cam, x)))(p)
        np.testing.assert_allclose(J, Jad, atol=1e-3, rtol=1e-3)

    def test_backproject(self, rng):
        cam = cameras.pinhole(520.9, 521.0, 325.1, 249.7)
        p = make_points(rng, 32)
        uv = cameras.project(cam, p)
        p2 = cameras.backproject(cam, uv, p[:, 2])
        np.testing.assert_allclose(p, p2, atol=1e-3)

    def test_in_image(self):
        cam = cameras.pinhole(520.9, 521.0, 325.1, 249.7, width=640, height=480)
        uv = jnp.array([[10.0, 10.0], [-1.0, 5.0], [640.5, 100.0], [320, 479.0]])
        np.testing.assert_array_equal(
            cameras.in_image(cam, uv), jnp.array([True, False, False, True])
        )

    def test_stereo_disparity(self):
        cam = cameras.pinhole(520.0, 520.0, 320.0, 240.0, bf=40.0)
        X = jnp.array([[0.0, 0.0, 2.0]])
        uv = cameras.project(cam, X)
        ur = cameras.stereo_disparity_u(cam, X)
        np.testing.assert_allclose(uv[0, 0] - ur[0], 20.0, atol=1e-4)


class TestKB8:
    CAM = cameras.kannala_brandt8(
        190.97847, 190.9733, 254.93170, 256.8974,
        0.0034823894, 0.0007150348, -0.0020532361, 0.00020293673,
        width=512, height=512,
    )  # TUM-VI-like fisheye intrinsics

    def test_project_unproject(self, rng):
        p = rng.normal(size=(256, 3)).astype(np.float32)
        p[:, 2] = np.abs(p[:, 2]) + 0.5
        p = jnp.asarray(p)
        uv = cameras.project(self.CAM, p)
        rays = cameras.unproject(self.CAM, uv)
        p_norm = p / p[:, 2:3]
        np.testing.assert_allclose(rays, p_norm, atol=2e-3)

    def test_project_jac_vs_autodiff(self, rng):
        p = rng.normal(size=(32, 3)).astype(np.float32) * 0.4
        p[:, 2] = np.abs(p[:, 2]) + 1.0
        p = jnp.asarray(p)
        J = cameras.project_jac(self.CAM, p)
        Jad = jax.vmap(jax.jacfwd(lambda x: cameras.project(self.CAM, x)))(p)
        np.testing.assert_allclose(J, Jad, atol=5e-2, rtol=5e-3)

    def test_wide_angle(self):
        # 60-degree off-axis point still round-trips
        p = jnp.array([[np.tan(np.deg2rad(60.0)), 0.0, 1.0]], jnp.float32)
        uv = cameras.project(self.CAM, p)
        rays = cameras.unproject(self.CAM, uv)
        np.testing.assert_allclose(rays, p, atol=5e-3)


class TestTriangulation:
    def test_two_view_points(self, rng):
        from plvs_tpu.geometry import triangulation, lie

        Xw = make_points(rng, 128) + jnp.array([0.0, 0.0, 2.0])
        # cam1 at origin, cam2 translated
        Rcw1 = jnp.broadcast_to(jnp.eye(3), (128, 3, 3))
        tcw1 = jnp.zeros((128, 3))
        R2 = lie.so3_exp(jnp.asarray([[0.0, 0.05, 0.0]] * 128, jnp.float32))
        tcw2 = jnp.asarray([[-0.3, 0.0, 0.0]] * 128, jnp.float32)
        ray1 = Xw / Xw[:, 2:3]
        Xc2 = lie.se3_apply(R2, tcw2, Xw)
        ray2 = Xc2 / Xc2[:, 2:3]
        Xt, valid = triangulation.triangulate_points_world(Rcw1, tcw1, R2, tcw2, ray1, ray2)
        assert bool(jnp.all(valid))
        np.testing.assert_allclose(Xt, Xw, atol=1e-2)

    def test_epipolar_error(self, rng):
        from plvs_tpu.geometry import triangulation, lie

        Xw = make_points(rng, 64) + jnp.array([0.0, 0.0, 2.0])
        R12 = lie.so3_exp(jnp.asarray([[0.0, 0.1, 0.02]] * 64, jnp.float32))
        t12 = jnp.asarray([[0.5, 0.0, 0.0]] * 64, jnp.float32)
        # x1 = R12 x2 + t12 : generate consistent rays
        X2 = Xw
        X1 = lie.se3_apply(R12, t12, X2)
        e = triangulation.epipolar_error(X1 / X1[:, 2:3], X2 / X2[:, 2:3], R12, t12)
        np.testing.assert_allclose(e, 0.0, atol=1e-4)

    def test_line_triangulation(self, rng):
        from plvs_tpu.geometry import triangulation, lie

        n = 32
        Ps = rng.normal(size=(n, 3)).astype(np.float32) * 0.5 + np.array([0, 0, 3.0], np.float32)
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        Pe = Ps + 0.5 * d
        Ps, Pe = jnp.asarray(Ps), jnp.asarray(Pe)
        Rcw1 = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        tcw1 = jnp.zeros((n, 3))
        Rcw2 = lie.so3_exp(jnp.asarray([[0.0, 0.08, 0.0]] * n, jnp.float32))
        tcw2 = jnp.asarray([[-0.4, 0.05, 0.0]] * n, jnp.float32)
        r_s1 = Ps / Ps[:, 2:3]
        r_e1 = Pe / Pe[:, 2:3]
        S2 = lie.se3_apply(Rcw2, tcw2, Ps)
        E2 = lie.se3_apply(Rcw2, tcw2, Pe)
        r_s2, r_e2 = S2 / S2[:, 2:3], E2 / E2[:, 2:3]
        Xs, Xe, valid, _ = triangulation.triangulate_line_planes(
            Rcw1, tcw1, Rcw2, tcw2, r_s1, r_e1, r_s2, r_e2
        )
        v = np.asarray(valid)
        # random line orientations include many near-degenerate configs
        # (plane nearly containing the second ray); those must be gated out
        assert v.mean() > 0.5
        np.testing.assert_allclose(np.asarray(Xs)[v], np.asarray(Ps)[v], atol=2e-2)
        np.testing.assert_allclose(np.asarray(Xe)[v], np.asarray(Pe)[v], atol=2e-2)
