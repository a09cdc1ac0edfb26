import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.geometry import lie


def rand_w(rng, n=64, scale=1.0):
    return jnp.asarray(rng.normal(size=(n, 3)) * scale, jnp.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = rand_w(rng, scale=0.8)
        R = lie.so3_exp(w)
        w2 = lie.so3_log(R)
        np.testing.assert_allclose(w, w2, atol=1e-4)

    def test_exp_is_rotation(self, rng):
        w = rand_w(rng, scale=2.0)
        R = lie.so3_exp(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_small_angle(self):
        w = jnp.array([[1e-9, 0, 0], [0.0, 0, 0]], jnp.float32)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(R, jnp.broadcast_to(jnp.eye(3), (2, 3, 3)), atol=1e-6)
        np.testing.assert_allclose(lie.so3_log(R), w, atol=1e-6)

    def test_near_pi(self, rng):
        axis = rng.normal(size=(8, 3))
        axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
        w = jnp.asarray(axis * 3.10, jnp.float32)
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(w, w2, atol=5e-3)

    def test_left_jacobian_numeric(self, rng):
        w = rand_w(rng, n=8, scale=0.7)
        J = lie.so3_left_jacobian(w)
        Jinv = lie.so3_left_jacobian_inv(w)
        eye = jnp.broadcast_to(jnp.eye(3), J.shape)
        np.testing.assert_allclose(J @ Jinv, eye, atol=1e-4)
        # J_l satisfies exp((w+dw)) ~ exp(J_l dw) exp(w)
        dw = jnp.asarray(rng.normal(size=(8, 3)) * 1e-3, jnp.float32)
        lhs = lie.so3_exp(w + dw)
        rhs = lie.so3_exp(jnp.einsum("nij,nj->ni", J, dw)) @ lie.so3_exp(w)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)


class TestQuat:
    def test_roundtrip(self, rng):
        q = rng.normal(size=(128, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        q *= np.sign(q[:, :1] + 1e-12)
        R = lie.quat_to_rotmat(jnp.asarray(q))
        q2 = lie.rotmat_to_quat(R)
        np.testing.assert_allclose(np.abs(np.sum(q * np.asarray(q2), axis=-1)), 1.0, atol=1e-5)

    def test_mul_matches_matmul(self, rng):
        q1 = rng.normal(size=(16, 4)).astype(np.float32)
        q2 = rng.normal(size=(16, 4)).astype(np.float32)
        q1 /= np.linalg.norm(q1, axis=-1, keepdims=True)
        q2 /= np.linalg.norm(q2, axis=-1, keepdims=True)
        R12 = lie.quat_to_rotmat(lie.quat_mul(jnp.asarray(q1), jnp.asarray(q2)))
        R1R2 = lie.quat_to_rotmat(jnp.asarray(q1)) @ lie.quat_to_rotmat(jnp.asarray(q2))
        np.testing.assert_allclose(R12, R1R2, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = jnp.asarray(rng.normal(size=(64, 6)), jnp.float32)
        # keep rotation angles below pi so log is the principal value
        xi = xi.at[:, 3:].multiply(0.8)
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(xi, xi2, atol=2e-4)

    def test_exp_matches_expm(self, rng):
        from scipy.linalg import expm

        xi = rng.normal(size=(6,)).astype(np.float32)
        R, t = lie.se3_exp(jnp.asarray(xi[None]))
        G = np.zeros((4, 4))
        G[:3, :3] = np.asarray(lie.hat(jnp.asarray(xi[3:])))
        G[:3, 3] = xi[:3]
        T = expm(G)
        np.testing.assert_allclose(np.asarray(R[0]), T[:3, :3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t[0]), T[:3, 3], atol=1e-5)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(32, 6)), jnp.float32)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inverse(R, t)
        Rc, tc = lie.se3_compose(R, t, Ri, ti)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(tc, 0.0, atol=1e-5)

    def test_apply(self, rng):
        xi = jnp.asarray(rng.normal(size=(4, 6)), jnp.float32)
        R, t = lie.se3_exp(xi)
        p = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
        out = lie.se3_apply(R, t, p)
        ref = jnp.einsum("nij,nj->ni", R, p) + t
        np.testing.assert_allclose(out, ref, atol=1e-6)


class TestSim3:
    def test_exp_matches_expm(self, rng):
        from scipy.linalg import expm

        for scale in [0.0, 0.3, -0.5]:
            z = rng.normal(size=(7,)).astype(np.float32) * 0.7
            z[6] = scale
            R, t, s = lie.sim3_exp(jnp.asarray(z[None]))
            G = np.zeros((4, 4))
            G[:3, :3] = np.asarray(lie.hat(jnp.asarray(z[3:6]))) + z[6] * np.eye(3)
            G[:3, 3] = z[:3]
            T = expm(G)
            sR = np.asarray(s[0]) * np.asarray(R[0])
            np.testing.assert_allclose(sR, T[:3, :3], atol=1e-4)
            np.testing.assert_allclose(np.asarray(t[0]), T[:3, 3], atol=1e-4)

    def test_exp_log_roundtrip(self, rng):
        z = jnp.asarray(rng.normal(size=(32, 7)) * 0.6, jnp.float32)
        R, t, s = lie.sim3_exp(z)
        z2 = lie.sim3_log(R, t, s)
        np.testing.assert_allclose(z, z2, atol=1e-3)

    def test_compose_inverse(self, rng):
        z = jnp.asarray(rng.normal(size=(16, 7)) * 0.5, jnp.float32)
        R, t, s = lie.sim3_exp(z)
        Ri, ti, si = lie.sim3_inverse(R, t, s)
        Rc, tc, sc = lie.sim3_compose(R, t, s, Ri, ti, si)
        np.testing.assert_allclose(Rc, jnp.broadcast_to(jnp.eye(3), Rc.shape), atol=1e-5)
        np.testing.assert_allclose(tc, 0.0, atol=1e-5)
        np.testing.assert_allclose(sc, 1.0, atol=1e-5)

    def test_sim3_apply_matches_se3_when_s1(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)), jnp.float32)
        R, t = lie.se3_exp(xi)
        p = jnp.asarray(rng.normal(size=(8, 3)), jnp.float32)
        s = jnp.ones((8,), jnp.float32)
        np.testing.assert_allclose(
            lie.sim3_apply(R, t, s, p), lie.se3_apply(R, t, p), atol=1e-6
        )
