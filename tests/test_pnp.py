"""PnP RANSAC tests: exact recovery, outlier rejection, degenerate guards."""

import jax
import jax.numpy as jnp
import numpy as np

from plvs_tpu.geometry import lie
from plvs_tpu.solvers import pnp


def _scene(rng, n=80):
    X = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                  rng.uniform(2.0, 6.0, n)], -1).astype(np.float32)
    R = np.asarray(jax.device_get(
        lie.so3_exp(jnp.asarray([0.2, -0.3, 0.1]))), np.float32)
    t = np.array([0.3, -0.1, 0.4], np.float32)
    Xc = X @ R.T + t
    uv = (Xc[:, :2] / Xc[:, 2:]).astype(np.float32)
    return X, uv, R, t


class TestPnP:
    def test_exact_recovery(self, rng):
        X, uv, R, t = _scene(rng)
        res = pnp.pnp_ransac(jnp.asarray(X), jnp.asarray(uv),
                             jnp.ones(len(X), bool), jax.random.PRNGKey(0))
        assert int(res.n_inliers) == len(X)
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=1e-3)

    def test_outlier_rejection(self, rng):
        X, uv, R, t = _scene(rng, n=100)
        uv_noisy = uv + rng.normal(0, 0.5 / 300.0, uv.shape).astype(np.float32)
        out = rng.choice(100, 30, replace=False)
        uv_noisy[out] += rng.uniform(0.05, 0.4, (30, 2)).astype(np.float32)
        res = pnp.pnp_ransac(jnp.asarray(X), jnp.asarray(uv_noisy),
                             jnp.ones(100, bool), jax.random.PRNGKey(1),
                             inlier_thresh=0.01)
        inl = np.asarray(res.inliers)
        assert int(res.n_inliers) >= 60
        assert not inl[out].any()
        np.testing.assert_allclose(np.asarray(res.R), R, atol=5e-3)
        np.testing.assert_allclose(np.asarray(res.t), t, atol=2e-2)

    def test_respects_valid_mask(self, rng):
        X, uv, R, t = _scene(rng, n=60)
        # corrupt the masked-out half completely
        uv_bad = uv.copy()
        uv_bad[30:] = rng.uniform(-1, 1, (30, 2)).astype(np.float32)
        valid = np.zeros(60, bool)
        valid[:30] = True
        res = pnp.pnp_ransac(jnp.asarray(X), jnp.asarray(uv_bad),
                             jnp.asarray(valid), jax.random.PRNGKey(2))
        assert not np.asarray(res.inliers)[30:].any()
        np.testing.assert_allclose(np.asarray(res.R), R, atol=1e-3)

    def test_behind_camera_points_excluded(self, rng):
        X, uv, R, t = _scene(rng, n=60)
        # move some world points behind the camera but keep their uv
        Xb = X.copy()
        Rwc = R.T
        C = -Rwc @ t
        Xb[50:] = C[None] - (X[50:] - C[None])  # reflect through the center
        res = pnp.pnp_ransac(jnp.asarray(Xb), jnp.asarray(uv),
                             jnp.ones(60, bool), jax.random.PRNGKey(3))
        assert not np.asarray(res.inliers)[50:].any()
