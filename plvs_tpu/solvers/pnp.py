"""Batched PnP RANSAC: camera pose from 2D-3D correspondences.

TPU-native replacement for the reference's relocalization solvers
(reference: src/MLPnPsolver.cpp — camera-model-agnostic PnP RANSAC used in
Tracking::Relocalization src/Tracking.cc:4982; legacy EPnP in
src/PnPsolver.cc). Like MLPnP, the solver operates on *bearing vectors*
(normalized camera rays), so any camera model that can unproject works —
pinhole and Kannala-Brandt8 alike.

Design: the reference's iterative RANSAC (sample → solve → count, early
exit) becomes one fully batched program — all hypotheses are solved with a
vmapped 6-point DLT and scored at once on the MXU/VPU; the best hypothesis
is refit on its inliers with a fixed-iteration Gauss-Newton polish. No
data-dependent control flow, one compile.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie


class PnPResult(NamedTuple):
    R: jnp.ndarray         # [3,3] world-to-camera
    t: jnp.ndarray         # [3]
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


def _dlt_pose(X: jnp.ndarray, uv: jnp.ndarray, w: jnp.ndarray):
    """Weighted DLT for the 3x4 projection P = [R|t] from >= 6 points
    (world X, normalized image uv); R recovered by SVD orthonormalization
    with the scale fixed from the singular values."""
    n = X.shape[0]
    Xh = jnp.concatenate([X, jnp.ones((n, 1))], -1)          # [n,4]
    z = jnp.zeros((n, 4))
    r1 = jnp.concatenate([Xh, z, -uv[:, :1] * Xh], -1)       # [n,12]
    r2 = jnp.concatenate([z, Xh, -uv[:, 1:2] * Xh], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], 0)
    _, _, vt = jnp.linalg.svd(A, full_matrices=False)
    P = vt[-1].reshape(3, 4)
    M = P[:, :3]
    # fix sign: points must be in front of the camera (positive depth)
    depths = Xh @ P[2]
    sign = jnp.where(jnp.sum(jnp.sign(depths) * w) < 0, -1.0, 1.0)
    M = sign * M
    t_raw = sign * P[:, 3]
    u, s, vth = jnp.linalg.svd(M)
    det = jnp.linalg.det(u @ vth)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]))
    D = D.at[2, 2].set(det)
    R = u @ D @ vth
    scale = jnp.mean(s) * det
    t = t_raw / jnp.where(jnp.abs(scale) > 1e-12, scale, 1e-12)
    return R, t


def _reproj_err2(R, t, X, uv):
    Xc = X @ R.T + t
    z = Xc[:, 2]
    pn = Xc[:, :2] / jnp.where(jnp.abs(z[:, None]) > 1e-9, z[:, None], 1e-9)
    err2 = jnp.sum((pn - uv) ** 2, -1)
    return jnp.where(z > 1e-6, err2, jnp.inf)


@functools.partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def pnp_ransac(X: jnp.ndarray, uv: jnp.ndarray, valid: jnp.ndarray,
               key: jax.Array, n_hyp: int = 256,
               inlier_thresh: float = 0.01, refine_iters: int = 8
               ) -> PnPResult:
    """X: [N,3] world points; uv: [N,2] normalized image coords (bearing
    xy/z); valid: [N] bool. ``inlier_thresh`` is in normalized units
    (pixels / focal length — the reference gates by chi2 in pixels)."""
    n = X.shape[0]
    probs = valid.astype(jnp.float32) + 1e-9
    probs = probs / probs.sum()

    def one(k):
        idx = jax.random.choice(k, n, (6,), replace=False, p=probs)
        return _dlt_pose(X[idx], uv[idx], jnp.ones(6))

    Rs, ts = jax.vmap(one)(jax.random.split(key, n_hyp))
    err2 = jax.vmap(_reproj_err2, in_axes=(0, 0, None, None))(Rs, ts, X, uv)
    inl = (err2 < inlier_thresh ** 2) & valid[None]
    best = jnp.argmax(inl.sum(-1))
    R0, t0 = Rs[best], ts[best]
    inl0 = inl[best]

    # Gauss-Newton polish on the inlier set (reference: the pose
    # optimization rounds after the RANSAC hit)
    w = inl0.astype(jnp.float32)

    def residuals(xi):
        dR, dt = lie.se3_exp(xi)
        R = dR @ R0
        t = dR @ t0 + dt
        Xc = X @ R.T + t
        z = jnp.maximum(Xc[:, 2], 1e-6)
        pn = Xc[:, :2] / z[:, None]
        r = (pn - uv) * w[:, None]
        return r.reshape(-1)

    def step(xi, _):
        J = jax.jacfwd(residuals)(xi)
        r = residuals(xi)
        H = J.T @ J + 1e-8 * jnp.eye(6)
        xi = xi - jnp.linalg.solve(H, J.T @ r)
        return xi, None

    xi, _ = jax.lax.scan(step, jnp.zeros(6), None, length=refine_iters)
    dR, dt = lie.se3_exp(xi)
    R = dR @ R0
    t = dR @ t0 + dt
    err2 = _reproj_err2(R, t, X, uv)
    inl_f = (err2 < inlier_thresh ** 2) & valid
    # keep the polish only if it did not lose inliers
    better = inl_f.sum() >= inl0.sum()
    R = jnp.where(better, R, R0)
    t = jnp.where(better, t, t0)
    inl_f = jnp.where(better, inl_f, inl0)
    return PnPResult(R, t, inl_f, inl_f.sum())
