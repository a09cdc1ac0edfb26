"""Batched Sim3/SE3 RANSAC from 3D-3D correspondences.

TPU-native re-derivation of the reference's Sim3Solver
(reference: src/Sim3Solver.cc — Horn 1987 closed-form alignment inside a
sequential RANSAC loop with reprojection-error inlier checks). Here ALL
RANSAC hypotheses are evaluated at once: sample S minimal sets, compute S
closed-form alignments with a batched 3x3 SVD, and count inliers with one
[S, N] distance matrix — no data-dependent loop, one kernel launch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def horn_alignment(P: jnp.ndarray, Q: jnp.ndarray, with_scale: bool = True):
    """Closed-form alignment Q ~= s R P + t for [..., N, 3] point sets.

    Batched over leading axes (the RANSAC hypotheses).
    """
    muP = P.mean(axis=-2, keepdims=True)
    muQ = Q.mean(axis=-2, keepdims=True)
    Pc = P - muP
    Qc = Q - muQ
    cov = jnp.einsum("...ni,...nj->...ij", Qc, Pc)
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.broadcast_to(jnp.eye(3, dtype=P.dtype), cov.shape).copy()
    S = S.at[..., 2, 2].set(jnp.sign(det))
    R = U @ S @ Vt
    if with_scale:
        varP = jnp.sum(Pc * Pc, axis=(-2, -1))
        s = jnp.sum(D * jnp.stack([jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], -1), axis=-1) / jnp.maximum(varP, 1e-12)
    else:
        s = jnp.ones(cov.shape[:-2], P.dtype)
    t = muQ[..., 0, :] - s[..., None] * jnp.einsum("...ij,...j->...i", R, muP[..., 0, :])
    return s, R, t


class RansacResult(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray   # [N] bool
    n_inliers: jnp.ndarray


import functools as _functools


@_functools.partial(
    jax.jit, static_argnames=("n_hyp", "inlier_thresh", "with_scale"))
def sim3_ransac(
    P: jnp.ndarray,         # [N, 3] points in frame 1
    Q: jnp.ndarray,         # [N, 3] corresponding points in frame 2
    valid: jnp.ndarray,     # [N] bool
    key: jax.Array,
    n_hyp: int = 256,
    inlier_thresh: float = 0.05,
    with_scale: bool = True,
) -> RansacResult:
    """Fully batched RANSAC: Q = s R P + t. ``inlier_thresh`` is a 3D
    distance (the reference gates by reprojection chi2; 3D gating keeps the
    kernel camera-agnostic — callers can re-verify by projection)."""
    n = P.shape[0]
    # sample 3-point minimal sets, biased to valid entries
    probs = valid.astype(jnp.float32) + 1e-6
    probs = probs / probs.sum()
    samples = jax.random.choice(key, n, shape=(n_hyp, 3), p=probs)
    Ps = P[samples]
    Qs = Q[samples]
    s, R, t = horn_alignment(Ps, Qs, with_scale)
    # evaluate all hypotheses against all correspondences
    QP = s[:, None, None] * jnp.einsum("hij,nj->hni", R, P) + t[:, None, :]
    d2 = jnp.sum((QP - Q[None]) ** 2, axis=-1)  # [H, N]
    inl = (d2 < inlier_thresh ** 2) & valid[None, :]
    counts = inl.sum(axis=-1)
    # degenerate guard: scale sane
    sane = (s > 0.1) & (s < 10.0)
    counts = jnp.where(sane, counts, -1)
    best = jnp.argmax(counts)
    inliers = inl[best]

    # refine on inliers of the best hypothesis (one weighted Horn pass)
    w = inliers.astype(P.dtype)[:, None]
    muP = (P * w).sum(0) / jnp.maximum(w.sum(), 1.0)
    muQ = (Q * w).sum(0) / jnp.maximum(w.sum(), 1.0)
    Pc = (P - muP) * w
    Qc = (Q - muQ) * w
    cov = Qc.T @ Pc
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S3 = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], P.dtype)).at[2, 2].set(jnp.sign(det))
    Rr = U @ S3 @ Vt
    if with_scale:
        varP = jnp.sum(Pc * Pc)
        sr = jnp.sum(D * jnp.asarray([1.0, 1.0, 1.0]).at[2].set(jnp.sign(det))) / jnp.maximum(varP, 1e-12)
    else:
        sr = jnp.asarray(1.0, P.dtype)
    tr = muQ - sr * (Rr @ muP)
    Qhat = sr * (P @ Rr.T) + tr
    inl_r = (jnp.sum((Qhat - Q) ** 2, -1) < inlier_thresh ** 2) & valid
    return RansacResult(sr, Rr, tr, inl_r, inl_r.sum())
