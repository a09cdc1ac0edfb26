"""Monocular two-view reconstruction: batched H/F RANSAC, model selection,
motion recovery, initial triangulation.

TPU-native re-derivation of the reference's TwoViewReconstruction
(reference: src/TwoViewReconstruction.cc — parallel H & F RANSAC with the
S_H/(S_H+S_F) model-selection score, ReconstructF (E decomposition, 4-way
cheirality) and ReconstructH (Faugeras 8-way decomposition), used by
monocular initialization src/Tracking.cc:2235). All RANSAC hypotheses are
solved with one batched SVD and scored against all correspondences in a
single [Hyp, N] pass.

Inputs are NORMALIZED image coordinates (unit-depth rays' x, y) so the
estimated matrices are E-like/H-euclidean and camera-agnostic.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie, triangulation


def _hartley_normalize(p, w=None):
    """Hartley normalization: zero-mean, mean distance sqrt(2).

    p: [..., N, 2]; w: optional [..., N] weights. Returns (pn, T [...,3,3]).
    """
    if w is None:
        w = jnp.ones(p.shape[:-1], p.dtype)
    wsum = jnp.sum(w, -1, keepdims=True) + 1e-9
    mu = jnp.sum(p * w[..., None], -2) / wsum
    d = jnp.sqrt(jnp.sum((p - mu[..., None, :]) ** 2, -1)) * w
    mean_d = jnp.sum(d, -1) / wsum[..., 0] + 1e-12
    s = jnp.sqrt(2.0) / mean_d
    pn = (p - mu[..., None, :]) * s[..., None, None]
    z = jnp.zeros_like(s)
    o = jnp.ones_like(s)
    T = jnp.stack([
        jnp.stack([s, z, -s * mu[..., 0]], -1),
        jnp.stack([z, s, -s * mu[..., 1]], -1),
        jnp.stack([z, z, o], -1),
    ], -2)
    return pn, T


def _dlt_fundamental(p1, p2):
    """Batched 8-point algorithm with Hartley normalization.
    p1, p2: [H, 8, 2] -> F [H, 3, 3]."""
    p1, T1 = _hartley_normalize(p1)
    p2, T2 = _hartley_normalize(p2)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    ones = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # [H, 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    f = Vt[..., -1, :]
    F = f.reshape(f.shape[:-1] + (3, 3))
    # enforce rank 2, then denormalize
    U, D, Vt2 = jnp.linalg.svd(F)
    D = D.at[..., 2].set(0.0)
    F = U @ (D[..., None] * Vt2)
    return jnp.swapaxes(T2, -1, -2) @ F @ T1


def _dlt_homography(p1, p2):
    """Batched 4-point DLT with Hartley normalization.
    p1, p2: [H, 4, 2] -> H [H, 3, 3] with x2 ~ H x1."""
    p1, T1 = _hartley_normalize(p1)
    p2, T2 = _hartley_normalize(p2)
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    r2 = jnp.stack([z, z, z, x1, y1, o, -y2 * x1, -y2 * y1, -y2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [H, 8, 9]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    h = Vt[..., -1, :]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    return jnp.linalg.inv(T2) @ Hn @ T1


def _sym_epipolar_chi2(F, p1, p2):
    """Symmetric epipolar squared distance per correspondence [Hyp, N]."""
    o = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, o], -1)
    x2 = jnp.concatenate([p2, o], -1)
    l2 = jnp.einsum("hij,nj->hni", F, x1)          # line in image 2
    l1 = jnp.einsum("hji,nj->hni", F, x2)          # line in image 1
    num = jnp.einsum("ni,hni->hn", x2, l2) ** 2
    d2_2 = num / (l2[..., 0] ** 2 + l2[..., 1] ** 2 + 1e-12)
    d2_1 = num / (l1[..., 0] ** 2 + l1[..., 1] ** 2 + 1e-12)
    return d2_1, d2_2


def _homography_chi2(Hm, p1, p2):
    o = jnp.ones(p1.shape[:-1] + (1,), p1.dtype)
    x1 = jnp.concatenate([p1, o], -1)
    x2 = jnp.concatenate([p2, o], -1)
    Hx1 = jnp.einsum("hij,nj->hni", Hm, x1)
    Hinv = jnp.linalg.inv(Hm)
    Hx2 = jnp.einsum("hij,nj->hni", Hinv, x2)
    p2h = Hx1[..., :2] / (Hx1[..., 2:3] + 1e-12)
    p1h = Hx2[..., :2] / (Hx2[..., 2:3] + 1e-12)
    d2_2 = jnp.sum((p2h - p2[None]) ** 2, -1)
    d2_1 = jnp.sum((p1h - p1[None]) ** 2, -1)
    return d2_1, d2_2


class TwoViewResult(NamedTuple):
    success: jnp.ndarray
    used_homography: jnp.ndarray
    R21: jnp.ndarray          # pose of frame 2 w.r.t. frame 1 (x2 = R21 x1 + t21)
    t21: jnp.ndarray          # unit-norm translation
    points3d: jnp.ndarray     # [N, 3] triangulated in frame 1
    inliers: jnp.ndarray      # [N] bool (triangulated + cheirality-passed)
    n_good: jnp.ndarray


def _candidate_poses_from_E(E):
    """4 candidate (R, t) from an essential matrix."""
    U, _, Vt = jnp.linalg.svd(E)
    d = jnp.linalg.det(U @ Vt)
    # make proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))[..., None]
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[..., :, 2]
    return [(R1, t), (R1, -t), (R2, t), (R2, -t)]


def _candidate_poses_from_H(Hm):
    """8 candidate (R, t, n) from a Euclidean homography (Faugeras SVD
    decomposition, as in the reference's ReconstructH)."""
    U, D, Vt = jnp.linalg.svd(Hm)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = D[0], D[1], D[2]
    # normalize by the middle singular value
    eps = 1e-9
    x1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) /
                              jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    x3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) /
                              jnp.maximum(d1 * d1 - d3 * d3, eps), 0.0))
    cands = []
    sin_t = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 + d3) * d2, eps)
    cos_t = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, eps)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            n_p = jnp.stack([e1 * x1, 0.0 * d1, e3 * x3])
            Rp = jnp.asarray(
                [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], Hm.dtype
            )
            Rp = jnp.array(
                [[cos_t, 0.0, -e1 * e3 * sin_t],
                 [0.0, 1.0, 0.0],
                 [e1 * e3 * sin_t, 0.0, cos_t]]
            )
            tp = (d1 - d3) * jnp.stack([e1 * x1, 0.0 * d1, -e3 * x3])
            R = s * U @ Rp @ Vt
            t = U @ tp
            cands.append((R, t / (jnp.linalg.norm(t) + eps)))
    # second family (d' = -d2) handles the reflection case
    sin_p = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / \
        jnp.maximum((d1 - d3) * d2, eps)
    cos_p = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, eps)
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            Rp = jnp.array(
                [[cos_p, 0.0, e1 * e3 * sin_p],
                 [0.0, -1.0, 0.0],
                 [e1 * e3 * sin_p, 0.0, -cos_p]]
            )
            tp = (d1 + d3) * jnp.stack([e1 * x1, 0.0 * d1, e3 * x3])
            R = s * U @ Rp @ Vt
            t = U @ tp
            cands.append((R, t / (jnp.linalg.norm(t) + eps)))
    return cands


def _score_pose(R21, t21, p1, p2, valid, chi2_mask, thresh=4e-6):
    """Cheirality + reprojection test: triangulate and count good points."""
    rays1 = jnp.concatenate([p1, jnp.ones(p1.shape[:-1] + (1,), p1.dtype)], -1)
    rays2 = jnp.concatenate([p2, jnp.ones(p2.shape[:-1] + (1,), p2.dtype)], -1)
    # camera 1 at origin; camera 2 pose (R21, t21): x2 = R21 X + t21
    R12, t12 = lie.se3_inverse(R21, t21)
    X1, tri_ok = triangulation.triangulate_dlt(
        rays1, rays2, jnp.broadcast_to(R12, rays1.shape[:-1] + (3, 3)),
        jnp.broadcast_to(t12, rays1.shape))
    z1 = X1[..., 2]
    X2 = lie.se3_apply(R21, t21, X1)
    z2 = X2[..., 2]
    # reprojection error in normalized coords
    r1 = X1[..., :2] / jnp.where(jnp.abs(z1[..., None]) < 1e-9, 1e-9, z1[..., None])
    r2 = X2[..., :2] / jnp.where(jnp.abs(z2[..., None]) < 1e-9, 1e-9, z2[..., None])
    e1 = jnp.sum((r1 - p1) ** 2, -1)
    e2 = jnp.sum((r2 - p2) ** 2, -1)
    # parallax
    cosp = triangulation.parallax_cos(rays1, rays2, jnp.broadcast_to(R12, rays1.shape[:-1] + (3, 3)))
    good = (
        valid & chi2_mask & tri_ok & (z1 > 0) & (z2 > 0)
        & (e1 < thresh) & (e2 < thresh) & (cosp < 0.99998)
    )
    return good, X1


import functools as _functools


@_functools.partial(
    jax.jit,
    static_argnames=("n_hyp", "sigma", "min_good", "min_parallax_good"))
def reconstruct(
    p1: jnp.ndarray,       # [N, 2] normalized coords in frame 1
    p2: jnp.ndarray,       # [N, 2] matched normalized coords in frame 2
    valid: jnp.ndarray,    # [N]
    key: jax.Array,
    n_hyp: int = 256,
    sigma: float = 1.0 / 500.0,   # ~1 px at f=500 in normalized units
    min_good: int = 50,
    min_parallax_good: float = 0.9,
) -> TwoViewResult:
    """Full two-view reconstruction with H/F model selection — one jitted
    dispatch (remote-tunnel devices pay a round trip per eager op)."""
    n = p1.shape[0]
    th_f = 3.84 * sigma * sigma
    th_h = 5.99 * sigma * sigma
    probs = valid.astype(jnp.float32) + 1e-6
    probs = probs / probs.sum()
    kF, kH, kSel = jax.random.split(key, 3)

    # --- F RANSAC ---
    sF = jax.random.choice(kF, n, shape=(n_hyp, 8), p=probs)
    F = _dlt_fundamental(p1[sF], p2[sF])
    d1, d2 = _sym_epipolar_chi2(F, p1, p2)
    inlF = (d1 < th_f) & (d2 < th_f) & valid[None]
    # reference scoring (CheckFundamental): gate at 3.84 sigma^2 but score
    # on the common 5.99 sigma^2 scale so S_H and S_F are comparable
    scoreF = jnp.sum(
        jnp.where(inlF, (th_h - d1) + (th_h - d2), 0.0), axis=-1)
    bF = jnp.argmax(scoreF)
    inlF_best = inlF[bF]

    # Iteratively refit on the inlier set (reference: FindFundamental
    # recomputes from inliers). One refit is NOT enough: the RANSAC subset
    # is biased toward the noisy minimal-sample model, so refit+regate a few
    # rounds until the support stabilizes.
    def _refit_F(inl):
        w = inl.astype(p1.dtype)
        p1n, T1n = _hartley_normalize(p1, w)
        p2n, T2n = _hartley_normalize(p2, w)
        xa, ya = p1n[:, 0], p1n[:, 1]
        xb, yb = p2n[:, 0], p2n[:, 1]
        A = jnp.stack(
            [xb * xa, xb * ya, xb, yb * xa, yb * ya, yb, xa, ya,
             jnp.ones_like(xa)], axis=-1) * w[:, None]
        _, _, Vt_ = jnp.linalg.svd(A, full_matrices=True)
        Fr = Vt_[-1, :].reshape(3, 3)
        Uf, Df, Vtf = jnp.linalg.svd(Fr)
        Fr = Uf @ (Df.at[2].set(0.0)[:, None] * Vtf)
        return T2n.T @ Fr @ T1n

    F_best = None
    inl_it = inlF_best
    for _ in range(4):
        F_best = _refit_F(inl_it)
        dd1, dd2 = _sym_epipolar_chi2(F_best[None], p1, p2)
        inl_it = (dd1[0] < th_f) & (dd2[0] < th_f) & valid
    inlF_best = inl_it
    SF_ref = jnp.sum(jnp.where(inl_it, (th_h - dd1[0]) + (th_h - dd2[0]), 0.0))
    # re-balance singular values -> essential matrix
    Ue, De, Vte = jnp.linalg.svd(F_best)
    se = 0.5 * (De[0] + De[1])
    F_best = Ue @ jnp.diag(jnp.asarray([se, se, 0.0])) @ Vte
    SF = scoreF[bF]

    # --- H RANSAC ---
    sH = jax.random.choice(kH, n, shape=(n_hyp, 4), p=probs)
    Hm = _dlt_homography(p1[sH], p2[sH])
    h1, h2 = _homography_chi2(Hm, p1, p2)
    inlH = (h1 < th_h) & (h2 < th_h) & valid[None]
    scoreH = jnp.sum(jnp.where(inlH, (th_h - h1) + (th_h - h2), 0.0), axis=-1)
    bH = jnp.argmax(scoreH)
    inlH_best = inlH[bH]

    def _refit_H(inl):
        wh = inl.astype(p1.dtype)
        q1n, S1n = _hartley_normalize(p1, wh)
        q2n, S2n = _hartley_normalize(p2, wh)
        xa, ya = q1n[:, 0], q1n[:, 1]
        xb, yb = q2n[:, 0], q2n[:, 1]
        z = jnp.zeros_like(xa)
        o = jnp.ones_like(xa)
        r1h = jnp.stack([xa, ya, o, z, z, z, -xb * xa, -xb * ya, -xb], -1)
        r2h = jnp.stack([z, z, z, xa, ya, o, -yb * xa, -yb * ya, -yb], -1)
        Ah = jnp.concatenate([r1h * wh[:, None], r2h * wh[:, None]], axis=0)
        _, _, VtH = jnp.linalg.svd(Ah, full_matrices=True)
        return jnp.linalg.inv(S2n) @ VtH[-1, :].reshape(3, 3) @ S1n

    H_best = None
    inl_it_h = inlH_best
    for _ in range(4):
        H_best = _refit_H(inl_it_h)
        hh1, hh2 = _homography_chi2(H_best[None], p1, p2)
        inl_it_h = (hh1[0] < th_h) & (hh2[0] < th_h) & valid
    inlH_best = inl_it_h
    SH_ref = jnp.sum(jnp.where(inl_it_h, (th_h - hh1[0]) + (th_h - hh2[0]), 0.0))
    SH = scoreH[bH]

    # model selection on the REFINED models (reference: RH = SH/(SH+SF)
    # > 0.40 -> H; refined scores are comparable, minimal-sample ones are
    # biased toward whichever model's minimal fit happened to be cleaner)
    use_H = SH_ref / jnp.maximum(SH_ref + SF_ref, 1e-9) > 0.40

    # --- motion recovery: score all candidate poses, take the best ---
    candsE = _candidate_poses_from_E(F_best)  # F in normalized coords == E
    candsH = _candidate_poses_from_H(H_best)
    reproj_th = 4.0 * sigma * sigma

    bestR = jnp.eye(3, dtype=p1.dtype)
    bestT = jnp.zeros(3, p1.dtype)
    bestGood = jnp.asarray(-1)
    bestX = jnp.zeros((n, 3), p1.dtype)
    bestInl = jnp.zeros((n,), bool)
    counts = []
    for Rc, tc in candsE + candsH:
        is_h = len(counts) >= 4
        chi_mask = jnp.where(use_H if is_h else ~use_H,
                             inlH_best if is_h else inlF_best,
                             jnp.zeros((n,), bool))
        good, X1 = _score_pose(Rc, tc, p1, p2, valid, chi_mask, reproj_th)
        ngood = jnp.sum(good)
        better = ngood > bestGood
        bestR = jnp.where(better, Rc, bestR)
        bestT = jnp.where(better, tc, bestT)
        bestX = jnp.where(better, X1, bestX)
        bestInl = jnp.where(better, good, bestInl)
        bestGood = jnp.where(better, ngood, bestGood)
        counts.append(ngood)

    counts = jnp.stack(counts)
    # winner must clearly dominate (reference: nGood > 0.9 * secondBest and
    # enough absolute support)
    second = jnp.sort(counts)[-2]
    success = (bestGood >= min_good) & (
        second.astype(jnp.float32) < min_parallax_good * bestGood.astype(jnp.float32)
    )
    return TwoViewResult(success, use_H, bestR, bestT, bestX, bestInl, bestGood)
