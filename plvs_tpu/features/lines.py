"""Batched line-segment detection + binary line-band descriptors (LBD).

TPU-native replacement for the reference's line pipeline
(reference: src/LineExtractor.cc wrapping the customized
Thirdparty/line_descriptor — EDLine/LSD detectors + LBD binary
descriptors; include/LineExtractor.h). Sequential edge-drawing /
region-growing does not map to the TPU, so detection is re-derived as:
Sobel gradients -> edge mask -> orientation-gated connected components
(iterative min-label propagation, one batched op per sweep) -> per-label
moment statistics via segment-sums -> PCA line fit + straightness filter.
Descriptors are a binarized line-band construction (gradient statistics in
bands parallel to the segment, compared through a seeded pair pattern) —
self-consistent across the framework like the ORB pattern, packed to
uint32x8 so the SAME Hamming matchers serve points and lines.

The (theta, d) 2D line representation used for guided matching mirrors the
reference's Line2DRepresentation (include/Geom2DUtils.h:31).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

N_BANDS = 9
N_SAMPLES = 15
BAND_WIDTH = 7  # perpendicular offsets: -3..3


class KeyLines(NamedTuple):
    """Fixed-capacity line set (SoA, padded + masked)."""

    sp: jnp.ndarray      # [L, 2] start point (x, y), level-0 scale
    ep: jnp.ndarray      # [L, 2] end point
    angle: jnp.ndarray   # [L] direction angle in [-pi/2, pi/2)
    response: jnp.ndarray  # [L] support-pixel count
    octave: jnp.ndarray  # [L] int32
    desc: jnp.ndarray    # [L, 8] uint32 binary LBD
    mask: jnp.ndarray    # [L] bool


def _sobel(img):
    gx = (
        jnp.roll(img, (-1, -1), (0, 1)) + 2 * jnp.roll(img, (0, -1), (0, 1))
        + jnp.roll(img, (1, -1), (0, 1))
        - jnp.roll(img, (-1, 1), (0, 1)) - 2 * jnp.roll(img, (0, 1), (0, 1))
        - jnp.roll(img, (1, 1), (0, 1))
    )
    gy = (
        jnp.roll(img, (-1, -1), (0, 1)) + 2 * jnp.roll(img, (-1, 0), (0, 1))
        + jnp.roll(img, (-1, 1), (0, 1))
        - jnp.roll(img, (1, -1), (0, 1)) - 2 * jnp.roll(img, (1, 0), (0, 1))
        - jnp.roll(img, (1, 1), (0, 1))
    )
    return gx, gy


def _angle_diff_mod_pi(a, b):
    d = jnp.abs(a - b)
    d = jnp.mod(d, jnp.pi)
    return jnp.minimum(d, jnp.pi - d)


@functools.partial(
    jax.jit, static_argnames=("max_lines", "n_iters")
)
def detect_lines(
    img: jnp.ndarray,
    max_lines: int = 128,
    grad_thresh: float = 40.0,
    min_length: float = 15.0,
    ori_tol: float = jnp.pi / 8,
    straightness: float = 0.02,
    n_iters: int | None = None,
) -> KeyLines:
    """Detect up to ``max_lines`` segments in a [H, W] grayscale image."""
    h, w = img.shape
    if n_iters is None:
        n_iters = (h + w) // 2
    gx, gy = _sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # line orientation = perpendicular to gradient, in [0, pi)
    ori = jnp.mod(jnp.arctan2(gy, gx) + jnp.pi / 2, jnp.pi)
    edge = mag > grad_thresh
    # NOTE: no NMS thinning — it fragments staircase edges of tilted lines;
    # the PCA fit handles the 2-3 px wide support band fine.

    def conn(sy, sx):
        e2 = jnp.roll(edge, (sy, sx), (0, 1))
        o2 = jnp.roll(ori, (sy, sx), (0, 1))
        return edge & e2 & (_angle_diff_mod_pi(ori, o2) < ori_tol)

    connect = jnp.stack([conn(1, 0), conn(-1, 0), conn(0, 1), conn(0, -1),
                         conn(1, 1), conn(-1, -1), conn(1, -1), conn(-1, 1)])
    connect = connect.at[0, 0, :].set(False).at[1, h - 1, :].set(False)
    connect = connect.at[2, :, 0].set(False).at[3, :, w - 1].set(False)
    connect = connect.at[4, 0, :].set(False).at[4, :, 0].set(False)
    connect = connect.at[5, h - 1, :].set(False).at[5, :, w - 1].set(False)
    connect = connect.at[6, 0, :].set(False).at[6, :, w - 1].set(False)
    connect = connect.at[7, h - 1, :].set(False).at[7, :, 0].set(False)

    init = jnp.where(edge, jnp.arange(h * w, dtype=jnp.int32).reshape(h, w),
                     jnp.int32(h * w))

    def body(_, lab):
        shifts = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1), (1, -1), (-1, 1)]
        m = lab
        for ci, (sy, sx) in enumerate(shifts):
            nb = jnp.roll(lab, (sy, sx), (0, 1))
            m = jnp.minimum(m, jnp.where(connect[ci], nb, m))
        return m

    labels = jax.lax.fori_loop(0, n_iters, body, init)
    flat = labels.reshape(-1)

    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.reshape(-1).astype(jnp.float32)
    ys = ys.reshape(-1).astype(jnp.float32)
    n_seg = h * w + 1
    ones = jnp.where(flat < h * w, 1.0, 0.0)
    # gradient-magnitude-weighted moments: the support band is 2-3 px wide
    # (no NMS), so an unweighted centroid wobbles with the rasterization of
    # the edge; weighting by |∇I| concentrates the fit on the true edge and
    # stabilizes (theta, d) to sub-pixel across viewpoints — the line
    # residuals feed pose solves, so their noise floor matters as much as
    # the corner detector's
    wgt = ones * mag.reshape(-1)
    cnt = jax.ops.segment_sum(ones, flat, num_segments=n_seg)
    wsum = jax.ops.segment_sum(wgt, flat, num_segments=n_seg)
    sx_ = jax.ops.segment_sum(xs * wgt, flat, num_segments=n_seg)
    sy_ = jax.ops.segment_sum(ys * wgt, flat, num_segments=n_seg)
    sxx = jax.ops.segment_sum(xs * xs * wgt, flat, num_segments=n_seg)
    syy = jax.ops.segment_sum(ys * ys * wgt, flat, num_segments=n_seg)
    sxy = jax.ops.segment_sum(xs * ys * wgt, flat, num_segments=n_seg)

    top_cnt, top_lab = jax.lax.top_k(cnt[: h * w], max_lines)
    c = jnp.maximum(wsum[top_lab], 1e-6)
    cx = sx_[top_lab] / c
    cy = sy_[top_lab] / c
    vxx = sxx[top_lab] / c - cx * cx
    vyy = syy[top_lab] / c - cy * cy
    vxy = sxy[top_lab] / c - cx * cy
    # principal direction of the 2x2 covariance
    theta = 0.5 * jnp.arctan2(2 * vxy, vxx - vyy)
    dx, dy = jnp.cos(theta), jnp.sin(theta)
    # eigenvalues for straightness
    tr = vxx + vyy
    det = vxx * vyy - vxy * vxy
    disc = jnp.sqrt(jnp.maximum(tr * tr / 4 - det, 0.0))
    l1 = tr / 2 + disc
    l2 = tr / 2 - disc
    straight = l2 / jnp.maximum(l1, 1e-6)

    # endpoints: min/max projection of support pixels on the direction
    dxm = dx[None, :]  # [1, L]
    # per-pixel projections for the selected labels: build a [h*w] lookup
    lab_dx = jnp.zeros((n_seg,), jnp.float32).at[top_lab].set(dx)
    lab_dy = jnp.zeros((n_seg,), jnp.float32).at[top_lab].set(dy)
    lab_cx = jnp.zeros((n_seg,), jnp.float32).at[top_lab].set(cx)
    lab_cy = jnp.zeros((n_seg,), jnp.float32).at[top_lab].set(cy)
    t = (xs - lab_cx[flat]) * lab_dx[flat] + (ys - lab_cy[flat]) * lab_dy[flat]
    t = jnp.where(flat < h * w, t, 0.0)
    tmin = jax.ops.segment_min(
        jnp.where(ones > 0, t, jnp.inf), flat, num_segments=n_seg)
    tmax = jax.ops.segment_max(
        jnp.where(ones > 0, t, -jnp.inf), flat, num_segments=n_seg)
    t0 = tmin[top_lab]
    t1 = tmax[top_lab]
    sp = jnp.stack([cx + t0 * dx, cy + t0 * dy], -1)
    epn = jnp.stack([cx + t1 * dx, cy + t1 * dy], -1)
    length = t1 - t0

    valid = (top_cnt >= min_length * 0.8) & (length >= min_length) & (
        l2 < straightness * l1 + 2.0
    )
    return KeyLines(
        sp=sp, ep=epn,
        angle=jnp.mod(theta + jnp.pi / 2, jnp.pi) - jnp.pi / 2,
        response=top_cnt, octave=jnp.zeros((max_lines,), jnp.int32),
        desc=jnp.zeros((max_lines, 8), jnp.uint32), mask=valid,
    )


# ---------------------------------------------------------------------------
# Binary LBD descriptors
# ---------------------------------------------------------------------------

def _lbd_pairs() -> np.ndarray:
    rs = np.random.RandomState(17)
    n_stats = N_BANDS * 4
    pairs = rs.randint(0, n_stats, size=(256, 2))
    fix = pairs[:, 0] == pairs[:, 1]
    pairs[fix, 1] = (pairs[fix, 1] + 1) % n_stats
    return pairs.astype(np.int32)


_LBD_PAIRS = _lbd_pairs()


def lbd_descriptors(img: jnp.ndarray, lines: KeyLines) -> jnp.ndarray:
    """Binary line-band descriptors [L, 8] uint32.

    Gradients are sampled on an (N_SAMPLES x BAND_WIDTH) grid aligned with
    each segment, rotated into the line frame, averaged per band, and
    binarized through a seeded comparison pattern (reference:
    line_descriptor's LBD computeLBD + binary conversion).
    """
    gx, gy = _sobel(img)
    h, w = img.shape
    L = lines.sp.shape[0]
    d = lines.ep - lines.sp
    length = jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-6
    dirv = d / length
    nrm = jnp.stack([-dirv[:, 1], dirv[:, 0]], -1)

    ts = jnp.linspace(0.05, 0.95, N_SAMPLES)
    os_ = jnp.arange(BAND_WIDTH, dtype=jnp.float32) - (BAND_WIDTH - 1) / 2
    # sample positions [L, S, B, 2]
    base = lines.sp[:, None, :] + ts[None, :, None] * d[:, None, :]
    pos = base[:, :, None, :] + os_[None, None, :, None] * nrm[:, None, None, :]
    xi = jnp.clip(jnp.round(pos[..., 0]).astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(jnp.round(pos[..., 1]).astype(jnp.int32), 0, h - 1)
    gxs = gx[yi, xi]
    gys = gy[yi, xi]
    # rotate gradients into the line frame
    g_par = gxs * dirv[:, None, None, 0] + gys * dirv[:, None, None, 1]
    g_prp = gxs * nrm[:, None, None, 0] + gys * nrm[:, None, None, 1]

    # band statistics: mean positive/negative parallel/perpendicular response
    # reshaped so each of the N_BANDS bands pools a slice of samples
    def band_stats(g):
        gb = g.reshape(L, N_SAMPLES, BAND_WIDTH)
        # bands along the line: split samples into N_BANDS groups
        pad = (-N_SAMPLES) % N_BANDS
        gb = jnp.pad(gb, ((0, 0), (0, pad), (0, 0)))
        gb = gb.reshape(L, N_BANDS, -1)
        return jnp.maximum(gb, 0).mean(-1), jnp.maximum(-gb, 0).mean(-1)

    pp, pn = band_stats(g_par)
    qp, qn = band_stats(g_prp)
    stats = jnp.concatenate([pp, pn, qp, qn], axis=-1)  # [L, 4*N_BANDS]

    pairs = jnp.asarray(_LBD_PAIRS)
    bits = (stats[:, pairs[:, 0]] > stats[:, pairs[:, 1]]).astype(jnp.uint32)
    words = bits.reshape(L, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def merge_collinear(kl: KeyLines, angle_tol: float = 0.06,
                    dist_tol: float = 4.0, gap_tol: float = 10.0) -> KeyLines:
    """Merge near-collinear overlapping segments (both edges of a thick bar,
    fragments of one physical line) — the reference's keyline merging
    (reference: LineExtractor's merge/filter of raw detector output).

    Batched: build the [L, L] collinearity adjacency, label components by
    iterative min-propagation, and recombine each group by min/max
    projection along the group's dominant direction.
    """
    L = kl.sp.shape[0]
    theta, d = line_theta_d(kl.sp, kl.ep)
    dth = jnp.abs(theta[:, None] - theta[None, :])
    dth = jnp.minimum(dth, jnp.pi - dth)
    dd = jnp.abs(d[:, None] - d[None, :])
    # extent overlap along segment i's direction
    dirv = kl.ep - kl.sp
    dirv = dirv / (jnp.linalg.norm(dirv, axis=-1, keepdims=True) + 1e-9)
    t_s = jnp.einsum("ld,md->lm", dirv, kl.sp)  # proj of all starts on dir_l
    t_e = jnp.einsum("ld,md->lm", dirv, kl.ep)
    lo = jnp.minimum(t_s, t_e)
    hi = jnp.maximum(t_s, t_e)
    my_lo = jnp.diagonal(lo)[:, None]
    my_hi = jnp.diagonal(hi)[:, None]
    overlap = (lo <= my_hi + gap_tol) & (hi >= my_lo - gap_tol)
    adj = (
        (dth < angle_tol) & (dd < dist_tol) & overlap
        & kl.mask[:, None] & kl.mask[None, :]
    )

    lab = jnp.where(kl.mask, jnp.arange(L, dtype=jnp.int32), L)

    def body(_, lab):
        nb = jnp.where(adj, lab[None, :], L)
        return jnp.minimum(lab, jnp.min(nb, axis=1))

    lab = jax.lax.fori_loop(0, 16, body, lab)

    # group leader = member with max response; take its direction
    resp = jnp.where(kl.mask, kl.response, -1.0)
    n_seg = L + 1
    best_resp = jax.ops.segment_max(resp, lab, num_segments=n_seg)
    is_leader = (resp >= best_resp[lab]) & kl.mask
    # resolve ties: lowest index leader
    idxs = jnp.where(is_leader, jnp.arange(L), L)
    leader = jax.ops.segment_min(idxs, lab, num_segments=n_seg)

    ld = dirv[jnp.clip(leader[lab], 0, L - 1)]
    proj_s = jnp.sum(ld * kl.sp, -1)
    proj_e = jnp.sum(ld * kl.ep, -1)
    pmin = jnp.minimum(proj_s, proj_e)
    pmax = jnp.maximum(proj_s, proj_e)
    gmin = jax.ops.segment_min(jnp.where(kl.mask, pmin, jnp.inf), lab, num_segments=n_seg)
    gmax = jax.ops.segment_max(jnp.where(kl.mask, pmax, -jnp.inf), lab, num_segments=n_seg)
    gresp = jax.ops.segment_sum(jnp.where(kl.mask, kl.response, 0.0), lab, num_segments=n_seg)

    keep = is_leader & (leader[lab] == jnp.arange(L))
    # anchor point: leader's midpoint projected coordinates
    mid = 0.5 * (kl.sp + kl.ep)
    off = mid - jnp.sum(ld * mid, -1, keepdims=True) * ld
    sp_new = off + gmin[lab][:, None] * ld
    ep_new = off + gmax[lab][:, None] * ld
    return kl._replace(
        sp=jnp.where(keep[:, None], sp_new, kl.sp),
        ep=jnp.where(keep[:, None], ep_new, kl.ep),
        response=jnp.where(keep, gresp[lab], kl.response),
        mask=keep,
    )


def extract_lines(img: jnp.ndarray, max_lines: int = 128, **kw) -> KeyLines:
    """Detection + merging + descriptors in one call."""
    kl = detect_lines(img, max_lines=max_lines, **kw)
    kl = merge_collinear(kl)
    desc = lbd_descriptors(img, kl)
    return kl._replace(desc=desc)


def line_theta_d(sp: jnp.ndarray, ep: jnp.ndarray):
    """(theta, d) representation of the infinite line through sp-ep
    (reference: Line2DRepresentation, include/Geom2DUtils.h:31).
    Normal angle theta in [-pi/2, pi/2), signed distance d."""
    dvec = ep - sp
    n = jnp.stack([-dvec[..., 1], dvec[..., 0]], -1)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    d = jnp.sum(n * sp, axis=-1)
    # canonicalize: theta in [-pi/2, pi/2), flip n (and d) accordingly
    theta = jnp.arctan2(n[..., 1], n[..., 0])
    flip = (theta >= jnp.pi / 2) | (theta < -jnp.pi / 2)
    theta = jnp.where(flip, jnp.arctan2(-n[..., 1], -n[..., 0]), theta)
    d = jnp.where(flip, -d, d)
    return theta, d


def line_nld(sp: jnp.ndarray, ep: jnp.ndarray) -> jnp.ndarray:
    """Normalized image line (nx, ny, d) with ||n|| = 1 through sp-ep — the
    measurement used by the line reprojection factors."""
    dvec = ep - sp
    n = jnp.stack([-dvec[..., 1], dvec[..., 0]], -1)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-9)
    dd = -jnp.sum(n * sp, axis=-1)
    return jnp.concatenate([n, dd[..., None]], axis=-1)
