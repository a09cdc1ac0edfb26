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
    """Detect up to ``max_lines`` segments in a [H, W] grayscale image.

    Connectivity (the label-propagation sweeps, the expensive part) runs at
    HALF resolution: each sweep is an O(pixels) pass and convergence needs
    ~(H+W)/2 sweeps, so halving the grid cuts the CC cost 8x (measured
    42 ms -> ~5 ms of device time per frame — this was the single largest
    kernel in the 30 Hz path). The sub-pixel quantities (gradient-weighted
    PCA centroids, directions, endpoints) are still accumulated over the
    FULL-resolution support pixels, so (theta, d) precision is unchanged;
    only the component topology is decided on 2x2 cells (which also
    bridges 1-px staircase gaps for free)."""
    h, w = img.shape
    gx, gy = _sobel(img)
    mag = jnp.sqrt(gx * gx + gy * gy)
    # line orientation = perpendicular to gradient, in [0, pi)
    ori = jnp.mod(jnp.arctan2(gy, gx) + jnp.pi / 2, jnp.pi)
    edge = mag > grad_thresh
    # NOTE: no NMS thinning — it fragments staircase edges of tilted lines;
    # the PCA fit handles the 2-3 px wide support band fine.

    # -- half-resolution connectivity grid ---------------------------------
    assert h % 2 == 0 and w % 2 == 0, "line detector expects even dims"
    h2, w2 = h // 2, w // 2
    if n_iters is None:
        # reach = n_iters CELLS = n_iters*2 full-res px along a component;
        # (h2+w2)/3 covers any realistic segment (a longer one keeps its
        # first stretch — still a valid, slightly shortened keyline) and
        # the sweep loop is the remaining cost of the detector
        n_iters = (h2 + w2) // 3
    # orientation pooling in DOUBLE-ANGLE space (orientations live mod pi:
    # the two anti-parallel gradient edges of a thick bar must reinforce,
    # not cancel, when a 2x2 cell straddles the bar)
    phi2 = 2.0 * jnp.arctan2(gy, gx)
    o2x = (mag * jnp.cos(phi2)).reshape(h2, 2, w2, 2).sum((1, 3))
    o2y = (mag * jnp.sin(phi2)).reshape(h2, 2, w2, 2).sum((1, 3))
    mag_h = mag.reshape(h2, 2, w2, 2).sum((1, 3))
    edge_h = edge.reshape(h2, 2, w2, 2).any((1, 3))
    ori_h = jnp.mod(0.5 * jnp.arctan2(o2y, o2x) + jnp.pi / 2, jnp.pi)
    # orientation COHERENCE (double-angle resultant / total magnitude):
    # ~1 on a clean edge (including staircase corners), low where two
    # lines CROSS — dropping incoherent cells cuts the connectivity chains
    # that would transitively weld crossing lines into one component (the
    # widened inter-cell angle gate below cannot distinguish these cases)
    coh = jnp.sqrt(o2x * o2x + o2y * o2y) / jnp.maximum(mag_h, 1e-6)
    edge_h = edge_h & (coh > 0.7)

    def conn(sy, sx):
        e2 = jnp.roll(edge_h, (sy, sx), (0, 1))
        o2 = jnp.roll(ori_h, (sy, sx), (0, 1))
        # 2x the full-res tolerance: a pooled cell straddling a staircase
        # corner reads up to ~25 deg off the line orientation, and at half
        # resolution there is no alternative same-orientation path around
        # that cell (straightness filtering prunes any false unions)
        return edge_h & e2 & (_angle_diff_mod_pi(ori_h, o2) < 2.0 * ori_tol)

    connect = jnp.stack([conn(1, 0), conn(-1, 0), conn(0, 1), conn(0, -1),
                         conn(1, 1), conn(-1, -1), conn(1, -1), conn(-1, 1)])
    connect = connect.at[0, 0, :].set(False).at[1, h2 - 1, :].set(False)
    connect = connect.at[2, :, 0].set(False).at[3, :, w2 - 1].set(False)
    connect = connect.at[4, 0, :].set(False).at[4, :, 0].set(False)
    connect = connect.at[5, h2 - 1, :].set(False).at[5, :, w2 - 1].set(False)
    connect = connect.at[6, 0, :].set(False).at[6, :, w2 - 1].set(False)
    connect = connect.at[7, h2 - 1, :].set(False).at[7, :, 0].set(False)

    n_cell = h2 * w2
    init = jnp.where(
        edge_h, jnp.arange(n_cell, dtype=jnp.int32).reshape(h2, w2),
        jnp.int32(n_cell))

    if jax.default_backend() == "tpu":
        # VMEM-resident Pallas fixpoint: the whole grid is ~360 KB, so every
        # sweep runs at VPU speed with zero HBM round trips (the XLA sweep
        # loop below is ~16 tiny HBM-bound kernels per sweep and costed
        # ~5-7 ms of the measured frame budget)
        from ..ops import cc_labels as cc_mod

        conn_bits = jnp.zeros((h2, w2), jnp.int32)
        for ci in range(8):
            conn_bits = conn_bits | (
                connect[ci].astype(jnp.int32) << jnp.int32(ci))
        labels_h = cc_mod.cc_min_labels(init, conn_bits)
    else:
        def body(_, lab):
            shifts = [(1, 0), (-1, 0), (0, 1), (0, -1), (1, 1), (-1, -1),
                      (1, -1), (-1, 1)]
            m = lab
            for ci, (sy, sx) in enumerate(shifts):
                nb = jnp.roll(lab, (sy, sx), (0, 1))
                m = jnp.minimum(m, jnp.where(connect[ci], nb, m))
            return m

        def _seg_min_scan(lab, link, axis):
            # segmented min prefix-scan: ``link`` marks cells connected to
            # their predecessor along ``axis``; the classic (head-flag,
            # value) operator is associative, so the min label floods a
            # whole connected run in one O(log n) scan
            def op(a, b):
                fa, va = a
                fb, vb = b
                return fa | fb, jnp.where(fb, vb, jnp.minimum(va, vb))
            return jax.lax.associative_scan(op, (~link, lab), axis=axis)[1]

        def scans(lab):
            lab = _seg_min_scan(lab, connect[2], 1)
            lab = jnp.flip(_seg_min_scan(
                jnp.flip(lab, 1), jnp.flip(connect[3], 1), 1), 1)
            lab = _seg_min_scan(lab, connect[0], 0)
            return jnp.flip(_seg_min_scan(
                jnp.flip(lab, 0), jnp.flip(connect[1], 0), 0), 0)

        # row/col segmented scans flood straight runs in O(log) time; the
        # 8-sweep chunks carry labels around corners and along diagonal
        # staircases, and the loop EXITS at the true fixpoint
        n_chunks = -(-n_iters // 8)

        def wcond(s):
            i, lab, go = s
            return go & (i < n_chunks)

        def wbody(s):
            i, lab, _ = s
            lab2 = lab
            for _ in range(8):
                lab2 = body(0, lab2)
            lab2 = scans(lab2)
            return i + 1, lab2, jnp.any(lab2 != lab)

        _, labels_h, _ = jax.lax.while_loop(
            wcond, wbody, (jnp.int32(0), scans(init), jnp.bool_(True)))
    lab_c = labels_h.reshape(-1)  # [n_cell] cell labels (invalid = n_cell)

    ys, xs = jnp.mgrid[0:h, 0:w]
    xs = xs.astype(jnp.float32)
    ys = ys.astype(jnp.float32)
    n_seg = n_cell + 1
    # gradient-magnitude-weighted moments: the support band is 2-3 px wide
    # (no NMS), so an unweighted centroid wobbles with the rasterization of
    # the edge; weighting by |∇I| concentrates the fit on the true edge and
    # stabilizes (theta, d) to sub-pixel across viewpoints — the line
    # residuals feed pose solves, so their noise floor matters as much as
    # the corner detector's.
    # Every pixel of a 2x2 cell shares the cell's label, so the moments
    # pool to CELL level with cheap reshape-sums (exact), and ONE stacked
    # segment_sum over the 4x-smaller cell grid replaces seven full-image
    # scatters (TPU scatters serialize: they were most of the measured
    # 42 ms line-extraction device time).
    ones = edge.astype(jnp.float32)
    wgt = ones * mag

    def pool_sum(a):
        return a.reshape(h2, 2, w2, 2).sum((1, 3)).reshape(-1)

    # ONE scalar segment_sum picks the top components by support count;
    # the expensive 7-payload moment reduction then runs ONLY for those
    # max_lines winners as a [max_lines, n_cell] masked matmul on the MXU
    # (a full segment_sum/min/max suite over 76k segments is scatter-bound
    # on TPU and was most of the measured line-detection device time)
    cnt_all = jax.ops.segment_sum(pool_sum(ones), lab_c,
                                  num_segments=n_seg)
    top_cnt, top_lab = jax.lax.top_k(cnt_all[:n_cell], max_lines)

    eq = (lab_c[None, :] == top_lab[:, None])          # [K, n_cell]
    payload = jnp.stack(
        [pool_sum(wgt), pool_sum(xs * wgt),
         pool_sum(ys * wgt), pool_sum(xs * xs * wgt),
         pool_sum(ys * ys * wgt), pool_sum(xs * ys * wgt)], -1)
    sums = jnp.dot(eq.astype(jnp.float32), payload,
                   preferred_element_type=jnp.float32)  # [K, 6]
    wsum, sx_, sy_, sxx, syy, sxy = (sums[:, i] for i in range(6))
    c = jnp.maximum(wsum, 1e-6)
    cx = sx_ / c
    cy = sy_ / c
    vxx = sxx / c - cx * cx
    vyy = syy / c - cy * cy
    vxy = sxy / c - cx * cy
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

    # endpoints: min/max projection of support pixels on the direction.
    # Per-winner (dir, centroid) broadcast through the eq mask (no gather
    # table, no segment min/max): full-res projections pooled to cell
    # min/max once, then [K, n_cell] masked reductions — bandwidth-bound
    # instead of scatter-bound.
    eqT = eq.T.astype(jnp.float32)                     # [n_cell, K]
    cellv = (eqT @ jnp.stack([dx, dy, cx, cy], -1)).reshape(h2, w2, 4)
    pv = jnp.repeat(jnp.repeat(cellv, 2, axis=0), 2, axis=1)
    t = (xs - pv[..., 2]) * pv[..., 0] + (ys - pv[..., 3]) * pv[..., 1]

    def pool_ext(a, red, fill):
        a = jnp.where(edge, a, fill)
        return red(a.reshape(h2, 2, w2, 2), axis=(1, 3)).reshape(-1)

    t_lo = pool_ext(t, jnp.min, jnp.inf)
    t_hi = pool_ext(t, jnp.max, -jnp.inf)
    t0 = jnp.min(jnp.where(eq, t_lo[None, :], jnp.inf), axis=1)
    t1 = jnp.max(jnp.where(eq, t_hi[None, :], -jnp.inf), axis=1)
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
    # a short fragment's PCA angle is noisy (~1/length): widen the angle
    # gate for short pairs so chunks of one physical line still merge
    seg_len = jnp.linalg.norm(kl.ep - kl.sp, axis=-1)
    tol_pair = angle_tol + 1.5 / jnp.maximum(
        jnp.minimum(seg_len[:, None], seg_len[None, :]), 1.0)
    dirv = kl.ep - kl.sp
    dirv = dirv / (jnp.linalg.norm(dirv, axis=-1, keepdims=True) + 1e-9)
    # lateral gate: PERPENDICULAR distance of j's endpoints from i's
    # infinite line (the (theta, d) parameter distance is ill-conditioned —
    # a short segment's tiny angle noise moves its origin-distance d by
    # angle_err * |segment position|, tens of pixels far from the origin)
    n_i = jnp.stack([-dirv[:, 1], dirv[:, 0]], -1)
    mid = 0.5 * (kl.sp + kl.ep)
    off_i = jnp.sum(n_i * mid, -1)[:, None]
    db_s = jnp.abs(jnp.einsum("ld,md->lm", n_i, kl.sp) - off_i)
    db_e = jnp.abs(jnp.einsum("ld,md->lm", n_i, kl.ep) - off_i)
    dist_lm = jnp.maximum(db_s, db_e)
    dist_ok = jnp.minimum(dist_lm, dist_lm.T) < dist_tol
    # extent overlap along segment i's direction
    t_s = jnp.einsum("ld,md->lm", dirv, kl.sp)  # proj of all starts on dir_l
    t_e = jnp.einsum("ld,md->lm", dirv, kl.ep)
    lo = jnp.minimum(t_s, t_e)
    hi = jnp.maximum(t_s, t_e)
    my_lo = jnp.diagonal(lo)[:, None]
    my_hi = jnp.diagonal(hi)[:, None]
    overlap = (lo <= my_hi + gap_tol) & (hi >= my_lo - gap_tol)
    adj = (
        (dth < tol_pair) & dist_ok & overlap
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
