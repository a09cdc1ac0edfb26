"""Dense FAST-16 corner scoring + NMS + grid-uniform selection.

TPU-native replacement for the reference's per-cell OpenCV FAST + quadtree
redistribution (reference: src/ORBextractor.cc DistributeOctTree at :611 and
the CUDA variant src/cuda/Fast_gpu.cu GpuFast::detectAsync). Instead of
sequential cell loops + a pointer quadtree, the segment test is evaluated for
EVERY pixel at once (16 rolled image copies on the VPU), NMS is a max-pool
compare, and spatial uniformity comes from per-cell argmax + global top-k —
fully batched, no data-dependent shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# FAST-16 Bresenham circle offsets (dy, dx), radius 3, clockwise from top.
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

ARC_LEN = 9  # FAST-9/16 segment test


def _arc16(bits: jnp.ndarray) -> jnp.ndarray:
    """True where the 16-bit circle mask has >= ARC_LEN consecutive set bits
    (cyclic). The mask is duplicated into the high half so the wrap-around
    run test is a plain shift-AND chain on one uint32 per pixel — 16x less
    traffic than materializing [16, ...] boolean stacks."""
    mm = bits | (bits << 16)
    r = mm
    for i in range(1, ARC_LEN):
        r = r & (mm >> i)
    return (r & jnp.uint32(0xFFFF)) != 0


def fast_score2(img: jnp.ndarray, t_lo: float, t_hi: float):
    """Per-pixel FAST-9/16 scores at BOTH thresholds in one pass over the
    circle (the 16 rolled-image diffs are the bandwidth cost; computing the
    two thresholds separately paid it twice).

    Returns (s_lo, s_hi): s_lo is the lo-threshold corner score (0 where no
    corner), s_hi is s_lo gated to pixels that also pass the hi-threshold
    segment test (the reference's iniThFAST/minThFAST scheme). Works on
    [..., H, W] (rolls are over the last two axes), so the whole pyramid
    stack goes through one pass.
    """
    zero_b = jnp.zeros(img.shape, jnp.uint32)
    acc_b = jnp.zeros(img.shape, img.dtype)
    acc_d = jnp.zeros(img.shape, img.dtype)
    bits_b_lo = zero_b
    bits_d_lo = zero_b
    bits_b_hi = zero_b
    bits_d_hi = zero_b
    for i, (dy, dx) in enumerate(CIRCLE):
        d = jnp.roll(img, (-int(dy), -int(dx)), axis=(-2, -1)) - img
        acc_b = acc_b + jnp.maximum(d - t_lo, 0.0)
        acc_d = acc_d + jnp.maximum(-d - t_lo, 0.0)
        sh = jnp.uint32(i)
        bits_b_lo = bits_b_lo | ((d > t_lo).astype(jnp.uint32) << sh)
        bits_d_lo = bits_d_lo | ((d < -t_lo).astype(jnp.uint32) << sh)
        bits_b_hi = bits_b_hi | ((d > t_hi).astype(jnp.uint32) << sh)
        bits_d_hi = bits_d_hi | ((d < -t_hi).astype(jnp.uint32) << sh)
    score = jnp.maximum(acc_b, acc_d)
    corner_lo = _arc16(bits_b_lo) | _arc16(bits_d_lo)
    corner_hi = _arc16(bits_b_hi) | _arc16(bits_d_hi)
    s_lo = jnp.where(corner_lo, score, 0.0)
    return s_lo, jnp.where(corner_hi, s_lo, 0.0)


def fast_score(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Per-pixel FAST-9/16 corner score (0 where not a corner).

    Score is the sum of |I_i - I_p| - t over the thresholded circle pixels —
    the same corner measure OpenCV uses for FAST NMS.
    """
    return fast_score2(img, threshold, threshold)[0]


def nms3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-max suppression (keep strict local maxima)."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return jnp.where(score >= m, score, 0.0)


def _cell_max_mask(score: jnp.ndarray, cell: int) -> jnp.ndarray:
    """Keep only the per-cell maximum (non-overlapping cell grid)."""
    m = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (cell, cell), (cell, cell), "SAME"
    )
    up = jnp.repeat(jnp.repeat(m, cell, axis=0), cell, axis=1)[: score.shape[0], : score.shape[1]]
    return jnp.where((score >= up) & (score > 0), score, 0.0)


def detect(
    img: jnp.ndarray,
    num_features: int,
    threshold_hi: float = 20.0,
    threshold_lo: float = 7.0,
    border: int = 16,
    cell: int = 16,
):
    """Detect up to ``num_features`` uniformly distributed corners.

    Two-threshold scheme mirrors the reference's iniThFAST/minThFAST
    fallback (reference: ORBextractor ctor params, src/Tracking.cc ORB
    settings): high-threshold corners win their cell; cells with none fall
    back to low-threshold corners (rank-penalized so they never displace
    hi-threshold corners globally).

    Returns (xy [N,2] float32 (x, y), score [N], valid [N]).
    """
    h, w = img.shape
    s_lo, s_hi = fast_score2(img, threshold_lo, threshold_hi)

    # border mask (circle offsets need 3 px; descriptors need more)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inb = (ys >= border) & (ys < h - border) & (xs >= border) & (xs < w - border)

    s_hi = jnp.where(inb, nms3(s_hi), 0.0)
    s_lo = jnp.where(inb, nms3(s_lo), 0.0)

    # rank: hi-threshold winners strictly above lo-threshold ones
    BIG = 1e6
    sel = jnp.where(s_hi > 0, s_hi + BIG, s_lo)

    # per-cell winner score AND its pixel index via two cheap window
    # reductions, then top-k over the ~(H/cell)*(W/cell) cell array only —
    # a global top_k over H*W pixels is the slow path on TPU
    pad_h = (-h) % cell
    pad_w = (-w) % cell
    selp = jnp.pad(sel, ((0, pad_h), (0, pad_w)))
    hc, wc = selp.shape[0] // cell, selp.shape[1] // cell
    cells = selp.reshape(hc, cell, wc, cell).transpose(0, 2, 1, 3)
    cells = cells.reshape(hc * wc, cell * cell)
    cell_best = jnp.max(cells, axis=1)                 # [C]
    cell_arg = jnp.argmax(cells, axis=1)               # [C] offset in cell
    k = min(num_features, cell_best.shape[0])
    top, cidx = jax.lax.top_k(cell_best, k)
    off = cell_arg[cidx]
    cy = cidx // wc
    cx = cidx % wc
    yy = (cy * cell + off // cell).astype(jnp.float32)
    xx = (cx * cell + off % cell).astype(jnp.float32)
    xy = jnp.stack([xx, yy], axis=-1)
    valid = top > 0
    score = jnp.where(top > BIG / 2, top - BIG, top)
    if k < num_features:  # pad to capacity
        pad = num_features - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), xy.dtype)])
        score = jnp.concatenate([score, jnp.zeros((pad,), score.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return xy, score, valid


def detect_batched(
    stack: jnp.ndarray,
    shapes,
    num_features,
    threshold_hi: float = 20.0,
    threshold_lo: float = 7.0,
    border: int = 16,
    cell: int = 16,
):
    """All pyramid levels at once on an edge-padded [L, H, W] stack.

    Same algorithm as :func:`detect` but every stage (segment test, NMS,
    cell reduction, top-k) runs as ONE batched kernel over the level axis —
    per-level sequential programs underutilize the VPU and multiply launch
    overhead. ``shapes`` holds the true (h_l, w_l) per level (static), used
    to mask the pad region out exactly; ``num_features`` is the per-level
    budget list. Returns (xy [L, K, 2], score [L, K], valid [L, K]) with
    K = max(num_features); rows l beyond num_features[l] are invalid.
    """
    L, H, W = stack.shape
    s_lo, s_hi = fast_score2(stack, threshold_lo, threshold_hi)

    # per-level border mask over the padded canvas (host constant)
    inb = np.zeros((L, H, W), bool)
    for l, (h_l, w_l) in enumerate(shapes):
        inb[l, border:h_l - border, border:w_l - border] = True
    inb = jnp.asarray(inb)

    s_hi = jnp.where(inb, jax.vmap(nms3)(s_hi), 0.0)
    s_lo = jnp.where(inb, jax.vmap(nms3)(s_lo), 0.0)

    BIG = 1e6
    sel = jnp.where(s_hi > 0, s_hi + BIG, s_lo)

    pad_h = (-H) % cell
    pad_w = (-W) % cell
    selp = jnp.pad(sel, ((0, 0), (0, pad_h), (0, pad_w)))
    hc, wc = selp.shape[1] // cell, selp.shape[2] // cell
    cells = selp.reshape(L, hc, cell, wc, cell).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(L, hc * wc, cell * cell)
    cell_best = jnp.max(cells, axis=-1)                # [L, C]
    cell_arg = jnp.argmax(cells, axis=-1)              # [L, C]
    kmax = max(int(n) for n in num_features)
    k = min(kmax, cell_best.shape[1])
    top, cidx = jax.lax.top_k(cell_best, k)            # batched over L
    off = jnp.take_along_axis(cell_arg, cidx, axis=1)
    cy = cidx // wc
    cx = cidx % wc
    yy = (cy * cell + off // cell).astype(jnp.float32)
    xx = (cx * cell + off % cell).astype(jnp.float32)
    xy = jnp.stack([xx, yy], axis=-1)                  # [L, k, 2]
    valid = top > 0
    score = jnp.where(top > BIG / 2, top - BIG, top)
    if k < kmax:  # pad the per-level capacity
        pad = kmax - k
        xy = jnp.concatenate([xy, jnp.zeros((L, pad, 2), xy.dtype)], axis=1)
        score = jnp.concatenate([score, jnp.zeros((L, pad), score.dtype)],
                                axis=1)
        valid = jnp.concatenate([valid, jnp.zeros((L, pad), bool)], axis=1)
    return xy, score, valid
