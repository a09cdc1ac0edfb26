"""Batched ORB: IC-angle orientation + rotated-BRIEF binary descriptors.

TPU-native replacement for the reference's ORB pipeline (reference:
src/ORBextractor.cc computeOrientation/IC_Angle at :110-141 and
computeDescriptors; CUDA variants src/cuda/Orb_gpu.cu IC_Angle /
calcOrb_kernel). All keypoints of a pyramid level are processed as one
batch: patches are gathered once, orientation is two masked moment
reductions, and the 256 descriptor bits are bilinear samples of the rotated
pattern packed into 8 uint32 words.

The sampling pattern is a fixed seeded Gaussian BRIEF pattern (the classic
ORB construction) — self-consistent across the framework (matcher,
vocabulary) rather than binary-compatible with OpenCV.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import fast as fast_mod
from . import pyramid as pyr_mod

PATCH = 41          # gathered patch size (odd); supports rotated radius-13 pattern
HALF = PATCH // 2
ANGLE_RADIUS = 15   # IC-angle circular window radius
N_BITS = 256


def _make_pattern() -> np.ndarray:
    """[256, 2, 2] (pair, endpoint, (dx, dy)) seeded Gaussian BRIEF pattern."""
    rs = np.random.RandomState(8)
    pts = rs.normal(0.0, 31 / 5.0, size=(N_BITS, 2, 2))
    return np.clip(pts, -13, 13).astype(np.float32)


PATTERN = _make_pattern()


def _angle_weights():
    """Circular mask and coordinate grids for IC-angle moments.

    Built eagerly as NUMPY constants at import time — lazily caching jnp
    arrays would capture tracers when first touched inside a jit trace.
    """
    ys, xs = np.mgrid[-HALF : HALF + 1, -HALF : HALF + 1]
    mask = (xs ** 2 + ys ** 2) <= ANGLE_RADIUS ** 2
    return (
        mask.astype(np.float32),
        xs.astype(np.float32),
        ys.astype(np.float32),
    )


_MASK, _XS, _YS = _angle_weights()


def _get_angle_weights():
    return jnp.asarray(_MASK), jnp.asarray(_XS), jnp.asarray(_YS)


def extract_patches(img: jnp.ndarray, xy: jnp.ndarray, patch: int = PATCH) -> jnp.ndarray:
    """Gather [N, patch, patch] windows centered at integer coords xy (x, y).

    Out-of-range keypoints read from the edge-padded image (they are masked
    out upstream anyway).
    """
    half = patch // 2
    padded = jnp.pad(img, half, mode="edge")
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32), 0, img.shape[1] - 1)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32), 0, img.shape[0] - 1)

    def one(x, y):
        return jax.lax.dynamic_slice(padded, (y, x), (patch, patch))

    return jax.vmap(one)(x0, y0)


def extract_patches_stack(stack: jnp.ndarray, lvl: jnp.ndarray,
                          xy: jnp.ndarray, patch: int = PATCH) -> jnp.ndarray:
    """Gather [N, patch, patch] windows from an [L, H, W] level stack.

    One batched gather program for keypoints of EVERY pyramid level (the
    per-level variant launches one gather per level). ``lvl`` selects the
    source level per keypoint."""
    half = patch // 2
    padded = jnp.pad(stack, ((0, 0), (half, half), (half, half)), mode="edge")
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32), 0, stack.shape[2] - 1)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32), 0, stack.shape[1] - 1)

    def one(l, x, y):
        return jax.lax.dynamic_slice(padded, (l, y, x), (1, patch, patch))[0]

    return jax.vmap(one)(lvl, x0, y0)


def ic_angle(patches: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per patch: atan2(m01, m10)."""
    mask, xs, ys = _get_angle_weights()
    m10 = jnp.sum(patches * xs * mask, axis=(-2, -1))
    m01 = jnp.sum(patches * ys * mask, axis=(-2, -1))
    return jnp.arctan2(m01, m10)


N_ANGLE_BINS = 30  # the ORB construction discretizes steering to 2*pi/30


def _make_sampling_matrix() -> np.ndarray:
    """[PATCH*PATCH, N_ANGLE_BINS * 2*N_BITS] bilinear sampling matrix.

    Column (b, k) holds the 4 bilinear weights that sample the k-th rotated
    pattern endpoint at angle bin b. Turning pattern sampling into ONE
    patches @ S matmul keeps the descriptor stage on the MXU — element
    gathers (take_along_axis) are the slow path on TPU. Angle quantization
    to 30 steps is the original ORB design (and what the reference's
    OpenCV-derived extractor effectively computes).
    """
    n_cols = N_ANGLE_BINS * 2 * N_BITS
    S = np.zeros((PATCH * PATCH, n_cols), np.float32)
    pat = PATTERN.reshape(-1, 2)  # [512, 2] (dx, dy)
    for b in range(N_ANGLE_BINS):
        a = 2.0 * np.pi * b / N_ANGLE_BINS
        ca, sa = np.cos(a), np.sin(a)
        rx = np.clip(ca * pat[:, 0] - sa * pat[:, 1] + HALF, 0.0, PATCH - 1.001)
        ry = np.clip(sa * pat[:, 0] + ca * pat[:, 1] + HALF, 0.0, PATCH - 1.001)
        x0 = np.floor(rx).astype(np.int64)
        y0 = np.floor(ry).astype(np.int64)
        fx = (rx - x0).astype(np.float32)
        fy = (ry - y0).astype(np.float32)
        col = b * 2 * N_BITS + np.arange(2 * N_BITS)
        S[y0 * PATCH + x0, col] += (1 - fx) * (1 - fy)
        S[y0 * PATCH + x0 + 1, col] += fx * (1 - fy)
        S[(y0 + 1) * PATCH + x0, col] += (1 - fx) * fy
        S[(y0 + 1) * PATCH + x0 + 1, col] += fx * fy
    return S


_SAMPLING_S = _make_sampling_matrix()
# rows (patch pixels) never touched by ANY steering bin are all-zero —
# the rotated pattern lives in a radius-~19 disc of the 41x41 patch, so
# pruning them cuts the descriptor matmul's K dimension ~30%
_S_ROWS = np.nonzero(_SAMPLING_S.any(axis=1))[0].astype(np.int32)
_SAMPLING_S_PRUNED = np.ascontiguousarray(_SAMPLING_S[_S_ROWS])


def descriptors(patches_blurred: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """[N, P, P] blurred patches + [N] angles -> [N, 8] uint32 descriptors.

    MXU formulation: all 30 steering bins are sampled with one
    [N, P^2] @ [P^2, 30*512] matmul (bf16 weights), the per-keypoint bin is
    selected with a one-hot reduction, and only the selected 256 bits are
    packed. (reference: computeDescriptors / calcOrb_kernel, which walk the
    rotated pattern pointer-wise per keypoint.)
    """
    n = patches_blurred.shape[0]
    flat = patches_blurred.reshape(n, -1)[:, jnp.asarray(_S_ROWS)]
    # bf16 keeps the matmul on the MXU; XLA:CPU's DotThunk rejects raw
    # bf16 dots in this (post-gather) layout, so the CPU oracle stays f32
    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    S = jnp.asarray(_SAMPLING_S_PRUNED, dt)
    v = jnp.dot(flat.astype(dt), S,
                preferred_element_type=jnp.float32)  # [N, 30*512]
    v = v.reshape(n, N_ANGLE_BINS, N_BITS, 2)
    bits_all = v[..., 0] < v[..., 1]                  # [N, 30, 256]
    step = 2.0 * jnp.pi / N_ANGLE_BINS
    bin_idx = jnp.mod(jnp.round(angles / step), N_ANGLE_BINS).astype(jnp.int32)
    onehot = jax.nn.one_hot(bin_idx, N_ANGLE_BINS, dtype=jnp.float32)
    bits = jnp.einsum("nb,nbk->nk", onehot,
                      bits_all.astype(jnp.float32)) > 0.5  # [N, 256]
    words = bits.astype(jnp.uint32).reshape(n, 8, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(words << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one frame (SoA, padded + masked)."""

    xy: jnp.ndarray       # [N, 2] pixel coords at level-0 scale (x, y)
    response: jnp.ndarray  # [N]
    angle: jnp.ndarray    # [N] radians
    octave: jnp.ndarray   # [N] int32 pyramid level
    desc: jnp.ndarray     # [N, 8] uint32
    mask: jnp.ndarray     # [N] bool


def features_per_level(num_features: int, n_levels: int, scale: float):
    """Geometric allocation of feature budget over levels (reference:
    ORBextractor ctor mnFeaturesPerLevel computation)."""
    inv = 1.0 / scale
    first = num_features * (1 - inv) / (1 - inv ** n_levels)
    per = [int(round(first * inv ** l)) for l in range(n_levels)]
    per[-1] = max(0, num_features - sum(per[:-1]))
    return per


def extract(
    img: jnp.ndarray,
    num_features: int = 1024,
    n_levels: int = 8,
    scale: float = 1.2,
    threshold_hi: float = 20.0,
    threshold_lo: float = 7.0,
    cell: int = 16,
) -> Keypoints:
    """Full multi-scale ORB extraction on a [H, W] float32 grayscale image.

    One jittable program: pyramid -> dense FAST -> per-cell selection ->
    orientation -> descriptors, all levels batched. When every level shares
    the same uniformity cell (the common case), the whole pipeline runs on
    an edge-padded [L, H, W] level stack: one kernel per stage for ALL
    levels instead of n_levels sequential small programs (~2x faster frame
    build on TPU). Mixed per-level cells fall back to the per-level path.
    """
    per = features_per_level(num_features, n_levels, scale)
    shapes = pyr_mod.level_shapes(img.shape[0], img.shape[1], n_levels, scale)
    cells = [
        max(8, min(cell, int(np.sqrt(h_l * w_l / max(n_l, 1)))))
        for (h_l, w_l), n_l in zip(shapes, per)
    ]
    active = [l for l in range(n_levels) if per[l] > 0]
    if active and len({cells[l] for l in active}) == 1:
        return _extract_batched(img, per, shapes, n_levels, scale,
                                threshold_hi, threshold_lo,
                                cells[active[0]])

    levels = pyr_mod.build_pyramid(img, n_levels, scale)

    xs, rs, angs, octs, descs, masks = [], [], [], [], [], []
    for l, (img_l, n_l) in enumerate(zip(levels, per)):
        if n_l <= 0:
            continue
        # adapt the uniformity cell so the grid can actually supply the
        # requested budget on small images/levels (the reference's quadtree
        # splits until it has enough nodes; cell-max is our batched analogue)
        h_l, w_l = img_l.shape
        cell_l = max(8, min(cell, int(np.sqrt(h_l * w_l / max(n_l, 1)))))
        xy, score, valid = fast_mod.detect(
            img_l, n_l, threshold_hi, threshold_lo, border=HALF + 1, cell=cell_l
        )
        patches = extract_patches(img_l, xy)
        ang = ic_angle(patches)
        blurred = pyr_mod.gaussian_blur(img_l, sigma=2.0, radius=3)
        bpatches = extract_patches(blurred, xy)
        d = descriptors(bpatches, ang)
        s = scale ** l
        xs.append(xy * s)
        rs.append(score)
        angs.append(ang)
        octs.append(jnp.full((xy.shape[0],), l, jnp.int32))
        descs.append(d)
        masks.append(valid)

    return Keypoints(
        xy=jnp.concatenate(xs),
        response=jnp.concatenate(rs),
        angle=jnp.concatenate(angs),
        octave=jnp.concatenate(octs),
        desc=jnp.concatenate(descs),
        mask=jnp.concatenate(masks),
    )


def _extract_batched(img, per, shapes, n_levels, scale,
                     threshold_hi, threshold_lo, cell):
    """Level-stacked extraction (see :func:`extract`)."""
    stack = pyr_mod.build_pyramid_stack(img, n_levels, scale)
    xyL, scoreL, validL = fast_mod.detect_batched(
        stack, shapes, [max(n, 1) for n in per],
        threshold_hi, threshold_lo, border=HALF + 1, cell=cell,
    )
    xy_l, sc_l, va_l, lv_l, s_l = [], [], [], [], []
    for l in range(n_levels):
        n_l = per[l]
        if n_l <= 0:
            continue
        xy_l.append(xyL[l, :n_l])
        sc_l.append(scoreL[l, :n_l])
        va_l.append(validL[l, :n_l])
        lv_l.append(np.full((n_l,), l, np.int32))
        s_l.append(np.full((n_l,), scale ** l, np.float32))
    xy = jnp.concatenate(xy_l)
    lvl = jnp.asarray(np.concatenate(lv_l))
    blurred = pyr_mod.gaussian_blur_batched(stack)
    bpatches = extract_patches_stack(blurred, lvl, xy)
    # IC angle from the blurred patch: the [N, 41, 41] gather dominates the
    # whole extraction pipeline on TPU, so one gather feeds both the
    # orientation moments and the descriptor sampling. The Gaussian blur
    # commutes with the centroid direction up to noise suppression, and the
    # descriptor steering quantizes to 12-degree bins anyway.
    ang = ic_angle(bpatches)
    d = descriptors(bpatches, ang)
    s = jnp.asarray(np.concatenate(s_l))
    return Keypoints(
        xy=xy * s[:, None],
        response=jnp.concatenate(sc_l),
        angle=ang,
        octave=lvl,
        desc=d,
        mask=jnp.concatenate(va_l),
    )


def scale_sigma2(octave: jnp.ndarray, scale: float = 1.2) -> jnp.ndarray:
    """Per-keypoint sigma^2 = scale^(2*octave) (reference: mvLevelSigma2)."""
    return scale ** (2.0 * octave.astype(jnp.float32))


def inv_scale_sigma2(octave: jnp.ndarray, scale: float = 1.2) -> jnp.ndarray:
    return scale ** (-2.0 * octave.astype(jnp.float32))
