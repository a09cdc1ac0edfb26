"""Dense rectified-stereo disparity: one batched cost-volume kernel.

TPU-native replacement for the reference's four stereo engines
(reference: libelas Thirdparty/libelas-gpu, SGM Thirdparty/libsgm CUDA,
OpenCV SGBM/WLS in src/StereoDisparity.cc, OpenCV CUDA BM/BP/CSBP) —
SURVEY.md §2.2 calls for one disparity kernel family replacing all four.
Census-transform matching cost over a [D, H, W] volume built from D shifted
image copies, box-filtered aggregation, winner-take-all with parabolic
subpixel refinement, left-right consistency, and a 3x3 median — every stage
a dense batched op. (Full SGM path aggregation is a lax.scan refinement on
the same volume.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def census_transform(img: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Census bit-string per pixel (packed into int32 words).

    window=2 -> 5x5 neighborhood -> 24 bits.
    """
    h, w = img.shape
    bits = []
    for dy in range(-window, window + 1):
        for dx in range(-window, window + 1):
            if dy == 0 and dx == 0:
                continue
            shifted = jnp.roll(img, (-dy, -dx), axis=(0, 1))
            bits.append(shifted < img)
    out = jnp.zeros((h, w), jnp.uint32)
    for i, b in enumerate(bits[:32]):
        out = out | (b.astype(jnp.uint32) << i)
    return out


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Box filter along the last two axes (same padding)."""
    k = 2 * r + 1
    x = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1,) * (x.ndim - 2) + (k, k),
        (1,) * x.ndim, "SAME",
    )
    return x / (k * k)


def _sgm_scan_lr(vol_xhd: jnp.ndarray, p1: float, p2: float) -> jnp.ndarray:
    """Directional SGM aggregation along the leading (scan) axis.

    ``vol_xhd`` is [S, B, D] — scan position, batch (the perpendicular image
    axis), disparity. Returns the aggregated path cost with the same shape.
    The recurrence is the classic semi-global matching update
    (reference: Thirdparty/libsgm path aggregation kernels,
    src/{vertical,horizontal}_path_aggregation.cu):

        L(x, d) = C(x, d) + min(L(x-1, d),
                                L(x-1, d-1) + P1, L(x-1, d+1) + P1,
                                min_d' L(x-1, d') + P2) - min_d' L(x-1, d')
    """
    big = jnp.asarray(1e9, vol_xhd.dtype)

    def step(L_prev, c):
        lmin = jnp.min(L_prev, axis=-1, keepdims=True)
        up = jnp.concatenate([L_prev[..., 1:], jnp.full_like(L_prev[..., :1], big)], -1)
        dn = jnp.concatenate([jnp.full_like(L_prev[..., :1], big), L_prev[..., :-1]], -1)
        m = jnp.minimum(jnp.minimum(L_prev, jnp.minimum(up, dn) + p1), lmin + p2)
        L = c + m - lmin
        return L, L

    L0 = vol_xhd[0]
    _, rest = jax.lax.scan(step, L0, vol_xhd[1:])
    return jnp.concatenate([L0[None], rest], axis=0)


def sgm_aggregate(vol: jnp.ndarray, p1: float = 7.0, p2: float = 100.0) -> jnp.ndarray:
    """4-path semi-global aggregation of a [D, H, W] cost volume.

    TPU-native re-derivation of libsgm's path aggregation (reference:
    Thirdparty/libsgm/src/*_path_aggregation.cu + sgm.cu): each direction is
    one lax.scan along the image axis, vectorized over the perpendicular
    axis and all disparities (the inner update is pure VPU work). The summed
    4-path volume feeds the same WTA/uniqueness/LR tail as the box filter.
    """
    v = jnp.transpose(vol, (2, 1, 0))  # [W, H, D]
    horiz = _sgm_scan_lr(v, p1, p2) + _sgm_scan_lr(v[::-1], p1, p2)[::-1]
    vt = jnp.transpose(vol, (1, 2, 0))  # [H, W, D]
    vert = _sgm_scan_lr(vt, p1, p2) + _sgm_scan_lr(vt[::-1], p1, p2)[::-1]
    agg = jnp.transpose(horiz, (2, 1, 0)) + jnp.transpose(vert, (2, 0, 1))
    return agg / 4.0


def _median3(disp: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter applied to valid pixels only."""
    neigh = [
        jnp.roll(disp, (dy, dx), axis=(0, 1))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ]
    med = jnp.median(jnp.stack(neigh), axis=0)
    return jnp.where(disp > 0, med, disp)


@functools.partial(
    jax.jit,
    static_argnames=("max_disp", "census_window", "agg_radius",
                     "lr_thresh", "uniqueness", "method", "p1", "p2"),
)
def disparity(
    left: jnp.ndarray,
    right: jnp.ndarray,
    max_disp: int = 64,
    census_window: int = 2,
    agg_radius: int = 3,
    lr_thresh: float = 1.5,
    uniqueness: float = 0.95,
    method: str = "box",
    p1: float = 7.0,
    p2: float = 100.0,
):
    """Rectified pair -> float disparity map (<= 0 invalid).

    ``method`` selects the aggregation family covering the reference's
    engines: "box" (local block matching — the OpenCV BM / ELAS support-
    point regime) or "sgm" (4-path semi-global aggregation — the
    libsgm/SGBM regime; reference: Thirdparty/libsgm, src/StereoDisparity.cc
    StereoDisparityCPU SGBM path).

    On TPU the box path runs the fused Pallas WTA kernel
    (plvs_tpu.ops.stereo) so the cost volume never touches HBM; the SGM path
    and the CPU oracle use the jnp volume below."""
    h, w = left.shape
    cl = census_transform(left, census_window)
    cr = census_transform(right, census_window)

    from plvs_tpu.ops import use_pallas
    if method == "box" and use_pallas():
        from plvs_tpu.ops import stereo as _stereo_ops
        disp = _stereo_ops.disparity_wta_pallas(
            cl, cr, max_disp=max_disp, agg_radius=agg_radius,
            uniqueness=uniqueness, lr_thresh=lr_thresh,
        )
        return _median3(disp)

    def ham(a, b):
        return jax.lax.population_count(jnp.bitwise_xor(a, b)).astype(jnp.float32)

    # cost volume: left pixel (y,x) vs right pixel (y,x-d)
    vol = []
    for d in range(max_disp):
        cr_d = jnp.roll(cr, d, axis=1)
        c = ham(cl, cr_d)
        # invalidate the wrapped region
        c = c.at[:, :d].set(1e3)
        vol.append(c)
    vol = jnp.stack(vol)  # [D, H, W]
    if method == "sgm":
        vol = sgm_aggregate(_box_filter(vol, 1), p1=p1, p2=p2)
    else:
        vol = _box_filter(vol, agg_radius)

    best = jnp.argmin(vol, axis=0)
    cbest = jnp.min(vol, axis=0)
    # uniqueness: second-best (excluding +-1 neighbors) must be clearly worse
    D = max_disp
    didx = jnp.arange(D)[:, None, None]
    masked = jnp.where(jnp.abs(didx - best[None]) <= 1, jnp.inf, vol)
    second = jnp.min(masked, axis=0)
    unique_ok = cbest <= uniqueness * second

    # parabolic subpixel refinement
    bm = jnp.clip(best, 1, D - 2)
    c0 = jnp.take_along_axis(vol, (bm - 1)[None], axis=0)[0]
    c1 = jnp.take_along_axis(vol, bm[None], axis=0)[0]
    c2 = jnp.take_along_axis(vol, (bm + 1)[None], axis=0)[0]
    denom = c0 - 2 * c1 + c2
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / denom, 0.0)
    disp = bm.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

    # left-right consistency: recompute a right-image WTA from the same volume
    # cost_right(y, x, d) = cost_left(y, x + d, d)
    volR = []
    for d in range(D):
        volR.append(jnp.roll(vol[d], -d, axis=1))
    volR = jnp.stack(volR)
    bestR = jnp.argmin(volR, axis=0).astype(jnp.float32)
    xs = jnp.arange(w)[None, :].astype(jnp.int32)
    xr = jnp.clip(xs - best, 0, w - 1)
    dR = jnp.take_along_axis(bestR, xr, axis=1)
    lr_ok = jnp.abs(best.astype(jnp.float32) - dR) <= lr_thresh

    valid = unique_ok & lr_ok & (best > 0) & (best < D - 1)
    disp = jnp.where(valid, disp, -1.0)

    return _median3(disp)


def disparity_to_depth(disp: jnp.ndarray, bf: float) -> jnp.ndarray:
    """depth = bf / disparity (reference: stereo depth from mbf)."""
    return jnp.where(disp > 0, bf / jnp.maximum(disp, 1e-6), 0.0)
