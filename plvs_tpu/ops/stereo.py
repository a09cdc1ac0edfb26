"""Pallas kernel: fused census-stereo disparity (cost + WTA in VMEM).

TPU-native core of the dense stereo engine (plvs_tpu.dense.stereo_depth),
replacing the reference's four disparity libraries (libelas-gpu, libsgm
CUDA, OpenCV SGBM, OpenCV CUDA BM/BP/CSBP — SURVEY.md §2.2). The jnp path
materialises the [D, H, W] cost volume in HBM twice (~80 MB at VGA, D=64);
this kernel never does: the grid walks 8-row bands, and for each band the
full disparity extent lives in a VMEM scratch volume
([D, 8, W] ~ 1.3 MB), so HBM traffic is just census-in / disparity-out.

Per band, three streamed passes over d (all column shifts are
`tpu.dynamic_rotate`s of lane-aligned buffers):
  1. raw census Hamming cost -> (2r+1)^2 box aggregation -> scratch, while
     tracking the winner (cost, d);
  2. with the winner fixed: second-best outside +-1 (uniqueness), the three
     costs around the winner (parabolic subpixel), and the right-image WTA
     (cost_R(x, d) = cost_L(x + d, d)) for the left-right check;
  3. gather bestR at x - d(x) by another d-shift sweep.

Border semantics differ benignly from the jnp reference: the kernel uses
+inf instead of column wrap-around for the right-WTA shift and zero instead
of clamping at the left edge, so a sparse set of image-border pixels can
flip validity. The 3x3 median post-filter stays in XLA (it fuses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import round_up

TH = 8          # output rows per grid step


def _make_kernel(H: int, W: int, Wp: int, WR: int, D: int, r: int,
                 uniqueness: float, lr_thresh: float):
    k = 2 * r + 1
    inv_k2 = 1.0 / (k * k)
    PL = WR - Wp          # left padding of the shift buffers (>= D)
    BAND = TH + 2 * r
    RB = round_up(BAND, 8)  # aligned band read

    def popcount32(v):
        v = v - ((v >> 1) & jnp.uint32(0x55555555))
        v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
        v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
        return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32).astype(
            jnp.float32)

    def hshift_zero(x, dx):
        if dx == 0:
            return x
        z = jnp.zeros_like(x[:, :abs(dx)])
        if dx > 0:   # value at x comes from x-dx
            return jnp.concatenate([z, x[:, :-dx]], axis=1)
        return jnp.concatenate([x[:, -dx:], z], axis=1)

    def box(x_band):
        """(BAND, Wp) raw cost -> (TH, Wp) box-aggregated (zero-padded)."""
        acc = x_band
        for dx in range(1, r + 1):
            acc = acc + hshift_zero(x_band, dx) + hshift_zero(x_band, -dx)
        vsum = acc[0:TH]
        for dy in range(1, k):
            vsum = vsum + acc[dy:dy + TH]
        return vsum * jnp.float32(inv_k2)

    def kernel(cl_ref, cr_ref, disp_ref, agg_s, bufL_s, bufR_s):
        i = pl.program_id(0)
        y0 = i * TH
        col_band = jax.lax.broadcasted_iota(jnp.int32, (BAND, Wp), 1)
        col = jax.lax.broadcasted_iota(jnp.int32, (TH, Wp), 1)
        BIG = jnp.float32(1e9)

        Lc = cl_ref[pl.ds(y0, RB), :][:BAND]
        Rfull = cr_ref[pl.ds(y0, RB), :]          # [RB, WR], data at [PL+x]
        row_g = jax.lax.broadcasted_iota(jnp.int32, (BAND, Wp), 0) + y0 - r
        row_valid = (row_g >= 0) & (row_g < H)

        bufL_s[:] = jnp.full((TH, WR), BIG, jnp.float32)
        bufR_s[:] = jnp.zeros((TH, WR), jnp.float32)

        # ---- pass 1: cost + aggregation into scratch, track the winner ----
        def p1(d, carry):
            best, bestd = carry
            # Rc(x) = census_r(x - d) = Rfull[PL + x - d]
            Rc = pltpu.roll(Rfull, d, axis=1)[:BAND, PL:]
            raw = popcount32(jnp.bitwise_xor(Lc, Rc))
            raw = jnp.where(col_band < d, jnp.float32(1e3), raw)
            raw = jnp.where(row_valid & (col_band < W), raw, 0.0)
            agg = box(raw)
            agg_s[d] = agg
            take = agg < best
            return jnp.where(take, agg, best), jnp.where(take, d, bestd)

        best, bestd = jax.lax.fori_loop(
            0, D, p1,
            (jnp.full((TH, Wp), BIG, jnp.float32),
             jnp.zeros((TH, Wp), jnp.int32)),
        )
        bm = jnp.clip(bestd, 1, D - 2)

        # ---- pass 2: uniqueness / subpixel neighbours / right-image WTA ----
        def p2(d, carry):
            second, c0, c1, c2, bestR, bestRd = carry
            agg = agg_s[d]
            far = jnp.abs(d - bestd) > 1
            second = jnp.where(far & (agg < second), agg, second)
            c0 = jnp.where(d == bm - 1, agg, c0)
            c1 = jnp.where(d == bm, agg, c1)
            c2 = jnp.where(d == bm + 1, agg, c2)
            bufL_s[:, :Wp] = jnp.where(col < W, agg, BIG)
            # cost_R(x, d) = cost_L(x + d, d); columns beyond W read BIG.
            # (WR - d, not -d: negative dynamic rotates mis-lower on wide
            # vectors in current Mosaic, so use the positive equivalent.)
            aggR = pltpu.roll(bufL_s[:], WR - d, axis=1)[:, :Wp]
            takeR = aggR < bestR
            bestR = jnp.where(takeR, aggR, bestR)
            bestRd = jnp.where(takeR, jnp.float32(d), bestRd)
            return second, c0, c1, c2, bestR, bestRd

        zero = jnp.zeros((TH, Wp), jnp.float32)
        second, c0, c1, c2, bestR, bestRd = jax.lax.fori_loop(
            0, D, p2,
            (jnp.full((TH, Wp), BIG, jnp.float32), zero, zero, zero,
             jnp.full((TH, Wp), BIG, jnp.float32), zero),
        )

        # ---- pass 3: dR(x) = bestRd(x - best(x)) by a second d-sweep ----
        bufR_s[:, PL:] = bestRd

        def p3(d, dR):
            shifted = pltpu.roll(bufR_s[:], d, axis=1)[:, PL:]
            return jnp.where(bestd == d, shifted, dR)

        dR = jax.lax.fori_loop(0, D, p3, zero)

        unique_ok = best <= jnp.float32(uniqueness) * second
        lr_ok = jnp.abs(bestd.astype(jnp.float32) - dR) <= jnp.float32(lr_thresh)

        denom = c0 - 2.0 * c1 + c2
        delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / denom, 0.0)
        disp = bm.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

        valid = unique_ok & lr_ok & (bestd > 0) & (bestd < D - 1)
        disp_ref[:] = jnp.where(valid, disp, jnp.float32(-1.0))

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_disp", "agg_radius", "uniqueness", "lr_thresh",
                     "interpret"),
)
def disparity_wta_pallas(
    census_l: jnp.ndarray,
    census_r: jnp.ndarray,
    max_disp: int = 64,
    agg_radius: int = 3,
    uniqueness: float = 0.95,
    lr_thresh: float = 1.5,
    interpret: bool = False,
) -> jnp.ndarray:
    """Census images [H, W] uint32 -> float disparity [H, W] (<0 invalid)."""
    H, W = census_l.shape
    D, r = max_disp, agg_radius
    Hp = round_up(H, TH)
    Wp = round_up(W, 128)              # lane-aligned working width
    WR = round_up(Wp + D, 128)         # shift-buffer width (left pad >= D)
    PL = WR - Wp
    rows = Hp + 2 * r + 8  # slack so the last band's aligned read is in range
    # zero census rows/columns contribute zero cost, matching the jnp path's
    # zero-padded box filter
    clp = jnp.zeros((rows, Wp), jnp.uint32).at[r:r + H, :W].set(census_l)
    crp = jnp.zeros((rows, WR), jnp.uint32).at[r:r + H, PL:PL + W].set(census_r)

    kern = _make_kernel(H, W, Wp, WR, D, r, uniqueness, lr_thresh)
    disp = pl.pallas_call(
        kern,
        grid=(Hp // TH,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TH, Wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((D, TH, Wp), jnp.float32),   # aggregated cost volume
            pltpu.VMEM((TH, WR), jnp.float32),      # right-WTA shift buffer
            pltpu.VMEM((TH, WR), jnp.float32),      # bestRd shift buffer
        ],
        interpret=interpret,
    )(clp, crp)
    return disp[:H, :W]
