"""Connected-component label propagation as ONE VMEM-resident Pallas kernel.

The line detector's connectivity pass (features/lines.py) is a fixpoint of
min-label propagation over an 8-connected half-resolution cell grid. As XLA
ops each sweep is ~16 tiny HBM-bound kernels and the whole loop costs ~5-7 ms
of device time; the grid itself is only ~360 KB, so the entire fixpoint fits
in VMEM and runs at VPU speed with zero HBM round trips per sweep
(reference for the capability being replaced: the sequential region-growing
of EDLine inside Thirdparty/line_descriptor, re-derived batched).

Structure per chunk (mirrors the XLA fallback in features/lines.py):
  * 8 local one-cell sweeps (they carry labels around corners and along
    diagonal staircases), then
  * 4 segmented min-scans via shift-doubling (they flood straight
    horizontal/vertical runs in O(log n) steps).
Fixed chunk count (no early exit: a convergence reduction would cost more
than the extra sweeps at VPU speed). Long DIAGONAL components beyond the
sweep reach may split into collinear fragments; merge_collinear downstream
re-joins them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# local sweep directions (dy, dx) and their connect-bit indices — must match
# features/lines.py's `connect` stacking order
SHIFTS = [(1, 0), (-1, 0), (0, 1), (0, -1),
          (1, 1), (-1, -1), (1, -1), (-1, 1)]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(n_chunks: int, n_local: int):
    def kernel(init_ref, conn_ref, out_ref):
        conn = conn_ref[:]
        # link flags stay int32 (0/1): Mosaic cannot rotate i1 vectors
        cbit = [(conn >> ci) & 1 for ci in range(8)]

        def roll(x, s, axis):
            # pltpu.roll rejects negative shifts; sizes are static, so a
            # negative (cyclic) shift is the positive complement
            return pltpu.roll(x, s % x.shape[axis], axis=axis)

        def local_sweep(lab):
            for ci, (sy, sx) in enumerate(SHIFTS):
                nb = lab
                if sy:
                    nb = roll(nb, sy, 0)
                if sx:
                    nb = roll(nb, sx, 1)
                lab = jnp.where(cbit[ci] == 1, jnp.minimum(lab, nb), lab)
            return lab

        def seg_scan(lab, link, axis, sign):
            # segmented min-scan by shift doubling: after step k every cell
            # holds the min label over its connected run up to 2^(k+1) cells
            # back; link flags are 0 at grid borders and in the lane
            # padding, so roll wrap-around never crosses a segment
            c = link
            n = lab.shape[axis]
            k = 1
            while k < n:
                nb = roll(lab, sign * k, axis)
                cc = roll(c, sign * k, axis)
                lab = jnp.where(c == 1, jnp.minimum(lab, nb), lab)
                c = c & cc
                k *= 2
            return lab

        def chunk(_, lab):
            for _i in range(n_local):
                lab = local_sweep(lab)
            lab = seg_scan(lab, cbit[2], 1, 1)
            lab = seg_scan(lab, cbit[3], 1, -1)
            lab = seg_scan(lab, cbit[0], 0, 1)
            lab = seg_scan(lab, cbit[1], 0, -1)
            return lab

        out_ref[:] = jax.lax.fori_loop(
            0, n_chunks, chunk, seg_scan(
                seg_scan(init_ref[:], cbit[2], 1, 1), cbit[0], 0, 1))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_chunks", "n_local", "interpret"))
def cc_min_labels(init: jnp.ndarray, conn_bits: jnp.ndarray,
                  n_chunks: int = 6, n_local: int = 8,
                  interpret: bool = False) -> jnp.ndarray:
    """Min-label fixpoint over an 8-connected grid.

    init [H, W] int32 labels (invalid cells hold a large sentinel),
    conn_bits [H, W] int32 with bit ci set when the cell connects to its
    SHIFTS[ci] neighbour. Returns the propagated labels [H, W].
    """
    h, w = init.shape
    hp, wp = _round_up(h, 8), _round_up(w, 128)
    big = jnp.int32(np.iinfo(np.int32).max // 2)
    ip = jnp.full((hp, wp), big, jnp.int32).at[:h, :w].set(init)
    cp = jnp.zeros((hp, wp), jnp.int32).at[:h, :w].set(conn_bits)
    out = pl.pallas_call(
        _make_kernel(n_chunks, n_local),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=interpret,
    )(ip, cp)
    return out[:h, :w]
