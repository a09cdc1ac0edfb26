"""Pallas kernels: binary-descriptor Hamming distance matrix.

The single hottest primitive of the sparse front end — every matcher
(projection search, BoW search, triangulation search, fuse, loop
verification; reference: src/ORBmatcher.cc, src/LineMatcher.cc) reduces to
an all-pairs Hamming distance between packed 256-bit descriptors
([N, 8] uint32).

Two kernels, identical results:

* ``mxu``: the TPU-native formulation. Descriptor bits are unpacked
  in-VMEM to +-1 vectors and the distance matrix falls out of one
  [Q,256]x[256,K] matmul on the MXU systolic array:
  ``ham(a, b) = (256 - <s_a, s_b>) / 2`` with ``s = 2*bits - 1``.
  All values are small integers, exact in bf16xbf16->f32.
* ``vpu``: tiled XOR + SWAR popcount on the vector unit, eight lane-aligned
  [128, 128] passes per tile.

The [Q, K] output is tiled 128x128 over a 2-D grid; each program touches one
query block and one key block in VMEM with no HBM intermediates. Padding
rows are zero descriptors; callers mask invalid rows/columns (they already
do for the jnp path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import round_up, use_pallas

TILE = 128
WORDS = 8   # 256-bit ORB/LBD descriptors packed into 8 uint32 words
BITS = 32 * WORDS


def _popcount32(v: jnp.ndarray) -> jnp.ndarray:
    """SWAR popcount on uint32 (no reliance on a popcount lowering)."""
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    return ((v * jnp.uint32(0x01010101)) >> 24).astype(jnp.int32)


def _unpack_pm1(packed: jnp.ndarray) -> jnp.ndarray:
    """[T, WORDS] uint32 -> [T, 256] bf16 in {-1, +1} (bit order: word-major,
    LSB first — order only needs to agree between the two operands).

    One broadcasted shift instead of a 256-column concat: the original
    per-column formulation emitted hundreds of [T, 1] VPU oplets and made
    the 'matmul' kernel unpack-bound (~900 us for 1024x1024; the matmul
    itself is ~3 us of MXU time)."""
    t = packed.shape[0]
    shift = jax.lax.broadcasted_iota(jnp.uint32, (t, WORDS, 32), dimension=2)
    bits = ((packed[:, :, None] >> shift) & jnp.uint32(1)).astype(jnp.int32)
    return (2 * bits - 1).reshape(t, BITS).astype(jnp.bfloat16)


def _hamming_kernel_mxu(dq_ref, dk_ref, out_ref):
    sq = _unpack_pm1(dq_ref[:])
    sk = _unpack_pm1(dk_ref[:])
    dot = jax.lax.dot_general(
        sq, sk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    out_ref[:] = ((jnp.float32(BITS) - dot) * jnp.float32(0.5)).astype(jnp.int32)


def _hamming_kernel_vpu(dq_ref, dk_ref, out_ref):
    acc = jnp.zeros((TILE, TILE), jnp.int32)
    for w in range(WORDS):
        q = dq_ref[:, w].reshape(TILE, 1)
        k = dk_ref[:, w].reshape(1, TILE)
        acc = acc + _popcount32(jnp.bitwise_xor(q, k))
    out_ref[:] = acc


_KERNELS = {"mxu": _hamming_kernel_mxu, "vpu": _hamming_kernel_vpu}


@functools.partial(jax.jit, static_argnames=("kernel", "interpret"))
def hamming_pallas(
    dq: jnp.ndarray, dk: jnp.ndarray, kernel: str = "mxu", interpret: bool = False
) -> jnp.ndarray:
    q, k = dq.shape[0], dk.shape[0]
    qp, kp = round_up(max(q, 1), TILE), round_up(max(k, 1), TILE)
    dqp = jnp.zeros((qp, WORDS), jnp.uint32).at[:q].set(dq)
    dkp = jnp.zeros((kp, WORDS), jnp.uint32).at[:k].set(dk)
    out = pl.pallas_call(
        _KERNELS[kernel],
        grid=(qp // TILE, kp // TILE),
        in_specs=[
            pl.BlockSpec((TILE, WORDS), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, WORDS), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE, TILE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((qp, kp), jnp.int32),
        interpret=interpret,
    )(dqp, dkp)
    return out[:q, :k]


def hamming_jnp(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def _unpack_pm1_xla(packed: jnp.ndarray) -> jnp.ndarray:
    """[T, WORDS] uint32 -> [T, 256] bf16 in {-1, +1} at the XLA level (the
    in-kernel variant trips a Mosaic reshape bug on current toolchains:
    'infer-vector-layout: unsupported shape cast' for (T,8,32)->(T,256))."""
    t = packed.shape[0]
    shift = jax.lax.broadcasted_iota(jnp.uint32, (t, WORDS, 32), dimension=2)
    bits = ((packed[:, :, None] >> shift) & jnp.uint32(1)).astype(jnp.int8)
    return (2 * bits - 1).reshape(t, BITS).astype(jnp.bfloat16)


@jax.jit
def hamming_mxu_xla(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """MXU formulation without Pallas: unpack to +-1 bf16 (VPU) and let XLA
    tile the [Q,256]x[256,K] matmul onto the systolic array;
    ham = (256 - <s_q, s_k>) / 2, exact in bf16 (all values are small
    integers)."""
    sq = _unpack_pm1_xla(d1)
    sk = _unpack_pm1_xla(d2)
    dot = jax.lax.dot_general(
        sq, sk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return ((jnp.float32(BITS) - dot) * jnp.float32(0.5)).astype(jnp.int32)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """[Q, 8] x [K, 8] uint32 -> [Q, K] int32 all-pairs Hamming distances."""
    if d1.shape[-1] == WORDS and d2.shape[-1] == WORDS \
            and d1.shape[0] * d2.shape[0] >= 512 * 512:
        # big products ride the MXU (XLA-level unpack+matmul); small ones
        # stay on the VPU popcount path where dispatch dominates anyway
        return hamming_mxu_xla(d1, d2)
    return hamming_jnp(d1, d2)
