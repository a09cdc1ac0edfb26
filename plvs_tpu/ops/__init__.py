"""Pallas TPU kernels for the hot per-frame ops.

Each op has two interchangeable implementations with identical semantics:

* a Pallas kernel tiled for the TPU memory hierarchy (HBM -> VMEM -> VPU/MXU),
  used when the active JAX backend is ``tpu``;
* a pure ``jax.numpy`` reference, used on CPU (tests) and as the ground truth
  the kernels are verified against.

``use_pallas()`` picks at trace time; tests additionally run the kernels in
interpreter mode so the Pallas code path itself is exercised on CPU.
"""

from __future__ import annotations

import jax


def use_pallas() -> bool:
    """True when the Pallas (compiled Mosaic) path should be used."""
    return jax.default_backend() == "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
