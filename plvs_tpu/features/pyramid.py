"""Image pyramid + separable Gaussian blur (batched, static shapes).

TPU-native replacement for ORBextractor::ComputePyramid (reference:
src/ORBextractor.cc, include/ORBextractor.h:131) and the threaded
Gaussian-pyramid precompute (reference: src/Frame.cc:301-302,
Tracking::skUsePyramidPrecomputation). Level shapes are static python ints so
every level compiles once; all levels of a frame are produced in one jitted
call.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(height: int, width: int, n_levels: int, scale: float):
    """Static [H_l, W_l] for each pyramid level."""
    shapes = []
    for l in range(n_levels):
        s = scale ** l
        shapes.append((max(16, int(round(height / s))), max(16, int(round(width / s)))))
    return shapes


def gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float32)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _blur_axis(x: jnp.ndarray, k: jnp.ndarray, axis: int,
               radius: int) -> jnp.ndarray:
    """1-D blur along ``axis`` as weighted shifted slices. A single-channel
    `conv_general_dilated` misses the MXU entirely and lowers to a slow
    scalar loop on TPU (measured 11.5 ms for a [8,480,640] 7x7 separable
    blur vs 3.1 ms for shift-and-add on the VPU)."""
    n = x.shape[axis]
    xp = jnp.pad(x, [(radius, radius) if a == axis else (0, 0)
                     for a in range(x.ndim)], mode="reflect")
    acc = k[0] * jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    for i in range(1, 2 * radius + 1):
        acc = acc + k[i] * jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
    return acc


def gaussian_blur(img: jnp.ndarray, sigma: float = 2.0, radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur on a [H, W] float image (reflect padding).

    Matches the role of cv::GaussianBlur(7,7,2) applied before ORB descriptor
    sampling in the reference extractor.
    """
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    return _blur_axis(_blur_axis(img, k, 0, radius), k, 1, radius)


def build_pyramid(img: jnp.ndarray, n_levels: int = 8, scale: float = 1.2):
    """[H, W] float32 image -> list of n_levels arrays with static shapes."""
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        # resize from the previous level (cascaded, like the reference)
        prev = levels[-1]
        levels.append(
            jax.image.resize(prev, shapes[l], method="linear", antialias=True)
        )
    return levels


def build_pyramid_stack(img: jnp.ndarray, n_levels: int = 8,
                        scale: float = 1.2) -> jnp.ndarray:
    """Pyramid as ONE [L, H, W] tensor (levels edge-padded to level-0 size).

    Uniform shapes let every downstream stage (FAST scoring, NMS, cell
    reduction, blur, patch gather) run as a single batched kernel over all
    levels instead of n_levels sequential small programs — the difference
    between ~4x the kernel-launch + VPU-underutilization cost and one
    well-shaped launch per stage. Padding is edge-replication so the blur
    halo near a level edge stays close to the per-level behavior; detection
    masks the pad region out exactly (per-level border masks).
    """
    levels = build_pyramid(img, n_levels, scale)
    h0, w0 = levels[0].shape
    padded = [
        lv if lv.shape == (h0, w0)
        else jnp.pad(lv, ((0, h0 - lv.shape[0]), (0, w0 - lv.shape[1])),
                     mode="edge")
        for lv in levels
    ]
    return jnp.stack(padded)


def gaussian_blur_batched(stack: jnp.ndarray, sigma: float = 2.0,
                          radius: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur on an [L, H, W] stack (shift-and-add; see
    _blur_axis for why not conv_general_dilated)."""
    k = jnp.asarray(gaussian_kernel1d(sigma, radius))
    return _blur_axis(_blur_axis(stack, k, 1, radius), k, 2, radius)
