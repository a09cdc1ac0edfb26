"""Depth-sensor noise model: quadratic sigma_Z(z) and relative weights.

TPU-native equivalent of the reference's depth sigma model (reference:
include/Utils.h SigmaZminOverSigmaZ — used as the per-point segmentation
weight at src/PointCloudMapping.cc:1098 and as BA depth weighting through
the ``Depth.sigmaZfactor`` yaml key). Structured-light / ToF depth noise
grows quadratically with range (Khoshelham-style model):

    sigma_Z(z) = a + b * (z - z0)^2
"""

from __future__ import annotations

import jax.numpy as jnp

# defaults fit typical RGB-D sensors (Kinect/Xtion class)
SIGMA_A = 0.0012   # metres, noise floor
SIGMA_B = 0.0019   # metres^-1, quadratic growth
Z0 = 0.4           # metres, sweet-spot range
Z_MIN = 0.5        # metres, range where sigma is treated as minimal


def sigma_z(z, a: float = SIGMA_A, b: float = SIGMA_B, z0: float = Z0):
    """Depth standard deviation at range z (metres)."""
    return a + b * jnp.square(jnp.maximum(z, 0.0) - z0)


def sigma_z_min_over_sigma_z(z, a: float = SIGMA_A, b: float = SIGMA_B,
                             z0: float = Z0, z_min: float = Z_MIN):
    """Relative confidence weight in (0, 1]: 1 near the sensor, decaying
    quadratically with range (the reference's SigmaZminOverSigmaZ)."""
    return jnp.clip(sigma_z(z_min, a, b, z0) / sigma_z(z, a, b, z0), 0.0, 1.0)


def depth_inv_sigma2(z, sigma_z_factor: float = 6.0, a: float = SIGMA_A,
                     b: float = SIGMA_B, z0: float = Z0):
    """Information weight 1/sigma^2 for a depth/disparity residual, with the
    reference's ``Depth.sigmaZfactor`` multiplier inflating the modeled
    noise (larger factor -> weaker depth terms in BA)."""
    s = sigma_z_factor * sigma_z(z, a, b, z0)
    return 1.0 / jnp.maximum(jnp.square(s), 1e-12)
