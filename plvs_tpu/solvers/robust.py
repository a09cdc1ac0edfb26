"""Robust loss kernels for IRLS / Gauss-Newton solvers.

TPU-native replacement for g2o's RobustKernelHuber/Cauchy used throughout the
reference optimizer (reference: src/Optimizer.cc, e.g. PoseOptimization's
deltaMono = sqrt(5.991), deltaStereo = sqrt(7.815)). Expressed as IRLS
weights: w(r) = rho'(r^2) so that robustified normal equations are plain
weighted least squares — one fused elementwise pass on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

# chi-square 95% quantiles used by the reference as inlier gates
CHI2_2D = 5.991   # 2 dof (mono reprojection)
CHI2_3D = 7.815   # 3 dof (stereo reprojection)


def huber_weight(chi2: jnp.ndarray, delta2: float | jnp.ndarray) -> jnp.ndarray:
    """IRLS weight for the Huber loss given squared error chi2 = r^T W r.

    rho(s) = s                 for s <= delta^2
             2 delta sqrt(s) - delta^2  otherwise
    weight = rho'(s) = min(1, delta / sqrt(s)).
    """
    s = jnp.maximum(chi2, 1e-12)
    return jnp.minimum(1.0, jnp.sqrt(delta2 / s))


def cauchy_weight(chi2: jnp.ndarray, delta2: float | jnp.ndarray) -> jnp.ndarray:
    """IRLS weight for the Cauchy loss: rho(s) = d^2 log(1 + s/d^2)."""
    return 1.0 / (1.0 + chi2 / delta2)


def tukey_weight(chi2: jnp.ndarray, delta2: float | jnp.ndarray) -> jnp.ndarray:
    """IRLS weight for Tukey's biweight (hard redescending)."""
    u = 1.0 - chi2 / delta2
    return jnp.where(chi2 <= delta2, u * u, 0.0)
