"""Visual-inertial initialization: gravity direction, scale, biases,
velocities from visually-tracked keyframe poses + IMU preintegrations.

TPU-native re-derivation of the reference's IMU initialization
(reference: LocalMapping::InitializeIMU src/LocalMapping.cc:2164-2300 and
Optimizer::InertialOptimization overloads src/Optimizer.cc:6725,6912,7076 —
inertial-only g2o solves with poses fixed, estimating gravity direction
(2-dof), scale, per-KF velocities and a shared bias, with staged priors).
Implemented as one Gauss-Newton solve whose Jacobians come from ``jacfwd``
over the whole stacked residual — the parameter vector is tiny
(9 + 3K), so the dense solve is trivial on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie
from . import preintegration as pre


class InertialInit(NamedTuple):
    gravity: jnp.ndarray    # [3] world gravity vector (norm 9.81)
    scale: jnp.ndarray      # [] metric scale correction for the visual map
    bias_gyro: jnp.ndarray  # [3]
    bias_acc: jnp.ndarray   # [3]
    velocities: jnp.ndarray  # [K, 3] world-frame body velocities
    residual_norm: jnp.ndarray


def _gravity_from_dirs(rxy: jnp.ndarray, R0: jnp.ndarray | None = None) -> jnp.ndarray:
    """2-dof gravity parameterization: rotate the nominal -z gravity by a
    rotation with zero yaw component, optionally pre-rotated by a coarse
    initial estimate R0 (reference: VertexGDir around the Rwg computed from
    the accumulated velocity direction dirG in InitializeIMU)."""
    Rg = lie.so3_exp(jnp.concatenate([rxy, jnp.zeros(1, rxy.dtype)]))
    g = Rg @ jnp.asarray([0.0, 0.0, -9.81], rxy.dtype)
    if R0 is not None:
        g = R0 @ g
    return g


def _rotation_between(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Rotation taking unit vector a to unit vector b."""
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    s2 = jnp.sum(v * v)
    V = lie.hat(v)
    # Rodrigues; guard the antiparallel case with a fixed orthogonal axis
    R = jnp.eye(3, dtype=a.dtype) + V + V @ V * ((1 - c) / jnp.maximum(s2, 1e-12))
    R_anti = lie.so3_exp(jnp.asarray([jnp.pi, 0.0, 0.0], a.dtype))
    return jnp.where(s2 < 1e-12, jnp.where(c > 0, jnp.eye(3, dtype=a.dtype), R_anti), R)


def inertial_only_optimize(
    R_wb: jnp.ndarray,       # [K,3,3] visually estimated body rotations
    p_wb: jnp.ndarray,       # [K,3]  visually estimated body positions
    preints: pre.Preintegrated,  # stacked [K-1] preintegrations (tree-stacked)
    fix_scale: bool = False,
    iters: int = 20,
    prior_gyro: float = 1e2,
    prior_acc: float = 1e0,
    k_real=None,             # [] int: real chain length (None = K); padded
                             # tail states (identity dR, zero deltas) are
                             # mask-weighted out of every residual
):
    """Estimate (gravity, scale, biases, velocities) with poses fixed.

    ``preints`` must be a Preintegrated whose leaves carry a leading [K-1]
    axis (use jax.tree.map(stack) over per-pair preintegrations).
    """
    K = R_wb.shape[0]
    dtype = R_wb.dtype
    if k_real is None:
        k_real = jnp.asarray(K, jnp.int32)
    edge_valid = (jnp.arange(K - 1) < (k_real - 1)).astype(dtype)  # [K-1]

    def unpack(theta):
        rxy = theta[0:2]
        log_s = theta[2]
        bg = theta[3:6]
        ba = theta[6:9]
        vel = theta[9:].reshape(K, 3)
        return rxy, log_s, bg, ba, vel

    # coarse initial gravity direction from the preintegrated velocity
    # deltas: v_j - v_i - g dT = R_i dV  =>  for slow motion
    # g ~= -sum(R_i dV_i) / sum(dT) (reference: dirG in InitializeIMU)
    dirG = -jnp.sum(
        jnp.einsum("kij,kj->ki", R_wb[:-1], preints.dV)
        * edge_valid[:, None], axis=0)
    dirG = dirG / (jnp.linalg.norm(dirG) + 1e-9)
    R0_g = _rotation_between(jnp.asarray([0.0, 0.0, -1.0], dtype), dirG)

    # --- composed long-baseline rotation edges (dyadic strides) ----------
    # Gyro bias is weakly observable from consecutive KF pairs: the bias
    # signal over one short gap (~dT*bg) is comparable to the visual
    # rotation noise at the two endpoints. Composing preintegrated
    # rotations over strides 2,4,8,... grows the bias signal linearly with
    # the baseline while the vision noise stays at the two endpoints.
    # Composition rule for C = A∘B: dR_C = dR_A dR_B,
    # JRg_C = dR_B^T JRg_A + JRg_B (first-order, as in the reference's
    # per-sample Jacobian recursion, src/ImuTypes.cc).
    sigma_vis2 = jnp.asarray(1e-3, dtype) ** 2  # visual rotation noise floor
    rot_levels = []
    R_s = preints.dR
    J_s = preints.JRg
    c_s = jax.vmap(lambda C: jnp.diagonal(C)[0:3])(preints.cov)
    b_s = preints.bias_gyro
    stride = 1
    while 2 * stride <= K - 1:
        L = R_s.shape[0]
        A, B = slice(0, L - stride), slice(stride, L)
        R2 = jnp.einsum("kij,kjl->kil", R_s[A], R_s[B])
        J2 = jnp.einsum("kji,kjm->kim", R_s[B], J_s[A]) + J_s[B]
        c2 = c_s[A] + c_s[B]
        b2 = 0.5 * (b_s[A] + b_s[B])
        R_s, J_s, c_s, b_s = R2, J2, c2, b2
        stride *= 2
        rot_levels.append((stride, R_s, J_s, c_s, b_s))

    def residuals(theta):
        rxy, log_s, bg, ba, vel = unpack(theta)
        s = jnp.where(fix_scale, 1.0, jnp.exp(log_s))
        g = _gravity_from_dirs(rxy, R0_g)

        def edge(i):
            p_i = jax.tree.map(lambda x: x[i], preints)
            r = pre.inertial_residual(
                p_i,
                R_wb[i], s * p_wb[i], vel[i],
                R_wb[i + 1], s * p_wb[i + 1], vel[i + 1],
                bg, ba, gravity=g,
            )
            # whiten approximately with the preintegration covariance diag
            w = 1.0 / jnp.sqrt(
                jnp.diagonal(p_i.cov)[jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7, 8])] + 1e-8
            )
            return r * w * edge_valid[i]

        rs = jax.vmap(edge)(jnp.arange(K - 1)).reshape(-1)

        def rot_edge(args):
            stride_, Rij, Jij, cij, bij = args

            def one(i):
                dR_corr = Rij[i] @ lie.so3_exp(Jij[i] @ (bg - bij[i]))
                r = lie.so3_log(dR_corr.T @ R_wb[i].T @ R_wb[i + stride_])
                w = 1.0 / jnp.sqrt(cij[i] + sigma_vis2)
                # composed edge valid only when its whole span is real
                ok = ((i + stride_) < k_real).astype(r.dtype)
                return r * w * ok

            return jax.vmap(one)(jnp.arange(Rij.shape[0])).reshape(-1)

        rs_long = ([rot_edge(lv) for lv in rot_levels]
                   if rot_levels else [jnp.zeros((0,), dtype)])
        priors = jnp.concatenate([bg * prior_gyro, ba * prior_acc])
        return jnp.concatenate([rs, *rs_long, priors])

    theta0 = jnp.zeros((9 + 3 * K,), dtype)

    def gn_step(theta, _):
        r = residuals(theta)
        J = jax.jacfwd(residuals)(theta)
        H = J.T @ J + 1e-6 * jnp.eye(theta.shape[0], dtype=dtype)
        dx = jnp.linalg.solve(H, J.T @ r)
        return theta - dx, None

    theta, _ = jax.lax.scan(gn_step, theta0, None, length=iters)
    rxy, log_s, bg, ba, vel = unpack(theta)
    s = jnp.where(fix_scale, 1.0, jnp.exp(log_s))
    return InertialInit(
        gravity=_gravity_from_dirs(rxy, R0_g),
        scale=s,
        bias_gyro=bg,
        bias_acc=ba,
        velocities=vel,
        residual_norm=jnp.linalg.norm(residuals(theta)),
    )


def stack_preints(preints: list[pre.Preintegrated]) -> pre.Preintegrated:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *preints)


import functools as _functools  # noqa: E402

# one compiled program per (K bucket, flags): the eager solve re-traced —
# and through the tunnel recompiled, ~tens of seconds — on every distinct
# chain length while the staged init refines (reference runs it at
# t≈0/5/15 s; we refine per-KF until init_refine_until)
inertial_only_optimize_jit = jax.jit(
    inertial_only_optimize,
    static_argnames=("fix_scale", "iters", "prior_gyro", "prior_acc"))


def _identity_preint(template: pre.Preintegrated) -> pre.Preintegrated:
    """A no-op preintegration (identity dR, zero deltas, tiny diagonal
    covariance) shaped like ``template`` — finite in every downstream
    computation, mask-weighted out of the residuals."""
    z = jax.tree.map(lambda x: jnp.zeros_like(x), template)
    return z._replace(
        dR=jnp.eye(3, dtype=template.dR.dtype),
        cov=jnp.eye(15, dtype=template.cov.dtype) * 1e-6)


def inertial_only_optimize_padded(R_wb, p_wb, preint_list,
                                  fix_scale: bool = False, lo: int = 8,
                                  **kw):
    """Bucket-pad the chain to a power-of-two length and run the jitted
    solve (pads: identity poses + no-op preintegrations, masked via
    ``k_real``)."""
    K = int(R_wb.shape[0])
    Kb = lo
    while Kb < K:
        Kb *= 2
    import numpy as _np

    if Kb > K:
        pk = Kb - K
        R_wb = _np.concatenate(
            [R_wb, _np.tile(_np.eye(3, dtype=_np.float32)[None],
                            (pk, 1, 1))])
        p_wb = _np.concatenate([p_wb, _np.zeros((pk, 3), _np.float32)])
        pad_p = _identity_preint(preint_list[0])
        preint_list = list(preint_list) + [pad_p] * pk
    preints = stack_preints(preint_list)
    return inertial_only_optimize_jit(
        jnp.asarray(R_wb), jnp.asarray(p_wb), preints,
        fix_scale=fix_scale, k_real=jnp.asarray(K, jnp.int32), **kw)
