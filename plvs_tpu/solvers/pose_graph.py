"""Sim3/SE3 pose-graph (essential graph) optimization.

TPU-native re-derivation of the reference's
``Optimizer::OptimizeEssentialGraph`` (reference: src/Optimizer.cc:4487,
4893 — g2o Sim3 vertices with spanning-tree + covisibility + loop edges,
residual log(S_ji S_i S_j^-1)) used at loop closure instead of a full BA.
All edge residuals/Jacobians are evaluated in one vmapped pass (autodiff
jacfwd over the 7-dim tangents of the two endpoint vertices), and the
sparse normal equations are solved matrix-free with block-Jacobi PCG —
same layout as the BA core, so the edge table shards across devices.

State: per-vertex Sim3 (R [K,3,3], t [K,3], s [K]); SE3 mode = scales
pinned to 1 (fix_scale=True, the reference's bFixScale for stereo/RGB-D).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie


class PoseGraphProblem(NamedTuple):
    R: jnp.ndarray          # [K,3,3] world-to-local (like the reference Scw)
    t: jnp.ndarray          # [K,3]
    s: jnp.ndarray          # [K]
    fixed: jnp.ndarray      # [K] bool
    # edges: relative measurement S_ij = S_i * S_j^-1 (i observes j)
    edge_i: jnp.ndarray     # [E] int32
    edge_j: jnp.ndarray     # [E] int32
    edge_R: jnp.ndarray     # [E,3,3]
    edge_t: jnp.ndarray     # [E,3]
    edge_s: jnp.ndarray     # [E]
    edge_weight: jnp.ndarray  # [E]
    edge_mask: jnp.ndarray  # [E] bool


def make_edges_from_poses(R, t, s, pairs):
    """Build relative measurements S_ij = S_i S_j^{-1} from current poses for
    index pairs [E,2] (used for spanning-tree/covisibility edges)."""
    i, j = pairs[:, 0], pairs[:, 1]
    Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(R[j], t[j], s[j])
    Rij, tij, sij = lie.sim3_compose(R[i], t[i], s[i], Rj_inv, tj_inv, sj_inv)
    return Rij, tij, sij


def _edge_residual(Ri, ti, si, Rj, tj, sj, Rij, tij, sij):
    """7D residual log(S_ij_meas^-1 * S_i * S_j^-1) (reference:
    EdgeSim3::computeError convention up to fixed sign)."""
    Rj_inv, tj_inv, sj_inv = lie.sim3_inverse(Rj, tj, sj)
    Rp, tp, sp = lie.sim3_compose(Ri, ti, si, Rj_inv, tj_inv, sj_inv)
    Rm_inv, tm_inv, sm_inv = lie.sim3_inverse(Rij, tij, sij)
    Re, te, se = lie.sim3_compose(Rm_inv, tm_inv, sm_inv, Rp, tp, sp)
    return lie.sim3_log(Re, te, se)


def optimize(
    prob: PoseGraphProblem,
    num_iters: int = 15,
    cg_iters: int = 50,
    fix_scale: bool = False,
    lam0: float = 1e-4,
    dof4_axis: jnp.ndarray | None = None,
):
    """LM over vertex Sim3 tangents. Returns (R, t, s, info).

    ``dof4_axis`` [K,3]: camera-frame gravity direction per vertex. When
    given, each vertex's rotation update is constrained to a rotation about
    that axis (and scale pinned), i.e. yaw + translation only — the
    reference's 4-DoF essential graph for visual-inertial maps where
    roll/pitch are observable from gravity and must not be bent by the loop
    (reference: Optimizer::OptimizeEssentialGraph4DoF,
    src/Optimizer.cc:10934; VertexPose4DoF/Edge4DoF, include/G2oTypes.h:854).
    """
    K = prob.R.shape[0]
    free = ~prob.fixed

    def apply_delta(R, t, s, dx, axis=None):
        # left-multiplicative: S <- exp(dx) * S
        if fix_scale or dof4_axis is not None:
            dx = dx.at[..., 6].set(0.0)
        if axis is not None:
            # project the rotation update onto the per-vertex gravity axis:
            # exp(a α) R  ==  R exp((Rᵀa) α) — a rotation about the world
            # gravity direction, leaving roll/pitch intact
            w = dx[..., 3:6]
            alpha = jnp.sum(w * axis, axis=-1, keepdims=True)
            dx = dx.at[..., 3:6].set(alpha * axis)
        dR, dt, ds = lie.sim3_exp(dx)
        Rn, tn, sn = lie.sim3_compose(dR, dt, ds, R, t, s)
        return lie.normalize_rotation(Rn), tn, sn

    def edge_res(R, t, s, e):
        return _edge_residual(
            R[prob.edge_i[e]], t[prob.edge_i[e]], s[prob.edge_i[e]],
            R[prob.edge_j[e]], t[prob.edge_j[e]], s[prob.edge_j[e]],
            prob.edge_R[e], prob.edge_t[e], prob.edge_s[e],
        )

    def linearize(R, t, s):
        """Residuals [E,7] + Jacobians w.r.t. the two endpoint tangents."""

        def one(e):
            ax_i = None if dof4_axis is None else dof4_axis[prob.edge_i[e]]
            ax_j = None if dof4_axis is None else dof4_axis[prob.edge_j[e]]

            def f(dxi, dxj):
                Ri, ti, si = apply_delta(R[prob.edge_i[e]], t[prob.edge_i[e]], s[prob.edge_i[e]], dxi, ax_i)
                Rj, tj, sj = apply_delta(R[prob.edge_j[e]], t[prob.edge_j[e]], s[prob.edge_j[e]], dxj, ax_j)
                return _edge_residual(Ri, ti, si, Rj, tj, sj,
                                      prob.edge_R[e], prob.edge_t[e], prob.edge_s[e])

            z = jnp.zeros((7,), R.dtype)
            r = f(z, z)
            Ji = jax.jacfwd(f, argnums=0)(z, z)
            Jj = jax.jacfwd(f, argnums=1)(z, z)
            return r, Ji, Jj

        E = prob.edge_i.shape[0]
        return jax.vmap(one)(jnp.arange(E))

    def cost_of(R, t, s):
        E = prob.edge_i.shape[0]
        r = jax.vmap(lambda e: edge_res(R, t, s, e))(jnp.arange(E))
        return jnp.sum(jnp.sum(r * r, -1) * prob.edge_weight * prob.edge_mask)

    def lm_step(carry):
        R, t, s, lam, cost_prev = carry
        r, Ji, Jj = linearize(R, t, s)
        w = prob.edge_weight * prob.edge_mask  # [E]

        # gradient b = -J^T W r
        bi = -jnp.einsum("eri,e,er->ei", Ji, w, r)
        bj = -jnp.einsum("eri,e,er->ei", Jj, w, r)
        b = (
            jax.ops.segment_sum(bi, prob.edge_i, num_segments=K)
            + jax.ops.segment_sum(bj, prob.edge_j, num_segments=K)
        ) * free[:, None]

        # block diagonal for damping/preconditioner
        Hii = jnp.einsum("eri,e,erj->eij", Ji, w, Ji)
        Hjj = jnp.einsum("eri,e,erj->eij", Jj, w, Jj)
        Hd = (
            jax.ops.segment_sum(Hii, prob.edge_i, num_segments=K)
            + jax.ops.segment_sum(Hjj, prob.edge_j, num_segments=K)
        )
        lam_diag = lam * jnp.diagonal(Hd, axis1=-2, axis2=-1) + 1e-8
        M = jnp.linalg.inv(
            Hd + (lam_diag[..., None]) * jnp.eye(7, dtype=R.dtype)
            + 1e-8 * jnp.eye(7, dtype=R.dtype)
        )

        def matvec(x):
            x = x * free[:, None]
            u = (
                jnp.einsum("eri,ei->er", Ji, x[prob.edge_i])
                + jnp.einsum("eri,ei->er", Jj, x[prob.edge_j])
            ) * w[:, None]
            y = (
                jax.ops.segment_sum(jnp.einsum("eri,er->ei", Ji, u), prob.edge_i, num_segments=K)
                + jax.ops.segment_sum(jnp.einsum("eri,er->ei", Jj, u), prob.edge_j, num_segments=K)
            )
            return (y + lam_diag * x) * free[:, None]

        def precond(rr):
            return jnp.einsum("kij,kj->ki", M, rr) * free[:, None]

        x = jnp.zeros_like(b)
        rr = b
        z = precond(rr)
        p = z
        rz = jnp.vdot(rr, z)

        def cg_body(st):
            x, rr, p, rz, i = st
            Ap = matvec(p)
            alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-20)
            x = x + alpha * p
            rr = rr - alpha * Ap
            z = precond(rr)
            rz_new = jnp.vdot(rr, z)
            beta = rz_new / jnp.maximum(rz, 1e-20)
            p = z + beta * p
            return (x, rr, p, rz_new, i + 1)

        # stop once the preconditioned residual has collapsed (sequential
        # launch-bound matvecs — converged iterations are pure latency)
        rz0 = rz
        x, _, _, _, _ = jax.lax.while_loop(
            lambda st: (st[4] < cg_iters) & (st[3] > 1e-12 * rz0),
            cg_body, (x, rr, p, rz, jnp.zeros((), jnp.int32)),
        )
        Rn, tn, sn = apply_delta(R, t, s, x, dof4_axis)
        cost_new = cost_of(Rn, tn, sn)
        accept = cost_new < cost_prev
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        s = jnp.where(accept, sn, s)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), jnp.minimum(lam * 4.0, 1e3))
        done = accept & (cost_prev - cost_new < 1e-8 * cost_prev)
        cost_prev = jnp.where(accept, cost_new, cost_prev)
        return R, t, s, lam, cost_prev, done

    cost0 = cost_of(prob.R, prob.t, prob.s)

    def lm_body(state):
        R, t, s, lam, cost_prev, i, _ = state
        R, t, s, lam, cost_prev, done = lm_step((R, t, s, lam, cost_prev))
        return (R, t, s, lam, cost_prev, i + 1, done)

    (R, t, s, lam, cost, _, _) = jax.lax.while_loop(
        lambda st: (st[5] < num_iters) & ~st[6], lm_body,
        (prob.R, prob.t, prob.s, jnp.asarray(lam0, prob.R.dtype), cost0,
         jnp.zeros((), jnp.int32), jnp.zeros((), bool)),
    )
    return R, t, s, {"cost0": cost0, "cost": cost}


# single-dispatch compiled variant (see solvers.ba.bundle_adjust_jit)
# num_iters/cg_iters are dynamic loop bounds: one compiled program per
# shape bucket regardless of the iteration budget (see ba.bundle_adjust_jit)
optimize_jit = jax.jit(
    optimize, static_argnames=("fix_scale", "lam0"))
