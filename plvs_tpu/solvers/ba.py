"""Bundle adjustment as a batched Levenberg-Marquardt solver.

TPU-native re-derivation of the reference's g2o-based BA entry points
(reference: Optimizer::BundleAdjustment src/Optimizer.cc:595-1196,
Optimizer::LocalBundleAdjustment src/Optimizer.cc:3198 — block-sparse
Schur + LM over SE3 poses, 3D points and 3D line endpoints with Huber
kernels). Instead of building an explicit sparse graph, the normal equations
are applied *matrix-free*: per-observation Jacobian blocks are evaluated in
one batched pass and H @ x is two gathers + two segment-sums, solved with
block-Jacobi preconditioned conjugate gradient inside an LM trust loop.
This keeps everything static-shaped, fuses on the VPU/MXU, and the two
segment-sums become ``psum``s when the observation table is sharded across
devices (see plvs_tpu.parallel.sharded_ba).

Fixed-capacity convention: all arrays are padded; ``mask`` columns mark real
entries; fixed cameras (gauge) are masked via ``fixed_cam``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import cameras as cam_mod
from ..geometry import lie
from . import robust


class BAProblem(NamedTuple):
    """A padded, SoA bundle-adjustment problem."""

    # cameras (world-to-camera)
    R: jnp.ndarray            # [K, 3, 3]
    t: jnp.ndarray            # [K, 3]
    fixed_cam: jnp.ndarray    # [K] bool — gauge / frozen keyframes
    cam_mask: jnp.ndarray     # [K] bool — valid keyframe slots

    # point landmarks
    points: jnp.ndarray       # [P, 3]
    point_mask: jnp.ndarray   # [P] bool

    # point observations
    obs_cam: jnp.ndarray      # [M] int32
    obs_pt: jnp.ndarray       # [M] int32
    obs_uvr: jnp.ndarray      # [M, 3] (u, v, uR); uR < 0 => mono
    obs_inv_sigma2: jnp.ndarray  # [M]
    obs_mask: jnp.ndarray     # [M] bool

    # line landmarks (two endpoints each) — may be zero-capacity
    lines_Xs: jnp.ndarray     # [L, 3]
    lines_Xe: jnp.ndarray     # [L, 3]
    line_mask: jnp.ndarray    # [L] bool

    # line observations
    lobs_cam: jnp.ndarray     # [Ml] int32
    lobs_line: jnp.ndarray    # [Ml] int32
    lobs_nld: jnp.ndarray     # [Ml, 3] normalized image line (nx, ny, d)
    lobs_inv_sigma2: jnp.ndarray  # [Ml]
    lobs_mask: jnp.ndarray    # [Ml] bool
    # measured endpoint depths (<=0 none): anchors the endpoints along the
    # viewing ray — without them the infinite-line rows leave each endpoint
    # 1-2 underdetermined directions and repeated window solves let the
    # landmarks drift (reference: the stereo line edge's depth rows,
    # include/g2o/types_six_dof_expmap2.h:178-388)
    lobs_depth: jnp.ndarray   # [Ml, 2] (z_s, z_e)


def make_problem(R, t, fixed_cam, points, obs_cam, obs_pt, obs_uvr,
                 obs_inv_sigma2, obs_mask, cam_mask=None, point_mask=None,
                 lines_Xs=None, lines_Xe=None, line_mask=None,
                 lobs_cam=None, lobs_line=None, lobs_nld=None,
                 lobs_inv_sigma2=None, lobs_mask=None,
                 lobs_depth=None) -> BAProblem:
    K = R.shape[0]
    P = points.shape[0]
    if cam_mask is None:
        cam_mask = jnp.ones((K,), bool)
    if point_mask is None:
        point_mask = jnp.ones((P,), bool)
    if lines_Xs is None:
        lines_Xs = jnp.zeros((0, 3), R.dtype)
        lines_Xe = jnp.zeros((0, 3), R.dtype)
        line_mask = jnp.zeros((0,), bool)
        lobs_cam = jnp.zeros((0,), jnp.int32)
        lobs_line = jnp.zeros((0,), jnp.int32)
        lobs_nld = jnp.zeros((0, 3), R.dtype)
        lobs_inv_sigma2 = jnp.zeros((0,), R.dtype)
        lobs_mask = jnp.zeros((0,), bool)
    if lobs_depth is None:
        lobs_depth = jnp.zeros(lobs_nld.shape[:1] + (2,), R.dtype)
    return BAProblem(R, t, fixed_cam, cam_mask, points, point_mask,
                     obs_cam, obs_pt, obs_uvr, obs_inv_sigma2, obs_mask,
                     lines_Xs, lines_Xe, line_mask,
                     lobs_cam, lobs_line, lobs_nld, lobs_inv_sigma2,
                     lobs_mask, lobs_depth)


# ---------------------------------------------------------------------------
# Residuals / Jacobians (batched over the observation tables)
# ---------------------------------------------------------------------------

def _point_terms(cam, R, t, points, prob: BAProblem):
    """Residual [M,3], Jc [M,3,6], Jp [M,3,3], validity [M]."""
    Rm = R[prob.obs_cam]          # [M,3,3]
    tm = t[prob.obs_cam]
    Xw = points[prob.obs_pt]
    Xc = lie.se3_apply(Rm, tm, Xw)
    uv = cam_mod.project(cam, Xc)
    z = Xc[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    uR = uv[..., 0] - cam.bf / z_safe
    pred = jnp.concatenate([uv, uR[..., None]], axis=-1)
    res = prob.obs_uvr - pred
    is_stereo = prob.obs_uvr[..., 2] >= 0
    res = res.at[..., 2].set(jnp.where(is_stereo, res[..., 2], 0.0))

    Jproj = cam_mod.project_jac(cam, Xc)  # [M,2,3]
    I = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
    JXc_cam = jnp.concatenate([I, -lie.hat(Xc)], axis=-1)  # [M,3,6]
    duR_dXc = Jproj[..., 0, :] + jnp.stack(
        [jnp.zeros_like(z), jnp.zeros_like(z), cam.bf / (z_safe * z_safe)], axis=-1
    )
    Jrows = jnp.concatenate([Jproj, duR_dXc[..., None, :]], axis=-2)  # [M,3,3] d(pred)/dXc
    Jc = -(Jrows @ JXc_cam)       # [M,3,6]  (res = obs - pred)
    Jp = -(Jrows @ Rm)            # [M,3,3]  dXc/dXw = Rcw
    # zero-out the stereo row for mono observations
    row_w = jnp.stack([jnp.ones_like(z), jnp.ones_like(z), is_stereo.astype(z.dtype)], axis=-1)
    ok = prob.obs_mask & (z > 0.05)
    return res, Jc, Jp, ok, row_w, is_stereo


def _line_terms(cam, R, t, lines_Xs, lines_Xe, prob: BAProblem):
    """Residual [Ml,4], Jc [Ml,4,6], Jl [Ml,4,6] (endpoint deltas), valid,
    row weights [Ml,4].

    Rows 0-1: signed point-to-infinite-line distance of the projected
    endpoints. Rows 2-3: endpoint disparity residuals bf/z_pred - bf/z_meas
    (pixel units, active only where a measured depth exists) — the
    reference's 4D stereo line edge
    (include/g2o/types_six_dof_expmap2.h:178-388)."""
    Rm = R[prob.lobs_cam]
    tm = t[prob.lobs_cam]
    n = prob.lobs_nld[..., :2]
    d = prob.lobs_nld[..., 2]
    bf = cam.bf if cam.bf > 0 else float(cam.params[0]) * 0.1

    def endpoint(Xw, z_meas):
        # residual r = n . project(Xc) + d (signed point-to-line distance);
        # Jacobians are d(r)/d(cam tangent) and d(r)/d(endpoint).
        Xc = lie.se3_apply(Rm, tm, Xw)
        uv = cam_mod.project(cam, Xc)
        r = jnp.sum(n * uv, axis=-1) + d
        Jproj = cam_mod.project_jac(cam, Xc)
        I = jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3))
        JXc_cam = jnp.concatenate([I, -lie.hat(Xc)], axis=-1)
        dr_dXc = jnp.einsum("...k,...kj->...j", n, Jproj)  # [Ml,3]
        Jc = jnp.einsum("...k,...kj->...j", dr_dXc, JXc_cam)  # [Ml,6]
        Jx = jnp.einsum("...k,...kj->...j", dr_dXc, Rm)       # [Ml,3]
        # depth row (disparity units): rd = bf/z_meas - bf/z
        z = Xc[..., 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        has_d = z_meas > 0
        zm_safe = jnp.where(has_d, z_meas, 1.0)
        rd = jnp.where(has_d, bf / zm_safe - bf / z_safe, 0.0)
        # d(rd)/dXc = (bf/z^2) * dz/dXc = (bf/z^2) * e_z
        drd_dXc = jnp.stack(
            [jnp.zeros_like(z), jnp.zeros_like(z), bf / (z_safe * z_safe)],
            axis=-1)
        Jcd = jnp.einsum("...k,...kj->...j", drd_dXc, JXc_cam)
        Jxd = jnp.einsum("...k,...kj->...j", drd_dXc, Rm)
        return r, Jc, Jx, rd, Jcd, Jxd, z > 0.05, has_d

    rs, Jcs, Jxs, rds, Jcds, Jxds, oks, hds = endpoint(
        lines_Xs[prob.lobs_line], prob.lobs_depth[..., 0])
    re, Jce, Jxe, rde, Jcde, Jxde, oke, hde = endpoint(
        lines_Xe[prob.lobs_line], prob.lobs_depth[..., 1])
    res = jnp.stack([rs, re, rds, rde], axis=-1)           # [Ml,4]
    Jc = jnp.stack([Jcs, Jce, Jcds, Jcde], axis=-2)        # [Ml,4,6]
    z = jnp.zeros_like(Jxs)
    Jl = jnp.stack(
        [jnp.concatenate([Jxs, z], axis=-1),
         jnp.concatenate([z, Jxe], axis=-1),
         jnp.concatenate([Jxds, z], axis=-1),
         jnp.concatenate([z, Jxde], axis=-1)],
        axis=-2,
    )  # [Ml,4,6] w.r.t. (dXs, dXe)
    ok = prob.lobs_mask & oks & oke
    one = jnp.ones_like(rs)
    row_w = jnp.stack([one, one, hds.astype(rs.dtype), hde.astype(rs.dtype)],
                      axis=-1)
    return res, Jc, Jl, ok, row_w


# ---------------------------------------------------------------------------
# LM solver
# ---------------------------------------------------------------------------

def _sorted_seg_reduce(idx: jnp.ndarray, num_segments: int):
    """Scatter-free segment-sum for a STATIC index vector: sort once, then
    every reduction is a cumulative sum + two boundary gathers. TPU
    scatters serialize (the CG matvec was 2.5 GB/s, 0.3% of roofline);
    sort + cumsum are vectorized VPU passes.

    PRECISION NOTE: the prefix differences carry absolute error
    ~eps * global sum (measured 1e-3..1e-4 relative on bundle-adjustment
    Hessian blocks) — harmless to preconditioned CG, fatal to an exact
    Schur reduction; the schur_direct assembly uses
    :func:`_sorted_seg_reduce_exact` instead."""
    order = jnp.argsort(idx)
    idx_s = idx[order]
    seg = jnp.arange(num_segments, dtype=idx.dtype)
    starts = jnp.searchsorted(idx_s, seg)
    ends = jnp.searchsorted(idx_s, seg, side="right")

    def reduce(v):
        cs = jnp.cumsum(v[order], axis=0, dtype=v.dtype)
        z = jnp.zeros((1,) + cs.shape[1:], cs.dtype)
        cs = jnp.concatenate([z, cs], axis=0)
        return cs[ends] - cs[starts]

    return reduce


def _sorted_seg_reduce_exact(idx: jnp.ndarray, num_segments: int):
    """Segment-sum via a SEGMENTED associative scan: the accumulator
    resets at every segment head, so each segment's error is ~eps times
    its OWN sum (vs eps * global sum for the cumsum trick) — required by
    the exact Schur assembly, ~5x the cost of the cumsum (log-depth scan
    with a flag carry), so only the schur_direct branch pays for it."""
    order = jnp.argsort(idx)
    idx_s = idx[order]
    seg = jnp.arange(num_segments, dtype=idx.dtype)
    starts = jnp.searchsorted(idx_s, seg)
    ends = jnp.searchsorted(idx_s, seg, side="right")
    heads = jnp.concatenate(
        [jnp.ones((1,), bool), idx_s[1:] != idx_s[:-1]]) \
        if idx_s.shape[0] else jnp.zeros((0,), bool)

    def reduce(v):
        vs = v[order]
        h = heads.reshape((-1,) + (1,) * (vs.ndim - 1))

        def comb(a, b):
            ha, va = a
            hb, vb = b
            return ha | hb, jnp.where(hb, vb, va + vb)

        _, sums = jax.lax.associative_scan(
            comb, (jnp.broadcast_to(h, vs.shape), vs))
        # the running segmented sum at each segment's LAST element is that
        # segment's total; empty segments (ends == starts) read 0
        last = jnp.clip(ends - 1, 0, max(vs.shape[0] - 1, 0))
        out = sums[last]
        return jnp.where(
            (ends > starts).reshape((-1,) + (1,) * (vs.ndim - 1)),
            out, jnp.zeros_like(out))

    return reduce


def _onehot_seg_reduce(idx: jnp.ndarray, num_segments: int):
    """Scatter-free segment-sum for a SMALL segment count: one [S, M]
    0/1 matrix, every reduction is an MXU matmul (exact: f32 accumulate of
    0/1-weighted sums)."""
    E = (idx[None, :] == jnp.arange(num_segments, dtype=idx.dtype)[:, None]
         ).astype(jnp.float32)

    def reduce(v):
        return jnp.einsum("sm,m...->s...", E, v,
                          preferred_element_type=jnp.float32)

    return reduce


_SCHUR_DEBUG = None  # set to a dict to capture intermediates (disable_jit)


def bundle_adjust(
    cam: cam_mod.Camera,
    prob: BAProblem,
    num_iters: int = 10,
    cg_iters: int = 40,
    lam0: float = 1e-3,
    line_weight: float = 1.0,
    scatter_free: bool = False,
    schur_direct: bool = False,
):
    """Run LM bundle adjustment; returns (R, t, points, lines_Xs, lines_Xe, info).

    info = dict(cost0, cost, lam, inlier_frac)

    ``scatter_free``: route every segment reduction through sorted-cumsum
    (points/lines) and one-hot MXU matmuls (cameras) — ~6x faster CG on a
    single chip where TPU scatters serialize. Keep False under GSPMD
    sharding: the segment-sum formulation is what turns into ``psum``s when
    the observation table is sharded (plvs_tpu.parallel.sharded_ba), while
    a global argsort of a sharded index vector would be a collective sort.

    ``schur_direct``: replace the PCG inner solve with the EXPLICIT reduced
    camera system — build the camera-camera Schur complement S = Hcc -
    Y Hpp^-1 Y^T as one dense [6K, 6K] matrix and Cholesky-solve it, then
    back-substitute landmarks (the classic g2o/ceres SC ordering,
    reference: g2o's BlockSolver + LinearSolverEigen in Optimizer.cc).
    20 dependent CG matvecs are 20 serial launch-latency-bound kernels on
    TPU; the SC build is ONE MXU matmul over the dense [P, 6K, 3] coupling
    tensor and a tiny Cholesky — exact, fewer kernels, faster wall clock
    for windowed problems (K <= ~64). Memory is O(P*K*18) floats, so keep
    the CG path for global-BA scale problems and sharded runs.

    NOTE: call :func:`bundle_adjust_jit` from latency-sensitive paths — this
    function traces eagerly, which is fine under an outer jit (GSPMD
    sharding) but costs one device round trip PER PRIMITIVE when executed
    op-by-op against a remote accelerator.
    """
    K = prob.R.shape[0]
    P = prob.points.shape[0]
    L = prob.lines_Xs.shape[0]
    has_lines = L > 0

    if scatter_free:
        seg_c = _onehot_seg_reduce(prob.obs_cam, K)
        seg_p = _sorted_seg_reduce(prob.obs_pt, P)
        if has_lines:
            seg_lc = _onehot_seg_reduce(prob.lobs_cam, K)
            seg_ll = _sorted_seg_reduce(prob.lobs_line, L)
    else:
        seg_c = lambda v: jax.ops.segment_sum(  # noqa: E731
            v, prob.obs_cam, num_segments=K)
        seg_p = lambda v: jax.ops.segment_sum(  # noqa: E731
            v, prob.obs_pt, num_segments=P)
        if has_lines:
            seg_lc = lambda v: jax.ops.segment_sum(  # noqa: E731
                v, prob.lobs_cam, num_segments=K)
            seg_ll = lambda v: jax.ops.segment_sum(  # noqa: E731
                v, prob.lobs_line, num_segments=L)

    if schur_direct:
        # combined (landmark, camera) segment index for the dense coupling
        # tensors; int32 is ample (P*K and L*K are < 2^31 at windowed scale)
        seg_cp = _sorted_seg_reduce_exact(
            prob.obs_pt.astype(jnp.int32) * K
            + prob.obs_cam.astype(jnp.int32), P * K)
        # exact per-segment camera reduces: the one-hot MXU matmul's f32
        # accumulation error (~4e-4 relative, measured) is fine for CG's
        # preconditioner but perturbs the reduced system's small (~lam)
        # eigenvalues enough to wreck the exact step
        seg_c_x = _sorted_seg_reduce_exact(prob.obs_cam.astype(jnp.int32), K)
        seg_p_x = _sorted_seg_reduce_exact(prob.obs_pt.astype(jnp.int32), P)
        if has_lines:
            seg_cl = _sorted_seg_reduce_exact(
                prob.lobs_line.astype(jnp.int32) * K
                + prob.lobs_cam.astype(jnp.int32), L * K)
            seg_lc_x = _sorted_seg_reduce_exact(
                prob.lobs_cam.astype(jnp.int32), K)
            seg_ll_x = _sorted_seg_reduce_exact(
                prob.lobs_line.astype(jnp.int32), L)

    free_cam = (~prob.fixed_cam) & prob.cam_mask

    def robust_w(res, inv_s2, is_stereo=None):
        chi2 = jnp.sum(res * res, axis=-1) * inv_s2
        if is_stereo is None:
            delta2 = robust.CHI2_2D
        else:
            delta2 = jnp.where(is_stereo, robust.CHI2_3D, robust.CHI2_2D)
        return robust.huber_weight(chi2, delta2), chi2

    def cost_fn(R, t, points, lXs, lXe):
        res, _, _, ok, row_w, is_st = _point_terms(cam, R, t, points, prob)
        w = prob.obs_inv_sigma2 * ok
        rw, chi2 = robust_w(res * jnp.sqrt(row_w), prob.obs_inv_sigma2, is_st)
        c = jnp.sum(jnp.minimum(chi2, jnp.where(is_st, robust.CHI2_3D, robust.CHI2_2D) * 2.0) * ok)
        n_ok = jnp.sum(ok)
        if has_lines:
            lres, _, _, lok, lrow = _line_terms(cam, R, t, lXs, lXe, prob)
            _, lchi2 = robust_w(lres * jnp.sqrt(lrow), prob.lobs_inv_sigma2)
            lthr = jnp.where(jnp.sum(lrow, -1) > 2.5, 9.488, robust.CHI2_2D)
            c = c + line_weight * jnp.sum(jnp.minimum(lchi2, lthr * 2.0) * lok)
        # a state that invalidates EVERY observation (landmarks behind the
        # cameras after a runaway step) must read as infinitely bad, not as
        # a zero-cost optimum the accept test then locks in
        return jnp.where(n_ok > 0, c, jnp.inf)

    def lm_step(carry):
        R, t, points, lXs, lXe, lam, cost_prev = carry

        # ---- linearize ----
        res, Jc, Jp, ok, row_w, is_st = _point_terms(cam, R, t, points, prob)
        rw, _ = robust_w(res * jnp.sqrt(row_w), prob.obs_inv_sigma2, is_st)
        w = prob.obs_inv_sigma2 * rw * ok  # [M]
        wr = w[:, None] * row_w            # [M,3] per-row weights

        if has_lines:
            lres, lJc, lJl, lok, lrow = _line_terms(cam, R, t, lXs, lXe, prob)
            lrw, _ = robust_w(lres * jnp.sqrt(lrow), prob.lobs_inv_sigma2)
            lw = line_weight * prob.lobs_inv_sigma2 * lrw * lok  # [Ml]
            lwr = lw[:, None] * lrow                             # [Ml,4]

        # ---- gradient ----
        # b = -J^T W r  (we solve H dx = b)
        bc = -seg_c(jnp.einsum("mri,mr->mi", Jc, wr * res))
        bp = -seg_p(jnp.einsum("mri,mr->mi", Jp, wr * res))
        if has_lines:
            bc = bc + -seg_lc(jnp.einsum("mri,mr->mi", lJc, lwr * lres))
            bl = -seg_ll(jnp.einsum("mri,mr->mi", lJl, lwr * lres))
        else:
            bl = jnp.zeros((L, 6), R.dtype)
        bc = bc * free_cam[:, None]
        bp = bp * prob.point_mask[:, None]
        bl = bl * (prob.line_mask[:, None] if has_lines else 1.0)

        # ---- block-diagonal of H (for damping + preconditioner) ----
        Hcc = seg_c(jnp.einsum("mri,mr,mrj->mij", Jc, wr, Jc))
        Hpp = seg_p(jnp.einsum("mri,mr,mrj->mij", Jp, wr, Jp))
        if has_lines:
            Hcc = Hcc + seg_lc(jnp.einsum("mri,mr,mrj->mij", lJc, lwr, lJc))
            Hll = seg_ll(jnp.einsum("mri,mr,mrj->mij", lJl, lwr, lJl))
        else:
            Hll = jnp.zeros((L, 6, 6), R.dtype)

        def damped(Hb, dim):
            diag = jnp.diagonal(Hb, axis1=-2, axis2=-1)
            return Hb + (lam * diag + 1e-8)[..., None] * jnp.eye(dim, dtype=Hb.dtype)

        Hcc_d = damped(Hcc, 6)
        Hpp_d = damped(Hpp, 3)
        Hll_d = damped(Hll, 6) if has_lines else Hll

        Mc = jnp.linalg.inv(Hcc_d + jnp.eye(6, dtype=R.dtype) * 1e-8)
        Mp = jnp.linalg.inv(Hpp_d + jnp.eye(3, dtype=R.dtype) * 1e-8)
        Ml_ = jnp.linalg.inv(Hll_d + jnp.eye(6, dtype=R.dtype) * 1e-8) if has_lines else Hll_d

        lam_diag_c = lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-8
        lam_diag_p = lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-8
        lam_diag_l = lam * jnp.diagonal(Hll, axis1=-2, axis2=-1) + 1e-8

        def matvec(xc, xp, xl):
            xc = xc * free_cam[:, None]
            xp = xp * prob.point_mask[:, None]
            u = jnp.einsum("mri,mi->mr", Jc, xc[prob.obs_cam]) + jnp.einsum(
                "mri,mi->mr", Jp, xp[prob.obs_pt]
            )
            u = u * wr
            yc = seg_c(jnp.einsum("mri,mr->mi", Jc, u))
            yp = seg_p(jnp.einsum("mri,mr->mi", Jp, u))
            if has_lines:
                xl_m = xl * prob.line_mask[:, None]
                ul = jnp.einsum("mri,mi->mr", lJc, xc[prob.lobs_cam]) + jnp.einsum(
                    "mri,mi->mr", lJl, xl_m[prob.lobs_line]
                )
                ul = ul * lwr
                yc = yc + seg_lc(jnp.einsum("mri,mr->mi", lJc, ul))
                yl = seg_ll(jnp.einsum("mri,mr->mi", lJl, ul)) \
                    + lam_diag_l * xl_m
            else:
                yl = xl
            yc = (yc + lam_diag_c * xc) * free_cam[:, None]
            yp = (yp + lam_diag_p * xp) * prob.point_mask[:, None]
            return yc, yp, yl

        def precond(rc, rp, rl):
            zc = jnp.einsum("kij,kj->ki", Mc, rc) * free_cam[:, None]
            zp = jnp.einsum("pij,pj->pi", Mp, rp) * prob.point_mask[:, None]
            zl = (
                jnp.einsum("lij,lj->li", Ml_, rl) * prob.line_mask[:, None]
                if has_lines
                else rl
            )
            return zc, zp, zl

        if schur_direct:
            # ---- explicit Schur complement on cameras ----
            # Jacobi (diagonal) scaling, ceres-style: the raw reduction in
            # f32 is numerically fatal — a 1-2-observation landmark leaves
            # its Hpp block near-singular, the exact Hpp^-1 puts ~1/eps
            # magnitudes into U, and the cancellation in Hcc - U destroys
            # positive-definiteness (the PCG path never fully converges
            # those null directions, which is why it tolerated this).
            # Scaling every parameter block to unit diagonal bounds the
            # scaled Hpp's condition number by ~1/lam and keeps every
            # S entry O(1), well inside f32's 7 digits.
            # exact per-segment assembly (see seg_*_x above): both sides
            # of the reduction must be eps-accurate or the reduced
            # system's small (~lam) eigenvalues drown in assembly noise
            bc_x = -seg_c_x(jnp.einsum("mri,mr->mi", Jc, wr * res))
            Hcc_x = seg_c_x(jnp.einsum("mri,mr,mrj->mij", Jc, wr, Jc))
            bp_x = -seg_p_x(jnp.einsum("mri,mr->mi", Jp, wr * res)) \
                * prob.point_mask[:, None]
            Hpp_x = seg_p_x(jnp.einsum("mri,mr,mrj->mij", Jp, wr, Jp))
            if has_lines:
                bc_x = bc_x - seg_lc_x(
                    jnp.einsum("mri,mr->mi", lJc, lwr * lres))
                Hcc_x = Hcc_x + seg_lc_x(
                    jnp.einsum("mri,mr,mrj->mij", lJc, lwr, lJc))
                bl_x = -seg_ll_x(jnp.einsum(
                    "mri,mr->mi", lJl, lwr * lres)) \
                    * prob.line_mask[:, None]
                Hll_x = seg_ll_x(jnp.einsum(
                    "mri,mr,mrj->mij", lJl, lwr, lJl))
                Hll_dx = damped(Hll_x, 6)
            else:
                bl_x = bl
            bc_x = bc_x * free_cam[:, None]
            Hcc_dx = damped(Hcc_x, 6)
            Hpp_dx = damped(Hpp_x, 3)
            dc = jax.lax.rsqrt(jnp.clip(
                jnp.diagonal(Hcc_dx, axis1=-2, axis2=-1), 1e-12, None))
            dp = jax.lax.rsqrt(jnp.clip(
                jnp.diagonal(Hpp_dx, axis1=-2, axis2=-1), 1e-12, None))
            A = Hcc_dx * dc[:, :, None] * dc[:, None, :]
            B = Hpp_dx * dp[:, :, None] * dp[:, None, :]
            # f32 inv of a near-singular block carries an ASYMMETRIC error
            # ~cond*eps; U = Y Mp Y^T then loses symmetry and S loses
            # positive-definiteness (measured: 0.1 asymmetry, -0.1 min
            # eigenvalue, NaN Cholesky). Symmetrize the inverses and ridge
            # the reduced system by a hair above the roundoff floor.
            Mp_s = jnp.linalg.inv(B)
            Mp_s = 0.5 * (Mp_s + jnp.swapaxes(Mp_s, -1, -2))
            # dense coupling tensors Y[p, k] = sum_m J_c^T W J_p over the
            # observations of point p in camera k (zero where unobserved)
            Y = seg_cp(jnp.einsum("mra,mr,mrb->mab", Jc, wr, Jp)
                       .reshape(-1, 18)).reshape(P, K, 6, 3) \
                * dc[None, :, :, None] * dp[:, None, None, :]
            T = jnp.einsum("pkac,pcd->pkad", Y, Mp_s)     # Y~ B~^-1
            U = jnp.einsum("pkad,plbd->kalb", T, Y)       # [K,6,K,6]
            if has_lines:
                dl = jax.lax.rsqrt(jnp.clip(
                    jnp.diagonal(Hll_dx, axis1=-2, axis2=-1), 1e-12, None))
                Bl = Hll_dx * dl[:, :, None] * dl[:, None, :]
                Ml_s = jnp.linalg.inv(Bl)
                Ml_s = 0.5 * (Ml_s + jnp.swapaxes(Ml_s, -1, -2))
                Yl = seg_cl(jnp.einsum("mra,mr,mrb->mab", lJc, lwr, lJl)
                            .reshape(-1, 36)).reshape(L, K, 6, 6) \
                    * dc[None, :, :, None] * dl[:, None, None, :]
                Tl = jnp.einsum("lkab,lbc->lkac", Yl, Ml_s)
                U = U + jnp.einsum("lkac,lnbc->kanb", Tl, Yl)
            ar = jnp.arange(K)
            S = (-U).at[ar, :, ar, :].add(A).reshape(K * 6, K * 6)
            S = 0.5 * (S + S.T) \
                + 1e-4 * jnp.eye(K * 6, dtype=S.dtype)
            # gauge/fixed cameras: zero their rows+cols, unit diagonal so
            # the factorization stays PD and their solution is exactly 0
            ff = jnp.repeat(free_cam.astype(S.dtype), 6)
            S = S * ff[:, None] * ff[None, :] \
                + jnp.diag(1.0 - ff)
            cf = jax.scipy.linalg.cho_factor(S)

            def schur_solve(rc, rp, rl):
                """Approximate (H + lam D)^-1 via the factorized reduced
                system (forward-reduce, camera solve, back-substitute)."""
                rc_s = rc * dc
                rp_s = rp * dp
                rt = rc_s - jnp.einsum("pkad,pd->ka", T, rp_s)
                if has_lines:
                    rl_s = rl * dl
                    rt = rt - jnp.einsum("lkab,lb->ka", Tl, rl_s)
                xc_s = jax.scipy.linalg.cho_solve(
                    cf, rt.reshape(K * 6) * ff).reshape(K, 6) \
                    * free_cam[:, None]
                xc = xc_s * dc
                xp = dp * jnp.einsum(
                    "pcd,pd->pc", Mp_s,
                    rp_s - jnp.einsum("pkac,ka->pc", Y, xc_s)) \
                    * prob.point_mask[:, None]
                if has_lines:
                    xl = dl * jnp.einsum(
                        "lcd,ld->lc", Ml_s,
                        rl_s - jnp.einsum("lkac,ka->lc", Yl, xc_s)) \
                        * prob.line_mask[:, None]
                else:
                    xl = rl
                return xc, xp, xl

            # PCG against the EXACT matrix-free operator, preconditioned by
            # the factorized reduced system: the f32 factorization carries
            # ~1e-2 relative error through the inv/cancellation chain
            # (enough to spoil a raw direct step — measured first-step
            # rejection), but as a PRECONDITIONER it only has to be close:
            # with it, CG contracts in a handful of iterations instead of
            # the 20 that block-Jacobi needs, and monotone A-norm descent
            # is guaranteed regardless of the factorization's error.
            def dot_s(a, b):
                return sum(jnp.vdot(x_, y_) for x_, y_ in zip(a, b))

            b_rhs = (bc_x, bp_x, bl_x)
            x0 = tuple(jnp.zeros_like(v) for v in b_rhs)
            z0 = schur_solve(*b_rhs)
            rz0 = dot_s(b_rhs, z0)

            def spcg_body(state):
                x, r, p, rz, i = state
                Ap = matvec(*p)
                pAp = dot_s(p, Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
                r = tuple(ri - alpha * Ai for ri, Ai in zip(r, Ap))
                z = schur_solve(*r)
                rz_new = dot_s(r, z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                p = tuple(zi + beta * pi for zi, pi in zip(z, p))
                return (x, r, p, rz_new, i + 1)

            n_spcg = jnp.minimum(jnp.asarray(cg_iters, jnp.int32), 10)
            x, _, _, _, _ = jax.lax.while_loop(
                lambda s: (s[4] < n_spcg) & (s[3] > 1e-12 * rz0),
                spcg_body, (x0, b_rhs, z0, rz0, jnp.zeros((), jnp.int32)),
            )
            dxc, dxp, dxl = x
        else:
            # ---- PCG ----
            def dot(a, b):
                return sum(jnp.vdot(x, y) for x, y in zip(a, b))

            x0 = (jnp.zeros_like(bc), jnp.zeros_like(bp), jnp.zeros_like(bl))
            r0 = (bc, bp, bl)
            z0 = precond(*r0)
            p0 = z0
            rz0 = dot(r0, z0)

            def cg_body(state):
                x, r, p, rz, i = state
                Ap = matvec(*p)
                pAp = dot(p, Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                x = tuple(xi + alpha * pi for xi, pi in zip(x, p))
                r = tuple(ri - alpha * Api for ri, Api in zip(r, Ap))
                z = precond(*r)
                rz_new = dot(r, z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                p = tuple(zi + beta * pi for zi, pi in zip(z, p))
                return (x, r, p, rz_new, i + 1)

            # stop once the preconditioned residual has dropped 6 orders of
            # magnitude — every CG iteration is a sequential launch-bound
            # matvec on TPU, so converged iterations are pure latency
            x, _, _, _, _ = jax.lax.while_loop(
                lambda s: (s[4] < cg_iters) & (s[3] > 1e-12 * rz0),
                cg_body, (x0, r0, p0, rz0, jnp.zeros((), jnp.int32)),
            )
            dxc, dxp, dxl = x

        # ---- apply & accept/reject ----
        dR, dt = lie.se3_exp(dxc)
        Rn = lie.normalize_rotation(dR @ R)
        tn = jnp.einsum("kij,kj->ki", dR, t) + dt
        pn = points + dxp
        lXsn = lXs + dxl[..., :3] if has_lines else lXs
        lXen = lXe + dxl[..., 3:] if has_lines else lXe

        cost_new = cost_fn(Rn, tn, pn, lXsn, lXen)
        accept = cost_new < cost_prev
        R = jnp.where(accept, Rn, R)
        t = jnp.where(accept, tn, t)
        points = jnp.where(accept, pn, points)
        if has_lines:
            lXs = jnp.where(accept, lXsn, lXs)
            lXe = jnp.where(accept, lXen, lXe)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-7), jnp.minimum(lam * 4.0, 1e4))
        # an accepted step with negligible relative improvement means LM has
        # converged; a rejected step keeps iterating with raised damping
        done = accept & (cost_prev - cost_new < 1e-6 * cost_prev)
        cost_prev = jnp.where(accept, cost_new, cost_prev)
        return R, t, points, lXs, lXe, lam, cost_prev, done

    cost0 = cost_fn(prob.R, prob.t, prob.points, prob.lines_Xs, prob.lines_Xe)
    init = (prob.R, prob.t, prob.points, prob.lines_Xs, prob.lines_Xe,
            jnp.asarray(lam0, prob.R.dtype), cost0,
            jnp.zeros((), jnp.int32), jnp.zeros((), bool))

    def lm_body(state):
        R, t, points, lXs, lXe, lam, cost_prev, i, _ = state
        out = lm_step((R, t, points, lXs, lXe, lam, cost_prev))
        R, t, points, lXs, lXe, lam, cost_prev, done = out
        return (R, t, points, lXs, lXe, lam, cost_prev, i + 1, done)

    (R, t, points, lXs, lXe, lam, cost, _, _) = jax.lax.while_loop(
        lambda s: (s[7] < num_iters) & ~s[8], lm_body, init,
    )
    info = {"cost0": cost0, "cost": cost, "lam": lam}
    return R, t, points, lXs, lXe, info


# one compiled program per (shape-bucket, iteration config): the whole LM
# solve is a single device dispatch — essential when the accelerator is
# reached through a network tunnel (each eager primitive would pay a round
# trip) and free otherwise
# ``num_iters`` / ``cg_iters`` are DYNAMIC (they only bound while_loops),
# so every iteration-count variant — the abort-chunked 3/2/1-iteration
# local solves, the 10-iteration global BA — shares ONE compiled program
# per shape bucket instead of recompiling the whole LM graph per count
# (a mid-sequence compile on the tunnel backend costs seconds and lands
# in the tracker's critical path)
bundle_adjust_jit = jax.jit(
    bundle_adjust,
    static_argnames=("cam", "lam0", "line_weight",
                     "scatter_free", "schur_direct"),
)
