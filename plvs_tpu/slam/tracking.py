"""Tracking front end: motion-model / local-map tracking + keyframe policy.

TPU-native re-derivation of the reference's Tracking thread
(reference: src/Tracking.cc — Track() at :2097, TrackWithMotionModel
:2282, TrackLocalMap :3761, NeedNewKeyFrame :3938). Device work (guided
matching + pose optimization) is jitted with fixed capacities; the state
machine and map bookkeeping live on the host in plain Python/numpy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..features import matching, orb
from ..geometry import cameras as cam_mod
from ..geometry import lie
from ..solvers import pose_opt
from . import frame as frame_mod
from .map_store import MapStore

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3
# tracking against a loaded (reused) map: relocalize before anything else
# (reference: Tracking::RELOCALIZE_IN_LOADED_MAP include/Tracking.h:171-181,
# entered when SparseMapping.reuseMap + forceRelocalization,
# src/System.cc:353-356)
RELOCALIZE_IN_LOADED_MAP = 4
# grace period after a tracking failure on a mature map: keep publishing a
# predicted pose (IMU/motion-model coasting) and attempt relocalization each
# frame; falls to LOST after time_recently_lost seconds (reference:
# Tracking::RECENTLY_LOST include/Tracking.h:176, 5s deadline
# src/Tracking.cc:86, coasting via PredictStateIMU src/Tracking.cc:2318)
RECENTLY_LOST = 5


def _point_view_gates(cam, R_pred, t_pred, pts_xyz, pts_normal,
                      pts_min_dist, pts_max_dist, pts_octave,
                      scale: float, n_levels: int = 8):
    """Scale-invariance distance + viewing-angle gates and predicted octave
    (reference: the mnTrackScaleLevel / viewing-cos checks of
    Frame::isInVisible + SearchByProjection, src/ORBmatcher.cc — map points
    are only matched when the camera sits inside the landmark's scale
    distance band and views it within 60 degrees of its normal).

    Points without maintained stats (max_dist == 0) pass through ungated.
    Returns (gate_ok [M], pred_octave [M])."""
    C = -jnp.einsum("ji,j->i", R_pred, t_pred)
    dvec = pts_xyz - C
    dist = jnp.linalg.norm(dvec, axis=-1)
    dist_safe = jnp.maximum(dist, 1e-6)
    has_range = pts_max_dist > 1e-6
    dist_ok = (~has_range) | ((dist >= 0.8 * pts_min_dist)
                              & (dist <= 1.2 * pts_max_dist))
    nn = jnp.linalg.norm(pts_normal, axis=-1)
    has_norm = nn > 0.5
    view_cos = jnp.sum(dvec * pts_normal, axis=-1) / dist_safe
    view_ok = (~has_norm) | (view_cos > 0.5)
    ratio = jnp.maximum(pts_max_dist, 1e-6) / dist_safe
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-6)) / jnp.log(scale))
    pred_oct = jnp.where(
        has_range,
        jnp.clip(lvl, 0, n_levels - 1).astype(jnp.int32),
        pts_octave,
    )
    return dist_ok & view_ok, pred_oct


@functools.partial(jax.jit, static_argnames=("cam", "check_rotation"))
def _match_and_optimize(
    cam,
    R_pred,
    t_pred,
    pts_xyz,      # [M, 3] candidate map points (padded)
    pts_desc,     # [M, 8]
    pts_octave,   # [M]
    pts_valid,    # [M]
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
    radius: float,
    scale: float = 1.2,
    pts_normal=None, pts_min_dist=None, pts_max_dist=None,
    pts_angle=None, kp_angle=None, check_rotation: bool = False,
    prior_info=None, prior_R=None, prior_t=None,
):
    """Project candidates into predicted pose, guided-match, pose-optimize.

    ``prior_info`` [6,6]: information of an SE3 prior at (prior_R, prior_t)
    (defaults to the prediction) — the per-frame marginalized-IMU term
    (see pose_opt.pose_optimize).

    Returns (R, t, match_idx [M] (-1=none), n_inliers, kp_inlier [N]).
    """
    uv, z, vis = frame_mod.project_points(cam, R_pred, t_pred, pts_xyz)
    if pts_max_dist is not None:
        gate_ok, pred_oct = _point_view_gates(
            cam, R_pred, t_pred, pts_xyz, pts_normal, pts_min_dist,
            pts_max_dist, pts_octave, scale)
        vis = vis & gate_ok
        pts_octave = pred_oct
    r = radius * (scale ** pts_octave.astype(jnp.float32))
    idx, dist = matching.search_by_projection(
        uv, vis & pts_valid, pts_desc, pts_octave,
        kp_xy, kp_desc, kp_octave, kp_mask,
        radius=r,
        kp_angle=kp_angle, map_angle=pts_angle,
        check_rotation=check_rotation,
    )
    matched = idx >= 0
    # per-keypoint association: scatter map-point row index into keypoint
    # slots; unmatched rows target index n_kp, dropped by mode="drop"
    # (note: -1 would WRAP in jax indexing, so it must be mapped out of range)
    n_kp = kp_xy.shape[0]
    kp_pt = jnp.full((n_kp,), -1, jnp.int32)
    src = jnp.arange(idx.shape[0], dtype=jnp.int32)
    tgt = jnp.where(matched, idx, n_kp)
    kp_pt = kp_pt.at[tgt].set(src, mode="drop")

    obs_mask = kp_pt >= 0
    Xw = pts_xyz[jnp.clip(kp_pt, 0, pts_xyz.shape[0] - 1)]
    obs = pose_opt.make_pose_obs(
        Xw, kp_uvr, kp_inv_sigma2, obs_mask & kp_mask
    )
    if prior_info is not None and prior_R is None:
        prior_R, prior_t = R_pred, t_pred
    R, t, inl, _, n_inl = pose_opt.pose_optimize(
        cam, R_pred, t_pred, obs,
        prior_R=None if prior_info is None else prior_R,
        prior_t=None if prior_info is None else prior_t,
        prior_info=prior_info)
    return R, t, idx, n_inl, inl & obs_mask, kp_pt


@functools.partial(jax.jit, static_argnames=("cam", "check_rotation"))
def _match_and_optimize_pl(
    cam,
    R_pred,
    t_pred,
    pts_xyz, pts_desc, pts_octave, pts_valid,
    ln_Xs, ln_Xe, ln_desc, ln_valid,
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
    kl_sp, kl_ep, kl_desc, kl_mask,
    radius: float,
    scale: float = 1.2,
    line_weight: float = 1.0,
    theta_tol: float = 0.08,
    d_tol: float = 20.0,
    pts_normal=None, pts_min_dist=None, pts_max_dist=None,
    pts_angle=None, kp_angle=None, check_rotation: bool = False,
    prior_info=None, prior_R=None, prior_t=None,
):
    """Joint point+line guided matching and pose optimization.

    The reference's TrackLocalMap runs SearchLocalPoints AND
    SearchLocalLines before ONE PoseOptimization whose graph carries both
    point and line unary edges (reference: src/Tracking.cc:3761-3797,
    src/Optimizer.cc:2375 with line edges from
    include/OptimizableLineTypes.h:58-244). Here both association passes
    and the joint solve are a single jitted program.

    Returns (R, t, n_inliers, kp_pt_local [N], kl_ln_local [Nl]) where the
    association arrays hold candidate-row indices (-1 = none) already
    pruned to pose-solve inliers.
    """
    from ..features import lines as lines_mod
    from ..features.matching import hamming, _masked_best2

    # -- point association (identical gating to _match_and_optimize) -------
    uv, z, vis = frame_mod.project_points(cam, R_pred, t_pred, pts_xyz)
    if pts_max_dist is not None:
        gate_ok, pred_oct = _point_view_gates(
            cam, R_pred, t_pred, pts_xyz, pts_normal, pts_min_dist,
            pts_max_dist, pts_octave, scale)
        vis = vis & gate_ok
        pts_octave = pred_oct
    r = radius * (scale ** pts_octave.astype(jnp.float32))
    idx, dist = matching.search_by_projection(
        uv, vis & pts_valid, pts_desc, pts_octave,
        kp_xy, kp_desc, kp_octave, kp_mask,
        radius=r,
        kp_angle=kp_angle, map_angle=pts_angle,
        check_rotation=check_rotation,
    )
    matched = idx >= 0
    n_kp = kp_xy.shape[0]
    kp_pt = jnp.full((n_kp,), -1, jnp.int32)
    src = jnp.arange(idx.shape[0], dtype=jnp.int32)
    tgt = jnp.where(matched, idx, n_kp)
    kp_pt = kp_pt.at[tgt].set(src, mode="drop")

    # -- line association ((theta, d) window like _match_lines) ------------
    Xs_c = lie.se3_apply(R_pred, t_pred, ln_Xs)
    Xe_c = lie.se3_apply(R_pred, t_pred, ln_Xe)
    uv_s = cam_mod.project(cam, Xs_c)
    uv_e = cam_mod.project(cam, Xe_c)
    front = (Xs_c[..., 2] > 0.05) & (Xe_c[..., 2] > 0.05)
    in_img = (cam_mod.in_image(cam, uv_s, -40.0)
              | cam_mod.in_image(cam, uv_e, -40.0))
    th_p, d_p = lines_mod.line_theta_d(uv_s, uv_e)
    th_m, d_m = lines_mod.line_theta_d(kl_sp, kl_ep)
    dth = jnp.abs(th_p[:, None] - th_m[None, :])
    dth = jnp.minimum(dth, jnp.pi - dth)
    dd = jnp.abs(d_p[:, None] - d_m[None, :])
    # extent overlap along the measured segment's direction: a measured
    # (theta, d) only describes the infinite line near the detected pixels;
    # matching a landmark whose projection lies elsewhere along that line
    # extrapolates the theta noise over a long lever arm (reference:
    # LineProjection clipping, include/LineProjection.h)
    mdir = kl_ep - kl_sp
    mlen = jnp.linalg.norm(mdir, axis=-1)
    mdirn = mdir / jnp.maximum(mlen, 1e-6)[..., None]
    t_ms = jnp.sum(mdirn * kl_sp, -1)
    t_me = jnp.sum(mdirn * kl_ep, -1)
    m_lo = jnp.minimum(t_ms, t_me)
    m_hi = jnp.maximum(t_ms, t_me)
    t_ps = jnp.einsum("md,pd->pm", mdirn, uv_s)
    t_pe = jnp.einsum("md,pd->pm", mdirn, uv_e)
    p_lo = jnp.minimum(t_ps, t_pe)
    p_hi = jnp.maximum(t_ps, t_pe)
    overlap = (jnp.minimum(p_hi, m_hi[None]) - jnp.maximum(p_lo, m_lo[None]))
    ov_ok = overlap > jnp.maximum(8.0, 0.3 * mlen[None])
    lcand = (
        (dth < theta_tol) & (dd < d_tol) & ov_ok
        & (ln_valid & front & in_img)[:, None] & kl_mask[None, :]
    )
    # descriptor gate + ratio test: repeated parallel structure (the common
    # failure mode of line SLAM) is ambiguous and must be dropped, not
    # force-matched (reference: LineMatcher's nn-ratio checks)
    ldist = hamming(ln_desc, kl_desc)
    lbest, lsecond, lidx = _masked_best2(ldist, lcand)
    lok = (lbest <= 100) & (
        lbest.astype(jnp.float32) <= 0.85 * lsecond.astype(jnp.float32))
    n_kl = kl_sp.shape[0]
    kl_ln = jnp.full((n_kl,), -1, jnp.int32)
    lsrc = jnp.arange(lidx.shape[0], dtype=jnp.int32)
    ltgt = jnp.where(lok, lidx, n_kl)
    kl_ln = kl_ln.at[ltgt].set(lsrc, mode="drop")

    # -- joint pose optimization -------------------------------------------
    obs_mask = kp_pt >= 0
    Xw = pts_xyz[jnp.clip(kp_pt, 0, pts_xyz.shape[0] - 1)]
    l_mask = kl_ln >= 0
    l_safe = jnp.clip(kl_ln, 0, ln_Xs.shape[0] - 1)
    nld = lines_mod.line_nld(kl_sp, kl_ep)
    # information scales with measured segment length: the infinite-line
    # estimate's angular noise grows as the support shrinks (reference
    # weights line edges by length via the pyramid sigma of the keyline)
    l_is2 = jnp.clip((mlen / 40.0) ** 2, 0.1, 4.0)
    obs = pose_opt.make_pose_obs(
        Xw, kp_uvr, kp_inv_sigma2, obs_mask & kp_mask,
        line_Xs=ln_Xs[l_safe], line_Xe=ln_Xe[l_safe], line_nld=nld,
        line_inv_sigma2=l_is2,
        line_mask=l_mask & kl_mask,
    )
    if prior_info is not None and prior_R is None:
        prior_R, prior_t = R_pred, t_pred
    R, t, inl, l_inl, n_inl = pose_opt.pose_optimize(
        cam, R_pred, t_pred, obs, line_weight=line_weight,
        prior_R=None if prior_info is None else prior_R,
        prior_t=None if prior_info is None else prior_t,
        prior_info=prior_info)
    kp_pt = jnp.where(inl & obs_mask, kp_pt, -1)
    kl_ln = jnp.where(l_inl & l_mask, kl_ln, -1)
    return R, t, n_inl, kp_pt, kl_ln


@functools.partial(jax.jit, static_argnames=("cam", "check_rotation"))
def _track_frame_fused_pts(  # noqa: C901
    cam, R_pred, t_pred,
    b1, b2,              # step-1 / step-2 point blocks (tuples from gather)
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2, kp_angle,
    check_rotation: bool = False,
    prior_info=None,
):
    """Whole visual tracking step in ONE dispatch: motion-model projection
    match + pose solve against last frame's points (with the on-device
    wide-radius retry the reference does by doubling the window), then the
    local-map match + pose solve — the per-frame host<->device round trips
    collapse from two to one, which through a remote accelerator tunnel
    (~26 ms/round-trip) is the difference between 15 and 30+ fps.
    (reference: TrackWithMotionModel + TrackLocalMap back to back,
    src/Tracking.cc:2282,3761)."""
    xyz1, desc1, oct1, val1, nrm1, mind1, maxd1, ang1 = b1
    xyz2, desc2, oct2, val2, nrm2, mind2, maxd2, ang2 = b2

    def _step1(radius):
        R, t, _idx, n, _inl, _kp = _match_and_optimize(
            cam, R_pred, t_pred, xyz1, desc1, oct1, val1,
            kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
            radius, pts_normal=nrm1, pts_min_dist=mind1, pts_max_dist=maxd1,
            pts_angle=ang1, kp_angle=kp_angle, check_rotation=check_rotation,
            prior_info=prior_info)
        return R, t, n

    R1, t1, n1 = _step1(15.0)
    R1, t1, n1 = jax.lax.cond(
        n1 < 20, lambda: _step1(30.0), lambda: (R1, t1, n1))
    # second widening: a pipelined prediction can be several frames stale
    # (deferred resolution), and under rotation the error is tens of px —
    # 60 px absorbs ~2 frames of unmodeled motion at VGA intrinsics
    R1, t1, n1 = jax.lax.cond(
        n1 < 20, lambda: _step1(60.0), lambda: (R1, t1, n1))

    # the inertial prior stays anchored at the PREDICTED pose in both
    # solves (reference: the marginalized prior is relative to the IMU
    # propagation, not the intermediate visual estimate)
    R2, t2, _idx, n2, kp_inl, kp_pt_local = _match_and_optimize(
        cam, R1, t1, xyz2, desc2, oct2, val2,
        kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
        4.0, pts_normal=nrm2, pts_min_dist=mind2, pts_max_dist=maxd2,
        pts_angle=ang2, kp_angle=kp_angle, check_rotation=check_rotation,
        prior_info=prior_info, prior_R=R_pred, prior_t=t_pred)
    kp_pt_local = jnp.where(kp_inl, kp_pt_local, -1)
    return R2, t2, n1, n2, kp_pt_local


@functools.partial(jax.jit, static_argnames=("cam", "check_rotation"))
def _track_frame_fused_pl(
    cam, R_pred, t_pred,
    b1, b2,
    ln_Xs, ln_Xe, ln_desc, ln_valid,
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2, kp_angle,
    kl_sp, kl_ep, kl_desc, kl_mask,
    line_weight: float = 1.0,
    check_rotation: bool = False,
    prior_info=None,
):
    """Fused tracking step with the joint point+line local-map solve
    (see _track_frame_fused_pts; reference: line edges in the same
    PoseOptimization, src/Optimizer.cc:2375)."""
    xyz1, desc1, oct1, val1, nrm1, mind1, maxd1, ang1 = b1
    xyz2, desc2, oct2, val2, nrm2, mind2, maxd2, ang2 = b2

    def _step1(radius):
        R, t, _idx, n, _inl, _kp = _match_and_optimize(
            cam, R_pred, t_pred, xyz1, desc1, oct1, val1,
            kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
            radius, pts_normal=nrm1, pts_min_dist=mind1, pts_max_dist=maxd1,
            pts_angle=ang1, kp_angle=kp_angle, check_rotation=check_rotation,
            prior_info=prior_info)
        return R, t, n

    R1, t1, n1 = _step1(15.0)
    R1, t1, n1 = jax.lax.cond(
        n1 < 20, lambda: _step1(30.0), lambda: (R1, t1, n1))
    # second widening: a pipelined prediction can be several frames stale
    # (deferred resolution), and under rotation the error is tens of px —
    # 60 px absorbs ~2 frames of unmodeled motion at VGA intrinsics
    R1, t1, n1 = jax.lax.cond(
        n1 < 20, lambda: _step1(60.0), lambda: (R1, t1, n1))

    R2, t2, n2, kp_pt_local, kl_ln_local = _match_and_optimize_pl(
        cam, R1, t1, xyz2, desc2, oct2, val2,
        ln_Xs, ln_Xe, ln_desc, ln_valid,
        kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
        kl_sp, kl_ep, kl_desc, kl_mask,
        4.0, line_weight=line_weight,
        pts_normal=nrm2, pts_min_dist=mind2, pts_max_dist=maxd2,
        pts_angle=ang2, kp_angle=kp_angle, check_rotation=check_rotation,
        prior_info=prior_info, prior_R=R_pred, prior_t=t_pred)
    return R2, t2, n1, n2, kp_pt_local, kl_ln_local


def _block_from_tables(tbl, ids):
    """Device-side candidate gather: landmark tables stay resident on the
    device across frames (re-uploaded only when MapStore.version moves, a
    KF-rate event); the per-frame host->device traffic for tracking is just
    the candidate id vectors. -1 ids become invalid rows."""
    xyz, desc, normal, min_d, max_d, angle, mask = tbl
    safe = jnp.clip(ids, 0, xyz.shape[0] - 1)
    valid = (ids >= 0) & mask[safe]
    octv = jnp.zeros(ids.shape, jnp.int32)
    return (xyz[safe], desc[safe], octv, valid, normal[safe], min_d[safe],
            max_d[safe], angle[safe])


def _pack_track_out(R2, t2, n1, n2, kp_pt_local, kl_ln_local=None):
    """Fuse ALL tracking outputs into one int32 vector: a single
    device->host transfer instead of six (each fresh fetch over the remote
    link pays a flat ~26 ms; concurrency only partially hides it).
    Layout: [R2 bits(9) | t2 bits(3) | n1 | n2 | kp_pt_local | kl_ln_local]."""
    parts = [
        jax.lax.bitcast_convert_type(R2.reshape(-1), jnp.int32),
        jax.lax.bitcast_convert_type(t2, jnp.int32),
        jnp.stack([n1, n2]).astype(jnp.int32),
        kp_pt_local.astype(jnp.int32),
    ]
    if kl_ln_local is not None:
        parts.append(kl_ln_local.astype(jnp.int32))
    return jnp.concatenate(parts)


def _unpack_track_out(buf: np.ndarray, n_kp: int, n_kl: int | None):
    """Host-side inverse of _pack_track_out (buf is fetched numpy)."""
    R2 = buf[:9].view(np.float32).reshape(3, 3).copy()
    t2 = buf[9:12].view(np.float32).copy()
    n1, n2 = int(buf[12]), int(buf[13])
    kp_pt_local = buf[14:14 + n_kp]
    if n_kl is None:
        return R2, t2, n1, n2, kp_pt_local
    kl_ln_local = buf[14 + n_kp: 14 + n_kp + n_kl]
    return R2, t2, n1, n2, kp_pt_local, kl_ln_local


def _unpack_meta(meta, icap: int, lcap: int):
    """[2*icap + lcap + 12] int32 -> (ids12 [2, icap], lids [lcap], R, t).
    One packed upload carries both candidate id sets, the line ids and the
    predicted pose (f32 bits) — one RPC instead of three."""
    ids12 = meta[: 2 * icap].reshape(2, icap)
    lids = meta[2 * icap: 2 * icap + lcap]
    Rt = jax.lax.bitcast_convert_type(meta[2 * icap + lcap:], jnp.float32)
    return ids12, lids, Rt[:9].reshape(3, 3), Rt[9:]


@functools.partial(jax.jit,
                   static_argnames=("cam", "check_rotation", "icap"))
def _track_frame_tables_pts(
    cam, meta, pt_tbl,
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2, kp_angle,
    icap: int = 1024,
    check_rotation: bool = False,
    prior_info=None,
):
    ids12, _, R_pred, t_pred = _unpack_meta(meta, icap, 0)
    b1 = _block_from_tables(pt_tbl, ids12[0])
    b2 = _block_from_tables(pt_tbl, ids12[1])
    R2, t2, n1, n2, kp_pt_local = _track_frame_fused_pts(
        cam, R_pred, t_pred, b1, b2,
        kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2, kp_angle,
        check_rotation=check_rotation, prior_info=prior_info)
    return _pack_track_out(R2, t2, n1, n2, kp_pt_local)


@functools.partial(jax.jit,
                   static_argnames=("cam", "check_rotation", "icap", "lcap"))
def _track_frame_tables_pl(
    cam, meta, pt_tbl, ln_tbl,
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2, kp_angle,
    kl_sp, kl_ep, kl_desc, kl_mask,
    icap: int = 1024, lcap: int = 128,
    line_weight: float = 1.0,
    check_rotation: bool = False,
    prior_info=None,
):
    ids12, lids, R_pred, t_pred = _unpack_meta(meta, icap, lcap)
    b1 = _block_from_tables(pt_tbl, ids12[0])
    b2 = _block_from_tables(pt_tbl, ids12[1])
    Xs_t, Xe_t, ldesc_t, lmask_t = ln_tbl
    lsafe = jnp.clip(lids, 0, Xs_t.shape[0] - 1)
    lvalid = (lids >= 0) & lmask_t[lsafe]
    R2, t2, n1, n2, kp_pt_local, kl_ln_local = _track_frame_fused_pl(
        cam, R_pred, t_pred, b1, b2,
        Xs_t[lsafe], Xe_t[lsafe], ldesc_t[lsafe], lvalid,
        kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2, kp_angle,
        kl_sp, kl_ep, kl_desc, kl_mask,
        line_weight=line_weight, check_rotation=check_rotation,
        prior_info=prior_info)
    return _pack_track_out(R2, t2, n1, n2, kp_pt_local, kl_ln_local)


def _packed_len(h: int, w: int, dec: int = 1) -> int:
    """uint32 words of a packed frame: u8 gray full-res + u16 mm depth at
    1/dec resolution."""
    return h * w // 4 + (h // dec) * (w // dec) // 2


def _decompress_packed(buf, h: int, w: int, dec: int = 1):
    """[_packed_len] uint32 (u8 gray + u16 mm depth, depth decimated by
    ``dec``) -> (gray [h,w] f32, depth [h/dec,w/dec] f32 meters). Depth
    rides the link at 1/dec^2 of the bytes and STAYS decimated — the
    consumers nearest-sample it by index scaling. Fresh-content upload
    bandwidth (~37 MB/s measured through the tunnel, NOT the
    cached-content probe number) is the per-frame budget."""
    n8 = h * w // 4
    # PLANE-packed (see system._pack_rgbd): byte p of word j is pixel
    # p*n8+j, so the unpack is four shifts + a MAJOR-axis concat — no
    # lane interleave (an interleaved byte layout costs a ~3.4 ms
    # relayout on the chip; measured)
    w32 = buf[:n8].reshape(1, h // 4, w)
    g8 = jnp.concatenate(
        [(w32 >> (8 * p)) & jnp.uint32(0xFF) for p in range(4)],
        axis=0).reshape(h, w)
    hd, wd = h // dec, w // dec
    wd32 = buf[n8:].reshape(1, hd // 2, wd)
    d16 = jnp.concatenate(
        [wd32 & jnp.uint32(0xFFFF), wd32 >> 16], axis=0).reshape(hd, wd)
    # depth stays DECIMATED [h/dec, w/dec]: the consumers nearest-sample
    # it by index scaling (frame.build_frame_rgbd/_lines), so upsampling
    # here would only buy a lane-interleave relayout
    return (g8.astype(jnp.float32),
            d16.astype(jnp.float32) * jnp.float32(0.001))


@functools.partial(jax.jit, static_argnames=(
    "cam", "h", "w", "num_features", "n_levels", "scale", "max_lines",
    "icap", "lcap", "line_weight", "check_rotation", "dec"))
def _frame_track_rgbd_pl(
    cam, bufs, idx, pt_tbl, ln_tbl,
    h: int, w: int, num_features: int, n_levels: int, scale: float,
    max_lines: int, icap: int, lcap: int,
    line_weight: float = 1.0, check_rotation: bool = False,
    prior_info=None, dec: int = 1,
):
    """THE per-frame RGB-D program: image decompression + ORB extraction +
    line extraction + guided matching + joint pose solve — everything the
    30 Hz hot path does on the device, in ONE executable. Through a remote
    accelerator link the per-PROGRAM latency (not compute: the whole chain
    is ~1 ms of device time) dominates the frame budget, so one executable
    per frame is the difference between ~10 and ~40 fps (reference: the
    whole of Frame construction + Track(), src/Frame.cc:405- +
    src/Tracking.cc:2097, which the reference spreads over 4 CPU threads).

    Returns (packed_track_out, Frame, FrameLines) — the frame snapshots
    stay device-resident; the host fetches them only at keyframe rate.

    ``bufs`` [G, n_img + n_meta]: a WINDOW of frames' packed
    [image words | meta words] rows stacked into ONE upload, ``idx``
    selecting this frame's row. Fresh-content upload bandwidth through the
    tunnel (~37 MB/s measured) is the per-frame budget, so images ship
    quantized with decimated depth, and execution is deferred until the
    first await anyway — the pipeline uploads the whole in-flight window
    at once at resolve time."""
    n_img = _packed_len(h, w, dec)
    buf_all = bufs[idx]
    gray, depth = _decompress_packed(buf_all[:n_img], h, w, dec)
    meta = jax.lax.bitcast_convert_type(buf_all[n_img:], jnp.int32)
    fr = frame_mod.build_frame_rgbd(gray, depth, cam, num_features,
                                    n_levels, scale)
    fl = frame_mod.build_frame_lines(gray, depth, cam, max_lines)
    ids12, lids, R_pred, t_pred = _unpack_meta(meta, icap, lcap)
    b1 = _block_from_tables(pt_tbl, ids12[0])
    b2 = _block_from_tables(pt_tbl, ids12[1])
    Xs_t, Xe_t, ldesc_t, lmask_t = ln_tbl
    lsafe = jnp.clip(lids, 0, Xs_t.shape[0] - 1)
    lvalid = (lids >= 0) & lmask_t[lsafe]
    R2, t2, n1, n2, kp_pt_local, kl_ln_local = _track_frame_fused_pl(
        cam, R_pred, t_pred, b1, b2,
        Xs_t[lsafe], Xe_t[lsafe], ldesc_t[lsafe], lvalid,
        fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr,
        fr.inv_sigma2, fr.kp.angle,
        fl.kl.sp, fl.kl.ep, fl.kl.desc, fl.kl.mask,
        line_weight=line_weight, check_rotation=check_rotation,
        prior_info=prior_info)
    out = _pack_track_out(R2, t2, n1, n2, kp_pt_local, kl_ln_local)
    return out, fr, fl


@functools.partial(jax.jit, static_argnames=(
    "cam", "h", "w", "num_features", "n_levels", "scale", "icap",
    "check_rotation", "dec"))
def _frame_track_rgbd_pts(
    cam, bufs, idx, pt_tbl,
    h: int, w: int, num_features: int, n_levels: int, scale: float,
    icap: int, check_rotation: bool = False,
    prior_info=None, dec: int = 1,
):
    """Points-only variant of _frame_track_rgbd_pl (lines off)."""
    n_img = _packed_len(h, w, dec)
    buf_all = bufs[idx]
    gray, depth = _decompress_packed(buf_all[:n_img], h, w, dec)
    meta = jax.lax.bitcast_convert_type(buf_all[n_img:], jnp.int32)
    fr = frame_mod.build_frame_rgbd(gray, depth, cam, num_features,
                                    n_levels, scale)
    ids12, _, R_pred, t_pred = _unpack_meta(meta, icap, 0)
    b1 = _block_from_tables(pt_tbl, ids12[0])
    b2 = _block_from_tables(pt_tbl, ids12[1])
    R2, t2, n1, n2, kp_pt_local = _track_frame_fused_pts(
        cam, R_pred, t_pred, b1, b2,
        fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr,
        fr.inv_sigma2, fr.kp.angle,
        check_rotation=check_rotation, prior_info=prior_info)
    out = _pack_track_out(R2, t2, n1, n2, kp_pt_local)
    return out, fr


@functools.partial(jax.jit, static_argnames=("cam",))
def _match_lines(
    cam,
    R, t,
    ln_Xs, ln_Xe,        # [M, 3] candidate 3D line endpoints (padded)
    ln_desc, ln_valid,   # [M, 8], [M]
    kl_sp, kl_ep, kl_desc, kl_mask,  # frame keylines
    theta_tol: float = 0.12,
    d_tol: float = 40.0,
):
    """Guided line matching: project line landmarks, gate by the (theta, d)
    window of the measured keylines, pick best Hamming match (reference:
    LineMatcher::SearchByProjection with Line2DRepresentation windows,
    src/LineMatcher.cc)."""
    from ..features import lines as lines_mod
    from ..features.matching import hamming, _masked_best2

    Xs_c = lie.se3_apply(R, t, ln_Xs)
    Xe_c = lie.se3_apply(R, t, ln_Xe)
    uv_s = cam_mod.project(cam, Xs_c)
    uv_e = cam_mod.project(cam, Xe_c)
    front = (Xs_c[..., 2] > 0.05) & (Xe_c[..., 2] > 0.05)
    in_img = cam_mod.in_image(cam, uv_s, -40.0) | cam_mod.in_image(cam, uv_e, -40.0)
    th_p, d_p = lines_mod.line_theta_d(uv_s, uv_e)
    th_m, d_m = lines_mod.line_theta_d(kl_sp, kl_ep)
    dth = jnp.abs(th_p[:, None] - th_m[None, :])
    dth = jnp.minimum(dth, jnp.pi - dth)
    dd = jnp.abs(d_p[:, None] - d_m[None, :])
    cand = (
        (dth < theta_tol) & (dd < d_tol)
        & (ln_valid & front & in_img)[:, None] & kl_mask[None, :]
    )
    dist = hamming(ln_desc, kl_desc)
    best, second, idx = _masked_best2(dist, cand)
    ok = best <= 110
    # per-keyline association (scatter; -1 mapped out of range)
    n_kl = kl_sp.shape[0]
    kl_ln = jnp.full((n_kl,), -1, jnp.int32)
    src = jnp.arange(idx.shape[0], dtype=jnp.int32)
    tgt = jnp.where(ok, idx, n_kl)
    kl_ln = kl_ln.at[tgt].set(src, mode="drop")
    return kl_ln


@dataclasses.dataclass
class TrackResult:
    state: int
    R: np.ndarray
    t: np.ndarray
    n_inliers: int
    kp_pt_id: np.ndarray  # [N] global map-point id per keypoint (-1 none)
    is_keyframe: bool = False
    kf_id: int = -1
    kl_ln_id: np.ndarray | None = None  # [Nl] line-landmark id per keyline


class Tracker:
    """Host-side tracking state machine (RGB-D / stereo-from-depth v1)."""

    def __init__(self, cam: cam_mod.Camera, store: MapStore,
                 num_features: int = 1024, local_pts_cap: int = 4096,
                 min_kf_inliers: int = 30, kf_ratio: float = 0.75,
                 max_kf_interval: int = 10, max_depth_factor: float = 40.0,
                 use_lines: bool = False, local_lines_cap: int = 512,
                 kfdb=None, sensor: str = "rgbd",
                 new_map_after_lost: int = 0,
                 fov_centers_kf: bool = False,
                 max_fov_centers_distance: float = 0.4,
                 min_init_pts: int = 300,
                 line_track_weight: float = 2.0):
        self.cam = cam
        self.store = store
        self._tbl_cache = None  # device-resident landmark tables
        # deferred-resolution pipeline (set via System/SystemConfig): fused
        # solves are fetched up to pipeline_depth frames late, in ONE
        # stacked device->host transfer per drain — the remote link charges
        # a flat ~30-90 ms per fresh fetch regardless of size, so fetch
        # FREQUENCY is the frame-rate budget
        self.pipelined = False
        self.pipeline_depth = 1
        self._pending = []
        # double-buffered resolve: the window's stacked device->host fetch
        # runs on a helper thread so group N's device execution + transfer
        # overlaps group N+1's host assembly and group N-1's host finish.
        # ONLY the blocking device_get runs off-thread — every dispatch and
        # every map mutation stays on the tracking thread (a second
        # SUBMITTING thread stalls the single-connection tunnel; measured
        # round 3)
        self.overlap_fetch = False
        self._inflight = []       # [(group, future|None, outs, t_dispatch)]
        self._fetch_pool = None
        # every resolved frame is handed to this callback (the System's
        # post-track path: KF backend, trajectory) no matter which code
        # path triggered the resolution
        self.on_resolved = None
        self.timing = None  # optional list collecting (fetch_s, finish_s, n)
        # pin the landmark-table / candidate capacity buckets high enough
        # that a realistic sequence never crosses one mid-run (set from
        # SystemConfig.backend_fixed_shapes): a bucket crossing recompiles
        # the fused frame program PER GROUP SIZE, and through a remote
        # tunnel each compile is a ~30 s stall; which (group size, bucket)
        # combos the prepass happens to warm is timing-dependent, so the
        # timed pass kept hitting fresh ones (measured, BENCH r4)
        self.fixed_shapes = False
        self.num_features = num_features
        self.local_pts_cap = local_pts_cap
        self.min_kf_inliers = min_kf_inliers
        self.kf_ratio = kf_ratio
        self.max_kf_interval = max_kf_interval
        self.use_lines = use_lines
        self.local_lines_cap = local_lines_cap
        # weight of line edges in the tracking pose solve (reference:
        # Tracking::sknLineTrackWeigth, include/Tracking.h:94)
        self.line_track_weight = line_track_weight
        # rotation-consistency histogram in guided matching (reference:
        # ORBmatcher mbCheckOrientation, on by default)
        self.check_rotation = True
        # pyramid geometry for scale-invariance distance bands
        self.scale = 1.2
        self.n_levels = 8
        # per-frame keyline capacity for the whole-frame fused program
        # (set by the System from SystemConfig.max_lines)
        self.max_keylines = 128
        # depth-upload decimation for the packed fast path (set by the
        # System; fresh-content upload bandwidth is the frame budget)
        self.depth_decimation = 1
        self.kfdb = kfdb  # KeyFrameDatabase, for relocalization
        self.sensor = sensor
        self._init_frame = None  # monocular initializer reference frame
        self._reloc_key = jax.random.PRNGKey(7)
        # reference: ThDepth * baseline gate for close/far points
        self.max_depth = max_depth_factor * (cam.bf / float(cam.params[0]))
        # line endpoints tolerate larger depths (reference:
        # Tracking::skLineStereoMaxDist, include/Tracking.h:95, default 20m)
        self.line_max_depth = max(20.0, 2.0 * self.max_depth)
        self.state = NO_IMAGES_YET
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)  # motion model: T_curr_last
        self.vel_t = np.zeros(3, np.float32)
        # consecutive STRONG resolved frames: while low, the deferred
        # pipeline resolves every frame so the motion model re-anchors
        # before predictions extrapolate a cold/poisoned velocity across a
        # full batch (the observed failure mode on fast rotation)
        self._vel_warm = 0
        self.last_frame = None
        self.last_kp_pt_id = None
        self.ref_kf = -1
        self.ref_kf_npts = 0
        self.frames_since_kf = 0
        self.frame_id = 0
        # multi-map atlas: after this many consecutive lost frames with a
        # mature map, park it and start a fresh one (reference: the 5s
        # relocalization deadline src/Tracking.cc:86 feeding
        # CreateMapInAtlas; 0 disables)
        self.new_map_after_lost = new_map_after_lost
        self.lost_frames = 0
        self.maps_created = 0
        # RECENTLY_LOST grace period (reference: time_recently_lost = 5s,
        # src/Tracking.cc:86); the map must have enough keyframes for the
        # grace state to make sense (reference requires >10 KFs or IMU)
        self.time_recently_lost = 5.0
        self.min_kf_recently_lost = 10
        # set by the System when the inertial runtime is initialized: coast
        # on the motion model during RECENTLY_LOST (reference: IMU-predicted
        # coasting, src/Tracking.cc:2318)
        self.imu_coast = False
        self._lost_ts = 0.0
        # per-frame SE3 pose-prior information at the motion/IMU prediction
        # (set each frame by the inertial runtime once initialized; None =
        # vision-only solve). Reference: the marginalized inertial term of
        # PoseInertialOptimizationLastFrame, src/Optimizer.cc:10137.
        self.prior_info: np.ndarray | None = None
        # localization-only mode: track against the frozen map, never grow it
        # (reference: System::ActivateLocalizationMode ->
        # Tracking::InformOnlyTracking, include/System.h:157-159)
        self.only_tracking = False
        # fov-centers keyframe criterion (reference: Tracking
        # mbUseFovCentersKfGenCriterion include/Tracking.h:96, yaml
        # KeyFrame.fovCentersBasedGeneration.*): force a KF when the camera
        # fov center (point at median depth on the optical axis) moved far
        # from every recent keyframe's fov center
        self.fov_centers_kf = fov_centers_kf
        self.max_fov_centers_distance = max_fov_centers_distance
        self._kf_fov_center: dict[int, np.ndarray] = {}
        # depth-init feature floor (reference: >=500 features at 640x480,
        # src/Tracking.cc:79; scaled for the working resolution)
        self.min_init_pts = min_init_pts

    # ------------------------------------------------------------------
    def process_frame(self, fr: frame_mod.Frame, timestamp: float,
                      fl=None) -> TrackResult:
        if (self._pending or self._inflight) and self.state != OK:
            # deferred solves are outstanding while the state machine left
            # OK (reset/reloc path entered out-of-band): finish them first
            self.resolve_batch(force=True)
        if self.state == RELOCALIZE_IN_LOADED_MAP:
            # never initialize a fresh map: localize in the loaded one
            res = self._relocalize(fr, timestamp)
        elif self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            res = self._initialize(fr, timestamp, fl)
        elif self.state == RECENTLY_LOST:
            res = self._relocalize(fr, timestamp)
            if res.state != OK:
                if self.imu_coast:
                    # keep publishing a predicted pose while the deadline
                    # has not expired (reference: PredictStateIMU coasting)
                    self.R = (self.vel_R @ self.R).astype(np.float32)
                    self.t = (self.vel_R @ self.t + self.vel_t).astype(
                        np.float32)
                if timestamp - self._lost_ts > self.time_recently_lost:
                    self.state = LOST
                res = TrackResult(self.state, self.R, self.t,
                                  res.n_inliers, res.kp_pt_id)
        elif self.state == LOST:
            res = self._relocalize(fr, timestamp)
            if res.state != OK:
                self.lost_frames += 1
                if (self.new_map_after_lost
                        and self.lost_frames >= self.new_map_after_lost
                        and len(self.store.kfs_of_map(
                            self.store.active_map)) >= 5):
                    self._create_map_in_atlas()
            else:
                self.lost_frames = 0
        else:
            res = self._track(fr, timestamp, fl)
            self.lost_frames = 1 if res.state == LOST else 0
        self.last_frame = fr
        self.frame_id += 1
        return res

    # ------------------------------------------------------------------
    def _create_map_in_atlas(self):
        """Park the current map and start a fresh one (reference:
        Tracking::CreateMapInAtlas, include/Tracking.h:147 — the old map
        stays in the Atlas and can be welded back by map merging)."""
        self.store.create_map()
        self.maps_created += 1
        self.state = NOT_INITIALIZED
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self._vel_warm = 0
        self.ref_kf = -1
        self.ref_kf_npts = 0
        self.frames_since_kf = 0
        self.lost_frames = 0
        self._init_frame = None
        self.last_kp_pt_id = None

    # ------------------------------------------------------------------
    def _relocalize(self, fr: frame_mod.Frame, timestamp: float) -> TrackResult:
        """Recover a lost frame against the keyframe database (reference:
        Tracking::Relocalization src/Tracking.cc:4982 — BoW candidates then
        MLPnP RANSAC; with RGB-D depth available the PnP stage becomes a
        3D-3D alignment RANSAC, re-verified by pose optimization)."""
        st = self.store
        empty = np.full((fr.kp.xy.shape[0],), -1, np.int64)
        if self.kfdb is None:
            return TrackResult(self.state, self.R, self.t, 0, empty)
        cands = self.kfdb.relocalization_candidates(
            np.asarray(fr.kp.desc), np.asarray(fr.kp.mask))
        # relocalize only in the active map; other maps are reached through
        # map merging (reference: Relocalization searches the active map)
        cands = [(k, s) for k, s in cands
                 if st.kf_map[k] == st.active_map]
        from ..features.matching import match_nn_ratio
        from ..solvers import sim3_solver

        for kf_id, score in cands:
            idx, _ = match_nn_ratio(
                fr.kp.desc, jnp.asarray(st.kf_kp_desc[kf_id]),
                fr.kp.mask, jnp.asarray(st.kf_kp_mask[kf_id]
                                        & (st.kf_kp_pt[kf_id] >= 0)),
                max_dist=64, ratio=0.85,
            )
            idx = np.asarray(idx)
            depth = np.asarray(fr.depth)
            sel = np.nonzero((idx >= 0) & (depth > 0))[0]
            if len(sel) >= 15:
                P = np.asarray(fr.xyz_cam)[sel]                  # camera frame
                Q = st.pt_xyz[st.kf_kp_pt[kf_id][idx[sel]]]      # world
                self._reloc_key, sub = jax.random.split(self._reloc_key)
                res = sim3_solver.sim3_ransac(
                    jnp.asarray(P), jnp.asarray(Q),
                    jnp.ones((len(sel),), bool),
                    sub, with_scale=False, inlier_thresh=0.10,
                )
                if int(res.n_inliers) < 15:
                    continue
                Rwc = np.asarray(res.R)
                twc = np.asarray(res.t)
                R0 = Rwc.T.astype(np.float32)
                t0 = (-Rwc.T @ twc).astype(np.float32)
            else:
                # no per-keypoint depth (monocular): 2D-3D PnP RANSAC on
                # bearing vectors (reference: MLPnP RANSAC in
                # Tracking::Relocalization src/Tracking.cc:4982-5013)
                from ..geometry import cameras as _cm
                from ..solvers import pnp

                sel = np.nonzero(idx >= 0)[0]
                if len(sel) < 12:
                    continue
                Xw = st.pt_xyz[st.kf_kp_pt[kf_id][idx[sel]]]
                rays = np.asarray(_cm.unproject(
                    self.cam, jnp.asarray(fr.kp.xy[sel])))
                uvn = rays[:, :2] / np.maximum(rays[:, 2:3], 1e-9)
                self._reloc_key, sub = jax.random.split(self._reloc_key)
                res = pnp.pnp_ransac(
                    jnp.asarray(Xw), jnp.asarray(uvn, jnp.float32),
                    jnp.ones((len(sel),), bool), sub,
                    inlier_thresh=4.0 / float(self.cam.fx),
                )
                if int(res.n_inliers) < 12:
                    continue
                R0 = np.asarray(res.R).astype(np.float32)
                t0 = np.asarray(res.t).astype(np.float32)
            # refine with the full local map of the candidate
            covis, _ = st.covisibility(kf_id, min_weight=5)
            window = np.concatenate([[kf_id], covis[:10]])
            pts = st.points_in_kfs(window)
            pts = pts[st.pt_mask[pts]]
            R2, t2, n2, kp_pt2 = self._match_step(fr, R0, t0, pts, radius=8.0)
            if n2 < 30:
                continue
            self.R, self.t = R2, t2
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
            self._vel_warm = 0
            self.state = OK
            self.ref_kf = kf_id
            self.ref_kf_npts = -1
            self.last_kp_pt_id = kp_pt2
            return TrackResult(OK, R2, t2, int(n2), kp_pt2)
        return TrackResult(self.state, self.R, self.t, 0, empty)

    # ------------------------------------------------------------------
    def _initialize(self, fr: frame_mod.Frame, timestamp: float,
                    fl=None) -> TrackResult:
        if self.sensor == "mono":
            return self._initialize_mono(fr, timestamp)
        return self._initialize_depth(fr, timestamp, fl)

    # ------------------------------------------------------------------
    def _initialize_mono(self, fr: frame_mod.Frame, timestamp: float) -> TrackResult:
        """Monocular initialization: two-view reconstruction between a
        reference frame and the current frame (reference:
        Tracking::MonocularInitialization src/Tracking.cc:2235 +
        TwoViewReconstruction; map scaled to median depth 1 like
        CreateInitialMapMonocular)."""
        from ..features.matching import search_for_initialization
        from ..geometry import cameras as _cm
        from ..solvers import two_view

        st = self.store
        empty = np.full((fr.kp.xy.shape[0],), -1, np.int64)
        n_feat = int(np.asarray(fr.kp.mask.sum()))
        if self._init_frame is None:
            if n_feat >= 100:
                self._init_frame = (fr, timestamp)
            return TrackResult(NOT_INITIALIZED, self.R, self.t, 0, empty)
        fr0, ts0 = self._init_frame
        if n_feat < 100:
            self._init_frame = None
            return TrackResult(NOT_INITIALIZED, self.R, self.t, 0, empty)
        idx, _ = search_for_initialization(
            fr0.kp.xy, fr0.kp.desc, fr0.kp.mask,
            fr.kp.xy, fr.kp.desc, fr.kp.mask,
        )
        idx = np.asarray(idx)
        sel = np.nonzero(idx >= 0)[0]
        if len(sel) < 100:
            self._init_frame = (fr, timestamp)  # reference too old; restart
            return TrackResult(NOT_INITIALIZED, self.R, self.t, 0, empty)
        rays0 = _cm.unproject(self.cam, fr0.kp.xy[sel])
        rays1 = _cm.unproject(self.cam, fr.kp.xy[idx[sel]])
        p0 = np.asarray(rays0[:, :2])
        p1 = np.asarray(rays1[:, :2])
        self._reloc_key, sub = jax.random.split(self._reloc_key)
        res = two_view.reconstruct(
            jnp.asarray(p0), jnp.asarray(p1), jnp.ones((len(sel),), bool), sub,
            sigma=1.0 / float(self.cam.fx), min_good=80,
        )
        if not bool(res.success):
            return TrackResult(NOT_INITIALIZED, self.R, self.t, 0, empty)
        inl = np.asarray(res.inliers)
        X = np.asarray(res.points3d)
        # scale: median depth -> 1 (reference: CreateInitialMapMonocular)
        med = float(np.median(X[inl, 2]))
        X = X / max(med, 1e-6)
        t21 = np.asarray(res.t21) / max(med, 1e-6)
        R21 = np.asarray(res.R21)

        # KF0 at identity, KF1 at (R21, t21)
        self.R, self.t = np.eye(3, dtype=np.float32), np.zeros(3, np.float32)
        kf0, _ = self._create_keyframe(fr0, ts0, np.full((fr0.kp.xy.shape[0],), -1))
        pt_ids = st.alloc_pts(int(inl.sum()))
        st.version += 1
        st.pt_xyz[pt_ids] = X[inl]
        st.pt_desc[pt_ids] = np.asarray(fr0.kp.desc)[sel[inl]]
        st.pt_mask[pt_ids] = True
        st.pt_ref_kf[pt_ids] = kf0
        st.pt_first_kf[pt_ids] = kf0
        st.pt_visible[pt_ids] = 1
        st.pt_found[pt_ids] = 1
        st.add_observations(kf0, pt_ids, sel[inl])
        self.R, self.t = R21.astype(np.float32), t21.astype(np.float32)
        kf1, _ = self._create_keyframe(fr, timestamp, empty.copy())
        st.add_observations(kf1, pt_ids, idx[sel[inl]])
        st.kf_kp_pt[kf1, idx[sel[inl]]] = pt_ids

        self.state = OK
        self.ref_kf = kf1
        self.ref_kf_npts = -1
        self.frames_since_kf = 0
        self.last_kp_pt_id = np.asarray(st.kf_kp_pt[kf1]).copy()
        self._init_frame = None
        return TrackResult(OK, self.R, self.t, int(inl.sum()),
                           self.last_kp_pt_id, True, kf1)

    # ------------------------------------------------------------------
    def _initialize_depth(self, fr: frame_mod.Frame, timestamp: float,
                          fl=None) -> TrackResult:
        """RGB-D/stereo initialization: first frame with enough features and
        depth points becomes the map origin (reference:
        Tracking::StereoInitialization, src/Tracking.cc:2231 — the gate is
        on FEATURE count (>= 500 at 640x480); valid stereo depths can be a
        small subset on low-texture scenes and the map still initializes)."""
        n_feat = int(np.asarray(fr.kp.mask.sum()))
        n_depth = int(np.asarray((fr.depth > 0).sum()))
        enough = (n_depth >= self.min_init_pts
                  or (n_feat >= self.min_init_pts and n_depth >= 50))
        if not enough:
            return TrackResult(self.state, self.R, self.t, 0, np.full((fr.kp.xy.shape[0],), -1))
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        kf_id, pt_ids = self._create_keyframe(
            fr, timestamp, np.full((fr.kp.xy.shape[0],), -1), fl, None)
        self.state = OK
        self.ref_kf = kf_id
        self.ref_kf_npts = -1  # baselined on the first tracked frame
        self.frames_since_kf = 0
        kp_pt = np.asarray(self.store.kf_kp_pt[kf_id]).copy()
        self.last_kp_pt_id = kp_pt
        return TrackResult(self.state, self.R, self.t, len(pt_ids), kp_pt, True, kf_id)

    # ------------------------------------------------------------------
    def _assemble_fused(self, use_pl: bool):
        """Candidate/prediction assembly shared by both fused dispatch
        paths (separate-frame and whole-frame-packed). Returns None when
        the fused preconditions fail (no candidates yet)."""
        # motion-model prediction, extrapolated across any unresolved
        # pipeline lag (self.R/vel describe the last RESOLVED frame) —
        # frames awaiting their in-flight fetch count toward the lag too
        lag = 0
        if self.pipelined:
            lag = len(self._pending) + sum(
                len(g) for g, _f, _o in self._inflight)
        R_pred, t_pred = self.R, self.t
        for _ in range(lag + 1):
            t_pred = (self.vel_R @ t_pred + self.vel_t).astype(np.float32)
            R_pred = (self.vel_R @ R_pred).astype(np.float32)
        last_ids = self.last_kp_pt_id
        if last_ids is None:
            return None
        cand = np.unique(last_ids[last_ids >= 0])
        local_pts = self._local_points()
        if len(cand) == 0 or len(local_pts) == 0:
            return None
        cand1 = cand[: self.local_pts_cap]
        cand2 = local_pts[: self.local_pts_cap]
        m2 = len(cand2)
        # ONE packed upload: both candidate id sets + line ids + the
        # predicted pose, assembled host-side (see _unpack_meta)
        icap = self._cap_bucket(max(len(cand1), m2), self.local_pts_cap,
                                lo=2048 if self.fixed_shapes else 512)
        pt_tbl, ln_tbl = self._device_tables()
        Rt_bits = np.concatenate(
            [np.asarray(R_pred, np.float32).ravel(),
             np.asarray(t_pred, np.float32)]).view(np.int32)
        cand_lines = np.zeros((0,), np.int64)
        ml = 0
        lcap = 0
        if use_pl:
            local_lns = self._local_lines()
            lcap = self._cap_bucket(
                max(len(local_lns), 1), self.local_lines_cap, lo=128)
            ml = min(len(local_lns), lcap)
            cand_lines = local_lns[:ml]
            meta = np.full((2 * icap + lcap + 12,), -1, np.int32)
            meta[:len(cand1)] = cand1
            meta[icap: icap + m2] = cand2
            meta[2 * icap: 2 * icap + ml] = cand_lines
            meta[2 * icap + lcap:] = Rt_bits
        else:
            meta = np.full((2 * icap + 12,), -1, np.int32)
            meta[:len(cand1)] = cand1
            meta[icap: icap + m2] = cand2
            meta[2 * icap:] = Rt_bits
        return dict(meta=meta, icap=icap, lcap=lcap, pt_tbl=pt_tbl,
                    ln_tbl=ln_tbl, cand=cand, cand2=cand2, m2=m2,
                    cand_lines=cand_lines, ml=ml, local_pts=local_pts,
                    R_pred=R_pred, t_pred=t_pred,
                    prior=(None if self.prior_info is None
                           else jnp.asarray(self.prior_info)))

    def _ctx_from(self, asm, out, fr, fl, timestamp, use_pl):
        return dict(out=out, fr=fr, fl=fl, timestamp=timestamp,
                    use_pl=use_pl, cand=asm["cand"], cand2=asm["cand2"],
                    m2=asm["m2"], cand_lines=asm["cand_lines"],
                    ml=asm["ml"], n_kp=int(fr.kp.xy.shape[0]),
                    n_kl=(int(fl.kl.sp.shape[0]) if use_pl else None),
                    local_pts=asm["local_pts"], R_pred=asm["R_pred"],
                    t_pred=asm["t_pred"], seq=self.frame_id)

    def _dispatch_fused(self, fr: frame_mod.Frame, timestamp: float, fl):
        """Assemble + dispatch the fused tracking program against ALREADY
        BUILT frame arrays. Returns a context dict holding the in-flight
        device outputs, or None when the fused preconditions fail."""
        use_pl = self.use_lines and fl is not None
        asm = self._assemble_fused(use_pl)
        if asm is None:
            return None
        if use_pl:
            out = _track_frame_tables_pl(
                self.cam, jnp.asarray(asm["meta"]), asm["pt_tbl"],
                asm["ln_tbl"],
                fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr,
                fr.inv_sigma2, fr.kp.angle,
                fl.kl.sp, fl.kl.ep, fl.kl.desc, fl.kl.mask,
                icap=asm["icap"], lcap=asm["lcap"],
                line_weight=self.line_track_weight,
                check_rotation=self.check_rotation,
                prior_info=asm["prior"])
        else:
            out = _track_frame_tables_pts(
                self.cam, jnp.asarray(asm["meta"]), asm["pt_tbl"],
                fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr,
                fr.inv_sigma2, fr.kp.angle,
                icap=asm["icap"], check_rotation=self.check_rotation,
                prior_info=asm["prior"])
        return self._ctx_from(asm, out, fr, fl, timestamp, use_pl)

    def _prepare_fused_packed(self, buf: np.ndarray, h: int, w: int,
                              timestamp: float):
        """Assemble the whole-frame packed context WITHOUT touching the
        device: the [image | meta] row is held host-side and uploaded as
        part of the window's ONE stacked transfer at resolve time (the
        tunnel defers execution to the first await anyway, and one stacked
        upload costs ~60%% of separate per-frame uploads — measured)."""
        use_pl = self.use_lines
        asm = self._assemble_fused(use_pl)
        if asm is None:
            return None
        buf_all = np.concatenate([buf, asm["meta"].view(np.uint32)])
        ctx = dict(out=None, fr=None, fl=None, buf=buf_all, asm=asm,
                   h=h, w=w, timestamp=timestamp, use_pl=use_pl,
                   cand=asm["cand"], cand2=asm["cand2"], m2=asm["m2"],
                   cand_lines=asm["cand_lines"], ml=asm["ml"],
                   n_kp=self.num_features,
                   n_kl=(self.max_keylines if use_pl else None),
                   local_pts=asm["local_pts"], R_pred=asm["R_pred"],
                   t_pred=asm["t_pred"], seq=self.frame_id)
        return ctx

    def _launch_group(self, group):
        """Stack the group's packed [image|meta] rows into ONE upload and
        dispatch each frame's whole-frame program (fills ctx out/fr/fl)."""
        import os as _os
        import time as _time

        _t0 = _time.perf_counter()
        G = 1
        while G < len(group):
            G *= 2
        rows = [c["buf"] for c in group]
        rows += [rows[-1]] * (G - len(rows))  # pad rows are ignored
        Bd = jnp.asarray(np.stack(rows))
        for i, c in enumerate(group):
            asm = c["asm"]
            if c["use_pl"]:
                out, fr, fl = _frame_track_rgbd_pl(
                    self.cam, Bd, i, asm["pt_tbl"], asm["ln_tbl"],
                    h=c["h"], w=c["w"], num_features=self.num_features,
                    n_levels=self.n_levels, scale=self.scale,
                    max_lines=self.max_keylines,
                    icap=asm["icap"], lcap=asm["lcap"],
                    line_weight=self.line_track_weight,
                    check_rotation=self.check_rotation,
                    prior_info=asm["prior"], dec=self.depth_decimation)
                c["out"], c["fr"], c["fl"] = out, fr, fl
            else:
                out, fr = _frame_track_rgbd_pts(
                    self.cam, Bd, i, asm["pt_tbl"],
                    h=c["h"], w=c["w"], num_features=self.num_features,
                    n_levels=self.n_levels, scale=self.scale,
                    icap=asm["icap"], check_rotation=self.check_rotation,
                    prior_info=asm["prior"], dec=self.depth_decimation)
                c["out"], c["fr"] = out, fr
        if _os.environ.get("PLVS_DEBUG_BA_SHAPES"):
            import sys as _sys

            el = (_time.perf_counter() - _t0) * 1e3
            if el > 200.0:
                print(f"launch_group SLOW (compile?): {el:.0f} ms "
                      f"G={G} icap={group[0]['asm']['icap']} "
                      f"n={len(group)}", file=_sys.stderr)

    def _group_key(self, c):
        """Shape signature for batching pending solves into one transfer."""
        if c.get("buf") is None:
            return ("dispatched", tuple(c["out"].shape))
        asm = c["asm"]
        return ("packed", c["use_pl"], len(c["buf"]), asm["icap"],
                asm["lcap"], c["h"], c["w"], asm["pt_tbl"][0].shape[0],
                (asm["ln_tbl"][0].shape[0] if c["use_pl"] else 0),
                asm["prior"] is None)

    def process_frame_packed(self, buf: np.ndarray, h: int, w: int,
                             timestamp: float):
        """Fast path for the steady OK state: the whole frame (decompress +
        extract + match + solve) is one executable, its input one row of
        the window's stacked upload. Returns a TrackResult, or None when
        the caller must fall back to the separate-build path (non-OK state,
        no candidates)."""
        if self.state != OK:
            return None
        ctx = self._prepare_fused_packed(buf, h, w, timestamp)
        if ctx is None:
            return None
        self.last_frame = None  # frame arrays materialize at resolve
        if self.pipelined:
            self._pending.append(ctx)
            self.frame_id += 1
            return TrackResult(OK, np.asarray(ctx["R_pred"]),
                               np.asarray(ctx["t_pred"]), -1, None)
        self._launch_group([ctx])
        res = self._finish_fused(np.asarray(jax.device_get(ctx["out"])), ctx)
        self.last_frame = ctx["fr"]
        self.lost_frames = 1 if res.state == LOST else 0
        self.frame_id += 1
        return res

    def _finish_fused(self, buf, ctx) -> TrackResult:
        """Interpret the fused program's packed output (sync or deferred)."""
        st = self.store
        fr, fl = ctx["fr"], ctx["fl"]
        timestamp = ctx["timestamp"]
        m2, cand2 = ctx["m2"], ctx["cand2"]
        fetched = _unpack_track_out(buf, ctx["n_kp"], ctx["n_kl"])
        kl_ln_id = None
        if ctx["use_pl"]:
            R2, t2, n1, n2, kp_pt_local, kl_ln_local = fetched
            ml, cand_lines = ctx["ml"], ctx["cand_lines"]
            kl_ln_id = np.full((fl.kl.sp.shape[0],), -1, np.int64)
            okl = (kl_ln_local >= 0) & (kl_ln_local < ml)
            kl_ln_id[okl] = cand_lines[kl_ln_local[okl]]
            if not self.only_tracking and ml and int(n1) >= 20:
                # (skipped when falling back below — _match_step_pl
                # bumps the counters itself on that path). "visible" gated
                # on the midpoint being in the frustum (reference:
                # isInFrustum before IncreaseVisible — see point counters)
                seen = np.unique(kl_ln_id[kl_ln_id >= 0])
                st.ln_found[seen] += 1
                mid = 0.5 * (st.ln_Xs[cand_lines] + st.ln_Xe[cand_lines])
                st.ln_visible[cand_lines[self._in_frustum(
                    mid, np.asarray(R2), np.asarray(t2))]] += 1
        else:
            R2, t2, n1, n2, kp_pt_local = fetched
        n1, n2 = int(n1), int(n2)
        kp_pt2 = np.full((fr.kp.xy.shape[0],), -1, np.int64)
        okp = (kp_pt_local >= 0) & (kp_pt_local < m2)
        kp_pt2[okp] = cand2[kp_pt_local[okp]]
        R2, t2 = np.asarray(R2), np.asarray(t2)
        if n1 < 20:
            return self._track_slow(
                fr, timestamp, fl, ctx["cand"], ctx["local_pts"],
                ctx["R_pred"], ctx["t_pred"])
        return self._track_tail(fr, timestamp, fl, R2, t2, n2, kp_pt2,
                                kl_ln_id, ctx["local_pts"])

    def resolve_batch(self, force: bool = False,
                      dispatch_at: int | None = None) -> int:
        """Deferred pipeline: when the in-flight window is full (or on
        ``force``), dispatch ALL outstanding solves (one stacked upload +
        one fetch per shape group) and finish them in order, feeding each
        result to ``on_resolved``. With ``overlap_fetch`` the blocking
        device_get runs on a helper thread and the group is finished at the
        NEXT drain — group N's device execution + transfer overlaps group
        N+1's host assembly and group N's host finish overlaps group N+1's
        device time (double buffering; at most one group stays in flight).
        ``dispatch_at`` overrides the dispatch threshold (the ADAPTIVE
        rotation-bounded depth) without forcing a blocking drain — the
        newest group stays in flight, bounding prediction staleness at
        ``dispatch_at`` frames while keeping the overlap.
        Returns the number of frames resolved."""
        import time as _time

        depth = self.pipeline_depth if dispatch_at is None \
            else max(1, dispatch_at)
        if self._pending and (force or len(self._pending) >= depth):
            pending, self._pending = self._pending, []
            # group consecutive frames sharing a shape signature (capacity
            # buckets change rarely); each group costs one stacked upload +
            # one transfer
            i = 0
            while i < len(pending):
                j = i + 1
                key = self._group_key(pending[i])
                while j < len(pending) and self._group_key(pending[j]) == key:
                    j += 1
                group = pending[i:j]
                deferred = [c for c in group if c.get("out") is None]
                if deferred:
                    self._launch_group(deferred)
                outs = tuple(p["out"] for p in group)
                fut = None
                if self.overlap_fetch:
                    if self._fetch_pool is None:
                        from concurrent.futures import ThreadPoolExecutor

                        self._fetch_pool = ThreadPoolExecutor(
                            max_workers=1, thread_name_prefix="plvs-fetch")
                    fut = self._fetch_pool.submit(jax.device_get, outs)
                self._inflight.append((group, fut, outs))
                i = j

        # drain in FIFO order: everything on force / non-overlap mode,
        # otherwise leave (at most) the newest still-running group in flight
        done = 0
        while self._inflight:
            if (not force and self.overlap_fetch
                    and len(self._inflight) <= 1
                    and not self._inflight[0][1].done()):
                break
            group, fut, outs = self._inflight.pop(0)
            t0 = _time.perf_counter()
            # one device_get fetches the whole group in one latency tick
            bufs = fut.result() if fut is not None else jax.device_get(outs)
            t1 = _time.perf_counter()
            for p, buf in zip(group, bufs):
                res = self._finish_fused(np.asarray(buf), p)
                if self.on_resolved is not None:
                    self.on_resolved(res, p["timestamp"], p.get("seq"))
                done += 1
            if self.timing is not None:
                self.timing.append((t1 - t0, _time.perf_counter() - t1,
                                    len(group)))
        return done

    def _track(self, fr: frame_mod.Frame, timestamp: float,
               fl=None) -> TrackResult:
        ctx = self._dispatch_fused(fr, timestamp, fl)
        if ctx is None:
            # slow path needs a consistent (fully resolved) tracker state
            self.resolve_batch(force=True)
            R_pred = self.vel_R @ self.R
            t_pred = self.vel_R @ self.t + self.vel_t
            last_ids = self.last_kp_pt_id
            cand = np.unique(last_ids[last_ids >= 0])
            return self._track_slow(fr, timestamp, fl, cand,
                                    self._local_points(), R_pred, t_pred)
        if self.pipelined:
            # deferred resolution: queue this frame's in-flight solve and
            # hand back a provisional (velocity-extrapolated) pose; the
            # System drains the window in one stacked fetch when it fills.
            # Matching semantics degrade only via candidate staleness (at
            # most pipeline_depth frames; the on-device wide-radius retry
            # absorbs the extra prediction error).
            self._pending.append(ctx)
            return TrackResult(OK, np.asarray(ctx["R_pred"]),
                               np.asarray(ctx["t_pred"]), -1, None)
        return self._finish_fused(jax.device_get(ctx["out"]), ctx)

    def _in_frustum(self, X_w: np.ndarray, R: np.ndarray, t: np.ndarray,
                    margin: float = 0.0) -> np.ndarray:
        """Host-side frustum test for visibility accounting (reference:
        MapPoint/MapLine isInFrustum called from SearchLocal* before
        IncreaseVisible). Pinhole projection of the candidate landmarks —
        adequate as a gate even on fisheye rigs."""
        Xc = X_w @ R.T + t
        z = Xc[:, 2]
        ok = z > 0.05
        fx, fy, cx, cy = (float(p) for p in self.cam.params[:4])
        zs = np.where(ok, z, 1.0)
        u = fx * Xc[:, 0] / zs + cx
        v = fy * Xc[:, 1] / zs + cy
        return (ok & (u >= -margin) & (u < self.cam.width + margin)
                & (v >= -margin) & (v < self.cam.height + margin))

    def _track_slow(self, fr, timestamp, fl, cand, local_pts,
                    R_pred, t_pred) -> TrackResult:
        """Rare slow path: the motion model failed (or there was nothing to
        match) — full host-orchestrated fallback chain with the
        pose-prior-free reference-KF matcher (reference:
        Tracking::TrackReferenceKeyFrame, src/Tracking.cc:2277)."""
        use_pl = self.use_lines and fl is not None
        kl_ln_id = None
        R1, t1, n1x, kp_pt1 = self._match_step(
            fr, R_pred, t_pred, cand, radius=30.0)
        if n1x < 20 and self.ref_kf >= 0:
            Rr, tr, nr, kp_ptr = self._track_reference_kf(fr, self.R, self.t)
            if nr > n1x:
                R1, t1, n1x, kp_pt1 = Rr, tr, nr, kp_ptr
        # --- step 2: track local map (reference: TrackLocalMap's
        # PoseOptimization carries point AND line edges,
        # src/Optimizer.cc:2375) -------------------------------------------
        if use_pl:
            local_lns = self._local_lines()
            R2, t2, n2, kp_pt2, kl_ln_id = self._match_step_pl(
                fr, fl, R1, t1, local_pts, local_lns, radius=4.0)
        else:
            R2, t2, n2, kp_pt2 = self._match_step(
                fr, R1, t1, local_pts, radius=4.0)
        return self._track_tail(fr, timestamp, fl, R2, t2, int(n2), kp_pt2,
                                kl_ln_id, local_pts)

    def _track_tail(self, fr, timestamp, fl, R2, t2, n2, kp_pt2, kl_ln_id,
                    local_pts) -> TrackResult:
        """Common epilogue: lost handling, motion model, visibility
        counters, keyframe decision + creation."""
        st = self.store
        if n2 < 10:
            # a mature map earns a grace period with coasting + per-frame
            # relocalization attempts (reference: state -> RECENTLY_LOST
            # when the map has >10 KFs or an IMU, src/Tracking.cc:2361-2371)
            if (self.imu_coast or self.store.num_keyframes
                    >= self.min_kf_recently_lost):
                self.state = RECENTLY_LOST
                self._lost_ts = timestamp
            else:
                self.state = LOST
            return TrackResult(self.state, self.R, self.t, int(n2), kp_pt2)

        # motion model update
        R_last, t_last = self.R, self.t
        self.R, self.t = R2, t2
        Rl_inv, tl_inv = np.asarray(R_last).T, -np.asarray(R_last).T @ t_last
        self.vel_R = (R2 @ Rl_inv).astype(np.float32)
        self.vel_t = (R2 @ tl_inv + t2).astype(np.float32)
        self._vel_warm = 0 if n2 < 50 else self._vel_warm + 1

        # update visibility counters (reference: IncreaseVisible/Found) —
        # frozen in localization-only mode, where the map must not change.
        # "visible" counts only candidates actually IN the frame's frustum
        # (reference: isInFrustum gates IncreaseVisible in SearchLocalPoints
        # — counting every local-map candidate would deflate found/visible
        # and over-cull landmarks the camera never looked at)
        if not self.only_tracking:
            seen = np.unique(kp_pt2[kp_pt2 >= 0])
            st.pt_found[seen] += 1
            vis = local_pts[self._in_frustum(st.pt_xyz[local_pts], R2, t2)]
            st.pt_visible[vis] += 1

        self.frames_since_kf += 1
        self.last_kp_pt_id = kp_pt2

        # reference tracked count = inliers on the first frame after the KF
        # (a newly created KF's own association count includes brand-new
        # points and would make the ratio test fire every frame)
        if self.ref_kf_npts < 0:
            self.ref_kf_npts = int(n2)

        # --- keyframe decision --------------------------------------------
        need_kf = (
            n2 < self.kf_ratio * max(self.ref_kf_npts, 1)
            or self.frames_since_kf >= self.max_kf_interval
        )
        if self.fov_centers_kf and not need_kf:
            c = self._fov_center(fr, R2, t2)
            if c is not None and self.ref_kf in self._kf_fov_center:
                d = np.linalg.norm(c - self._kf_fov_center[self.ref_kf])
                need_kf = d > self.max_fov_centers_distance
        need_kf = need_kf and n2 >= self.min_kf_inliers and not self.only_tracking
        kf_id = -1
        if need_kf:
            kf_id, pt_ids = self._create_keyframe(
                fr, timestamp, kp_pt2, fl,
                kl_ln_id if self.use_lines else None)
            self.ref_kf = kf_id
            self.ref_kf_npts = -1  # re-baselined on the next tracked frame
            self.frames_since_kf = 0
            self.last_kp_pt_id = np.asarray(self.store.kf_kp_pt[kf_id]).copy()

        self.state = OK
        return TrackResult(self.state, self.R, self.t, int(n2), kp_pt2,
                           need_kf, kf_id, kl_ln_id)

    # ------------------------------------------------------------------
    def _track_reference_kf(self, fr, R_init, t_init):
        """Descriptor-NN match against the reference KF's landmarks, then
        pose-only optimization (reference: TrackReferenceKeyFrame,
        src/Tracking.cc:2277 — SearchByBoW + PoseOptimization; the dense
        Hamming matrix subsumes the BoW-bucket gating)."""
        from ..features.matching import match_nn_ratio
        from ..solvers import pose_opt as po

        st = self.store
        kf = self.ref_kf
        kf_pt = st.kf_kp_pt[kf]
        m2 = jnp.asarray(st.kf_kp_mask[kf] & (kf_pt >= 0)
                         & st.pt_mask[np.maximum(kf_pt, 0)])
        idx, _ = match_nn_ratio(fr.kp.desc, jnp.asarray(st.kf_kp_desc[kf]),
                                fr.kp.mask, m2, max_dist=64, ratio=0.8)
        idx = np.asarray(idx)
        n_kp = fr.kp.xy.shape[0]
        kp_pt_id = np.full((n_kp,), -1, np.int64)
        ok = idx >= 0
        kp_pt_id[ok] = kf_pt[idx[ok]]
        if ok.sum() < 10:
            return (np.asarray(R_init), np.asarray(t_init), 0, kp_pt_id)
        Xw = np.zeros((n_kp, 3), np.float32)
        Xw[ok] = st.pt_xyz[kp_pt_id[ok]]
        obs = po.make_pose_obs(
            jnp.asarray(Xw), fr.uvr, fr.inv_sigma2,
            jnp.asarray(ok) & fr.kp.mask)
        R, t, inl, _, n_inl = po.pose_optimize(
            self.cam, jnp.asarray(R_init), jnp.asarray(t_init), obs)
        inl = np.asarray(inl)
        kp_pt_id[~inl] = -1
        return np.asarray(R), np.asarray(t), int(n_inl), kp_pt_id

    # ------------------------------------------------------------------
    def _fov_center(self, fr, R, t) -> np.ndarray | None:
        """World point at median keypoint depth along the optical axis
        (reference: KeyFrame fov center used by the fovCenters KF criterion,
        Tracking.h:96)."""
        depth = np.asarray(fr.depth)
        d = depth[depth > 0]
        if len(d) < 10:
            return None
        z = float(np.median(d))
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        return (twc + Rwc @ np.array([0.0, 0.0, z], np.float32)).astype(np.float32)

    # ------------------------------------------------------------------
    def reset_state(self):
        """Return to the pre-initialization state without touching the map
        (the tracker half of System::Reset / ResetActiveMap)."""
        # finish deferred frames first: silently dropping them would leave
        # their trajectory entries and pending dense payloads orphaned
        if self._pending or self._inflight:
            try:
                self.resolve_batch(force=True)
            except Exception:
                self._pending = []
                self._inflight = []
        self.state = NOT_INITIALIZED
        self._pending = []
        self._inflight = []
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self._vel_warm = 0
        self.ref_kf = -1
        self.ref_kf_npts = 0
        self.frames_since_kf = 0
        self.lost_frames = 0
        self._init_frame = None
        self.last_kp_pt_id = None
        self._kf_fov_center.clear()

    # ------------------------------------------------------------------
    def _gather_point_block(self, cand_ids: np.ndarray, cap: int):
        """Pad the candidate landmarks' SoA columns to ``cap`` device-ready
        rows (positions, descriptors, maintenance stats). Holds the store
        lock so the async mapper cannot mutate mid-gather; the copies are
        then raced-free device inputs."""
        st = self.store
        with st.lock:
            return self._gather_point_block_locked(cand_ids, cap)

    def _gather_point_block_locked(self, cand_ids: np.ndarray, cap: int):
        st = self.store
        m = len(cand_ids)
        xyz = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        octv = np.zeros((cap,), np.int32)
        valid = np.zeros((cap,), bool)
        normal = np.zeros((cap, 3), np.float32)
        min_d = np.zeros((cap,), np.float32)
        max_d = np.zeros((cap,), np.float32)
        angle = np.zeros((cap,), np.float32)
        xyz[:m] = st.pt_xyz[cand_ids]
        desc[:m] = st.pt_desc[cand_ids]
        valid[:m] = st.pt_mask[cand_ids]
        normal[:m] = st.pt_normal[cand_ids]
        min_d[:m] = st.pt_min_dist[cand_ids]
        max_d[:m] = st.pt_max_dist[cand_ids]
        angle[:m] = st.pt_angle[cand_ids]
        return (jnp.asarray(xyz), jnp.asarray(desc), jnp.asarray(octv),
                jnp.asarray(valid), jnp.asarray(normal), jnp.asarray(min_d),
                jnp.asarray(max_d), jnp.asarray(angle))

    def _device_tables(self):
        """Device-resident landmark tables (points + lines), re-uploaded
        only when the store's landmark version moved or the capacity bucket
        grew — per-frame tracking then ships candidate ids instead of
        gathered landmark rows (16 array uploads -> 2 through the tunnel)."""
        st = self.store
        key = (st.version,
               self._cap_bucket(max(st._n_pt, 1), st.max_pts,
                                lo=8192 if self.fixed_shapes else 1024),
               self._cap_bucket(max(st._n_ln, 1), st.max_lines,
                                lo=1024 if self.fixed_shapes else 256))
        if self._tbl_cache is not None and self._tbl_cache[0] == key:
            return self._tbl_cache[1], self._tbl_cache[2]
        P, L = key[1], key[2]
        with st.lock:
            pt_tbl = (jnp.asarray(st.pt_xyz[:P]), jnp.asarray(st.pt_desc[:P]),
                      jnp.asarray(st.pt_normal[:P]),
                      jnp.asarray(st.pt_min_dist[:P]),
                      jnp.asarray(st.pt_max_dist[:P]),
                      jnp.asarray(st.pt_angle[:P]),
                      jnp.asarray(st.pt_mask[:P]))
            ln_tbl = (jnp.asarray(st.ln_Xs[:L]), jnp.asarray(st.ln_Xe[:L]),
                      jnp.asarray(st.ln_desc[:L]),
                      jnp.asarray(st.ln_mask[:L]))
        self._tbl_cache = (key, pt_tbl, ln_tbl)
        return pt_tbl, ln_tbl

    def _gather_line_block(self, cand_lines: np.ndarray):
        """Pad candidate line landmarks to the fixed line capacity.
        Returns ((Xs, Xe, desc, valid) device arrays, kept ids, count)."""
        st = self.store
        lcap = self.local_lines_cap
        ml = min(len(cand_lines), lcap)
        cand_lines = cand_lines[:ml]
        Xs = np.zeros((lcap, 3), np.float32)
        Xe = np.zeros((lcap, 3), np.float32)
        ldesc = np.zeros((lcap, 8), np.uint32)
        lvalid = np.zeros((lcap,), bool)
        if ml:
            with st.lock:
                Xs[:ml] = st.ln_Xs[cand_lines]
                Xe[:ml] = st.ln_Xe[cand_lines]
                ldesc[:ml] = st.ln_desc[cand_lines]
                lvalid[:ml] = st.ln_mask[cand_lines]
        return ((jnp.asarray(Xs), jnp.asarray(Xe), jnp.asarray(ldesc),
                 jnp.asarray(lvalid)), cand_lines, ml)

    @staticmethod
    def _cap_bucket(m: int, cap: int, lo: int = 512) -> int:
        """Smallest power-of-two bucket >= m (bounded by cap): the padded
        match matrices scale with the bucket, and a handful of buckets
        keeps recompiles rare."""
        b = lo
        while b < m and b < cap:
            b *= 2
        return min(b, cap)

    def _match_step(self, fr, R_pred, t_pred, cand_ids: np.ndarray, radius: float):
        st = self.store
        m = len(cand_ids)
        if m == 0:
            return (np.asarray(R_pred), np.asarray(t_pred), 0,
                    np.full((fr.kp.xy.shape[0],), -1, np.int64))
        if m > self.local_pts_cap:
            cand_ids = cand_ids[: self.local_pts_cap]
            m = self.local_pts_cap
        cap = self._cap_bucket(m, self.local_pts_cap)
        (xyz, desc, octv, valid, normal, min_d, max_d,
         angle) = self._gather_point_block(cand_ids, cap)

        out = _match_and_optimize(
            self.cam, jnp.asarray(R_pred), jnp.asarray(t_pred),
            xyz, desc, octv, valid,
            fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr, fr.inv_sigma2,
            radius,
            pts_normal=normal, pts_min_dist=min_d, pts_max_dist=max_d,
            pts_angle=angle, kp_angle=fr.kp.angle,
            check_rotation=self.check_rotation,
        )
        # ONE device->host transfer for all outputs (each np.asarray on a
        # device array is a separate round trip — painful over a remote
        # accelerator tunnel)
        R, t, idx, n_inl, kp_inl, kp_pt_local = jax.device_get(out)
        kp_pt_id = np.full((fr.kp.xy.shape[0],), -1, np.int64)
        ok = (kp_pt_local >= 0) & (kp_pt_local < m) & kp_inl
        kp_pt_id[ok] = cand_ids[kp_pt_local[ok]]
        return R, t, int(n_inl), kp_pt_id

    # ------------------------------------------------------------------
    def _match_step_pl(self, fr, fl, R_pred, t_pred, cand_ids: np.ndarray,
                       cand_lines: np.ndarray, radius: float):
        """Joint point+line local-map step: both association passes feed ONE
        pose optimization (reference: TrackLocalMap, src/Tracking.cc:3761-3797
        — the line edges constrain the same solve as the point edges)."""
        st = self.store
        m = min(len(cand_ids), self.local_pts_cap)
        if m == 0:
            return (np.asarray(R_pred), np.asarray(t_pred), 0,
                    np.full((fr.kp.xy.shape[0],), -1, np.int64),
                    np.full((fl.kl.sp.shape[0],), -1, np.int64))
        cand_ids = cand_ids[:m]
        cap = self._cap_bucket(m, self.local_pts_cap)
        (xyz, desc, octv, valid, normal, min_d, max_d,
         angle) = self._gather_point_block(cand_ids, cap)

        (lXs, lXe, ldesc_d, lvalid_d), cand_lines, ml = \
            self._gather_line_block(cand_lines)

        out = _match_and_optimize_pl(
            self.cam, jnp.asarray(R_pred), jnp.asarray(t_pred),
            xyz, desc, octv, valid,
            lXs, lXe, ldesc_d, lvalid_d,
            fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr,
            fr.inv_sigma2,
            fl.kl.sp, fl.kl.ep, fl.kl.desc, fl.kl.mask,
            radius, line_weight=self.line_track_weight,
            pts_normal=normal, pts_min_dist=min_d, pts_max_dist=max_d,
            pts_angle=angle, kp_angle=fr.kp.angle,
            check_rotation=self.check_rotation,
        )
        # single batched transfer (see _match_step)
        R, t, n_inl, kp_pt_local, kl_ln_local = jax.device_get(out)
        kp_pt_id = np.full((fr.kp.xy.shape[0],), -1, np.int64)
        ok = (kp_pt_local >= 0) & (kp_pt_local < m)
        kp_pt_id[ok] = cand_ids[kp_pt_local[ok]]
        kl_ln_id = np.full((fl.kl.sp.shape[0],), -1, np.int64)
        okl = (kl_ln_local >= 0) & (kl_ln_local < ml)
        kl_ln_id[okl] = cand_lines[kl_ln_local[okl]]
        # visibility counters (reference: IncreaseVisible/Found for lines)
        if not self.only_tracking and ml:
            seen = np.unique(kl_ln_id[kl_ln_id >= 0])
            st.ln_found[seen] += 1
            st.ln_visible[cand_lines] += 1
        return np.asarray(R), np.asarray(t), int(n_inl), kp_pt_id, kl_ln_id

    # ------------------------------------------------------------------
    def _local_window(self, max_k1: int = 10, max_k2: int = 3) -> np.ndarray:
        """Two-hop covisible keyframe neighbourhood K1 ∪ K2 of the reference
        KF (reference: Tracking::UpdateLocalKeyFrames gathers the covisible
        set K1 AND each K1 member's best covisible neighbours K2 + spanning
        children, src/Tracking.cc:4582-4671)."""
        st = self.store
        if self.ref_kf < 0:
            return np.zeros((0,), np.int64)
        covis, _ = st.covisibility(self.ref_kf, min_weight=5)
        k1 = covis[:max_k1]
        window = [np.asarray([self.ref_kf]), k1]
        for nb in k1[:5]:
            covis2, _ = st.covisibility(int(nb), min_weight=5)
            window.append(covis2[:max_k2])
        return np.unique(np.concatenate(window))

    def _local_points(self) -> np.ndarray:
        """Map points of the covisible neighbourhood of the reference KF
        (reference: Tracking::UpdateLocalKeyFrames/UpdateLocalPoints)."""
        st = self.store
        window = self._local_window()
        if len(window) == 0:
            return np.zeros((0,), np.int64)
        pts = st.points_in_kfs(window)
        return pts[st.pt_mask[pts]]

    # ------------------------------------------------------------------
    def _local_lines(self) -> np.ndarray:
        """Line landmarks of the covisible neighbourhood (reference:
        Tracking::UpdateLocalLines)."""
        st = self.store
        window = self._local_window()
        if len(window) == 0:
            return np.zeros((0,), np.int64)
        cand = st.lines_in_kfs(window)
        return cand[st.ln_mask[cand]]

    # ------------------------------------------------------------------
    def _line_step(self, fl, R, t) -> np.ndarray:
        """Associate the frame's keylines with local line landmarks
        (association-only fallback; the tracking hot path uses the joint
        point+line solve in _match_step_pl)."""
        st = self.store
        cand = self._local_lines()
        cap = self.local_lines_cap
        m = min(len(cand), cap)
        if m == 0:
            return np.full((fl.kl.sp.shape[0],), -1, np.int64)
        cand = cand[:m]
        Xs = np.zeros((cap, 3), np.float32)
        Xe = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        valid = np.zeros((cap,), bool)
        Xs[:m] = st.ln_Xs[cand]
        Xe[:m] = st.ln_Xe[cand]
        desc[:m] = st.ln_desc[cand]
        valid[:m] = True
        kl_ln_local = np.asarray(_match_lines(
            self.cam, jnp.asarray(R), jnp.asarray(t),
            jnp.asarray(Xs), jnp.asarray(Xe), jnp.asarray(desc),
            jnp.asarray(valid),
            fl.kl.sp, fl.kl.ep, fl.kl.desc, fl.kl.mask,
        ))
        out = np.full((fl.kl.sp.shape[0],), -1, np.int64)
        ok = (kl_ln_local >= 0) & (kl_ln_local < m)
        out[ok] = cand[kl_ln_local[ok]]
        seen = np.unique(out[out >= 0])
        st.ln_found[seen] += 1
        st.ln_visible[cand] += 1
        return out

    # ------------------------------------------------------------------
    def _create_keyframe(self, fr: frame_mod.Frame, timestamp: float,
                         kp_pt_id: np.ndarray, fl=None, kl_ln_id=None):
        """Snapshot the frame as a keyframe; create new map points from depth
        for unmatched keypoints (reference: Tracking::CreateNewKeyFrame
        close-point creation, src/Tracking.cc:4182)."""
        with self.store.lock:
            return self._create_keyframe_locked(fr, timestamp, kp_pt_id, fl,
                                                kl_ln_id)

    def _create_keyframe_locked(self, fr: frame_mod.Frame, timestamp: float,
                                kp_pt_id: np.ndarray, fl=None, kl_ln_id=None):
        st = self.store
        kf = st.alloc_kf()
        N = fr.kp.xy.shape[0]
        # one batched device->host transfer for the whole frame snapshot
        # (points AND lines in the same call: the link charges per call)
        fr, fl = jax.device_get((fr, fl))
        st.kf_R[kf] = self.R
        st.kf_t[kf] = self.t
        c = self._fov_center(fr, self.R, self.t)
        if c is not None:
            self._kf_fov_center[kf] = c
        st.kf_mask[kf] = True
        st.kf_timestamp[kf] = timestamp
        st.kf_frame_id[kf] = self.frame_id
        st.kf_kp_xy[kf] = np.asarray(fr.kp.xy)
        st.kf_kp_uvr[kf] = np.asarray(fr.uvr)
        st.kf_kp_desc[kf] = np.asarray(fr.kp.desc)
        st.kf_kp_octave[kf] = np.asarray(fr.kp.octave)
        st.kf_kp_angle[kf] = np.asarray(fr.kp.angle)
        st.kf_kp_mask[kf] = np.asarray(fr.kp.mask)
        st.kf_kp_pt[kf] = -1

        # existing associations
        exist = np.nonzero(kp_pt_id >= 0)[0]
        if len(exist):
            st.add_observations(kf, kp_pt_id[exist], exist)

        # new map points from valid-depth unmatched keypoints: all close
        # points, topped up with the closest far ones to >= 100 (reference:
        # Tracking::CreateNewKeyFrame creates the 100 closest when there are
        # fewer than 100 close points, src/Tracking.cc:4182)
        depth = np.asarray(fr.depth)
        mask = np.asarray(fr.kp.mask)
        valid = (kp_pt_id < 0) & mask & (depth > 0)
        close = valid & (depth < self.max_depth)
        new_sel = np.nonzero(close)[0]
        if len(new_sel) < 100:
            far = np.nonzero(valid & ~close)[0]
            far = far[np.argsort(depth[far])][: 100 - len(new_sel)]
            new_sel = np.concatenate([new_sel, far])
        pt_ids = np.zeros((0,), np.int64)
        if len(new_sel):
            Rwc = self.R.T
            twc = -Rwc @ self.t
            xyz_cam = np.asarray(fr.xyz_cam)[new_sel]
            xyz_w = xyz_cam @ Rwc.T + twc
            pt_ids = st.alloc_pts(len(new_sel))
            st.version += 1
            st.pt_xyz[pt_ids] = xyz_w
            st.pt_desc[pt_ids] = np.asarray(fr.kp.desc)[new_sel]
            st.pt_mask[pt_ids] = True
            st.pt_ref_kf[pt_ids] = kf
            st.pt_first_kf[pt_ids] = kf
            st.pt_n_obs[pt_ids] = 0
            st.pt_visible[pt_ids] = 1
            st.pt_found[pt_ids] = 1
            dirs = xyz_w - twc
            dist = np.linalg.norm(dirs, axis=-1)
            st.pt_normal[pt_ids] = dirs / (dist[:, None] + 1e-9)
            # initial scale-invariance band + descriptor orientation
            # (reference: MapPoint ctor calls UpdateNormalAndDepth)
            octv = np.asarray(fr.kp.octave)[new_sel]
            max_d = dist * (self.scale ** octv)
            st.pt_max_dist[pt_ids] = max_d
            st.pt_min_dist[pt_ids] = max_d / (
                self.scale ** (self.n_levels - 1))
            st.pt_angle[pt_ids] = np.asarray(fr.kp.angle)[new_sel]
            st.add_observations(kf, pt_ids, new_sel)

        # -- lines: snapshot keylines; create line landmarks from endpoint
        # depths (reference: line creation from stereo/RGBD endpoint depths,
        # src/LocalMapping.cc line path + Frame::ComputeStereoLinesFromRGBD)
        if fl is not None and self.use_lines:
            Nl = st.n_kl
            n_fl = min(Nl, int(fl.kl.sp.shape[0]))
            st.kf_kl_sp[kf, :n_fl] = np.asarray(fl.kl.sp)[:n_fl]
            st.kf_kl_ep[kf, :n_fl] = np.asarray(fl.kl.ep)[:n_fl]
            st.kf_kl_desc[kf, :n_fl] = np.asarray(fl.kl.desc)[:n_fl]
            st.kf_kl_mask[kf, :n_fl] = np.asarray(fl.kl.mask)[:n_fl]
            st.kf_kl_depth[kf, :n_fl, 0] = np.asarray(fl.depth_s)[:n_fl]
            st.kf_kl_depth[kf, :n_fl, 1] = np.asarray(fl.depth_e)[:n_fl]
            st.kf_kl_line[kf] = -1
            if kl_ln_id is None:
                kl_ln_id = np.full((int(fl.kl.sp.shape[0]),), -1, np.int64)
            exist_l = np.nonzero(kl_ln_id[:n_fl] >= 0)[0]
            if len(exist_l):
                st.add_line_observations(kf, kl_ln_id[exist_l], exist_l)
            ds = np.asarray(fl.depth_s)[:n_fl]
            de = np.asarray(fl.depth_e)[:n_fl]
            klm = np.asarray(fl.kl.mask)[:n_fl]
            new_l = np.nonzero(
                (kl_ln_id[:n_fl] < 0) & klm
                & (ds > 0) & (ds < self.line_max_depth)
                & (de > 0) & (de < self.line_max_depth)
                # endpoint depth consistency (reference: skLineStereoMaxDist)
                & (np.abs(ds - de) < 0.5 * np.maximum(ds, de))
            )[0]
            if len(new_l):
                Rwc = self.R.T
                twc = -Rwc @ self.t
                Xs_w = np.asarray(fl.Xs_cam)[new_l] @ Rwc.T + twc
                Xe_w = np.asarray(fl.Xe_cam)[new_l] @ Rwc.T + twc
                ln_ids = st.alloc_lines(len(new_l))
                st.version += 1
                st.ln_Xs[ln_ids] = Xs_w
                st.ln_Xe[ln_ids] = Xe_w
                st.ln_desc[ln_ids] = np.asarray(fl.kl.desc)[new_l]
                st.ln_mask[ln_ids] = True
                st.ln_ref_kf[ln_ids] = kf
                st.ln_first_kf[ln_ids] = kf
                st.ln_n_obs[ln_ids] = 0
                st.ln_visible[ln_ids] = 1
                st.ln_found[ln_ids] = 1
                st.add_line_observations(kf, ln_ids, new_l)
        return kf, pt_ids
