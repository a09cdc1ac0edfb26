"""Per-frame construction: feature extraction + depth association.

TPU-native replacement for the reference's Frame constructor hot path
(reference: src/Frame.cc:405-573 — threaded ORB/line extraction,
undistortion, ComputeStereoFromRGBD, AssignFeaturesToGrid). The whole build
is one jitted program; the 64x48 feature grid is unnecessary because the
matchers evaluate masked distance matrices instead of per-cell candidate
lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..features import orb
from ..geometry import cameras as cam_mod


class Frame(NamedTuple):
    kp: orb.Keypoints          # fixed-capacity keypoints (xy at level-0 scale)
    uvr: jnp.ndarray           # [N, 3] (u, v, uR); uR < 0 => no depth/stereo
    depth: jnp.ndarray         # [N] metric depth (<=0 invalid)
    inv_sigma2: jnp.ndarray    # [N] information scale per keypoint octave
    xyz_cam: jnp.ndarray       # [N, 3] back-projected camera-frame points


class FrameLines(NamedTuple):
    """Per-frame line observations with RGB-D endpoint depths (reference:
    Frame::ComputeStereoLinesFromRGBD, src/Frame.cc:2434)."""

    kl: "object"               # features.lines.KeyLines
    nld: jnp.ndarray           # [L, 3] normalized image line (nx, ny, d)
    depth_s: jnp.ndarray       # [L] start-point depth (<=0 invalid)
    depth_e: jnp.ndarray       # [L] end-point depth
    Xs_cam: jnp.ndarray        # [L, 3] back-projected start points
    Xe_cam: jnp.ndarray        # [L, 3] back-projected end points


@functools.partial(
    jax.jit, static_argnames=("cam", "num_features", "n_levels", "scale")
)
def build_frame_rgbd(
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    cam: cam_mod.Camera,
    num_features: int = 1024,
    n_levels: int = 8,
    scale: float = 1.2,
) -> Frame:
    """Grayscale [H, W] + depth [H, W] (meters, <=0 invalid) -> Frame.

    uR is synthesized from depth as u - bf/z (reference:
    Frame::ComputeStereoFromRGBD, src/Frame.cc).
    """
    kp = orb.extract(gray, num_features, n_levels, scale)
    xi = jnp.clip(jnp.round(kp.xy[:, 0]).astype(jnp.int32), 0, gray.shape[1] - 1)
    yi = jnp.clip(jnp.round(kp.xy[:, 1]).astype(jnp.int32), 0, gray.shape[0] - 1)
    # depth may arrive DECIMATED (packed-upload path): nearest-sample it by
    # scaling the gather indices — upsampling the map on device would cost
    # a lane-interleave relayout for nothing
    dy = gray.shape[0] // depth_img.shape[0]
    dx = gray.shape[1] // depth_img.shape[1]
    d = depth_img[yi // dy, xi // dx]
    has_depth = (d > 0.0) & kp.mask
    z_safe = jnp.where(has_depth, d, 1.0)
    uR = jnp.where(has_depth, kp.xy[:, 0] - cam.bf / z_safe, -1.0)
    uvr = jnp.concatenate([kp.xy, uR[:, None]], axis=-1)
    xyz = cam_mod.backproject(cam, kp.xy, jnp.where(has_depth, d, 0.0))
    inv_s2 = orb.inv_scale_sigma2(kp.octave, scale)
    return Frame(kp, uvr, jnp.where(has_depth, d, 0.0), inv_s2, xyz)


@functools.partial(
    jax.jit, static_argnames=("cam", "num_features", "n_levels", "scale")
)
def build_frame_mono(
    gray: jnp.ndarray,
    cam: cam_mod.Camera,
    num_features: int = 1024,
    n_levels: int = 8,
    scale: float = 1.2,
) -> Frame:
    """Monocular frame: features only, no depth (reference: the monocular
    Frame constructor, src/Frame.cc:503-508)."""
    kp = orb.extract(gray, num_features, n_levels, scale)
    uvr = jnp.concatenate([kp.xy, -jnp.ones((kp.xy.shape[0], 1))], axis=-1)
    z = jnp.zeros((kp.xy.shape[0],), gray.dtype)
    inv_s2 = orb.inv_scale_sigma2(kp.octave, scale)
    return Frame(kp, uvr, z, inv_s2, jnp.zeros((kp.xy.shape[0], 3), gray.dtype))


@functools.partial(
    jax.jit, static_argnames=("cam", "num_features", "n_levels", "scale",
                              "max_disp")
)
def build_frame_stereo(
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    cam: cam_mod.Camera,
    num_features: int = 1024,
    n_levels: int = 8,
    scale: float = 1.2,
    max_disp: float = 128.0,
    row_tol: float = 2.0,
) -> Frame:
    """Rectified stereo pair -> Frame with per-keypoint uR/depth.

    TPU re-derivation of Frame::ComputeStereoMatches (reference:
    src/Frame.cc — per-row SAD scans between left/right keypoint sets):
    both images run the SAME batched ORB extraction, right matches are
    found with a row-gated masked Hamming matrix, and disparity comes from
    the matched right keypoint with parabolic subpixel refinement on a
    small SAD strip gathered around the match.
    """
    from ..features import matching as matching_mod

    kp_l = orb.extract(gray_l, num_features, n_levels, scale)
    kp_r = orb.extract(gray_r, num_features, n_levels, scale)

    # row + disparity gating (reference: vL band scaled by octave)
    dv = jnp.abs(kp_l.xy[:, None, 1] - kp_r.xy[None, :, 1])
    tol = row_tol * (scale ** kp_l.octave.astype(jnp.float32))[:, None]
    disp = kp_l.xy[:, None, 0] - kp_r.xy[None, :, 0]
    oct_ok = jnp.abs(kp_l.octave[:, None] - kp_r.octave[None, :]) <= 1
    cand = (
        (dv <= tol) & (disp > 0.1) & (disp < max_disp) & oct_ok
        & kp_l.mask[:, None] & kp_r.mask[None, :]
    )
    dist = matching_mod.hamming(kp_l.desc, kp_r.desc)
    best, second, idx = matching_mod._masked_best2(dist, cand)
    # strict descriptor gate + ratio test (reference: thOrbDist gate in
    # ComputeStereoMatches) — wrong stereo matches poison depth directly
    ok = (best <= matching_mod.TH_LOW) & (
        best.astype(jnp.float32) <= 0.8 * second.astype(jnp.float32))

    uR0 = kp_r.xy[idx, 0]
    # subpixel refinement: bilinear SAD of a 1x11 strip sampled at
    # fractional offsets in [-1, 1] around the matched right keypoint
    # (reference: the 11x11 SAD scan + parabola in ComputeStereoMatches)
    W = 5
    vi = jnp.clip(jnp.round(kp_l.xy[:, 1]).astype(jnp.int32), 0,
                  gray_l.shape[0] - 1)
    offs = jnp.arange(-W, W + 1)
    ul = jnp.clip(jnp.round(kp_l.xy[:, 0]).astype(jnp.int32)[:, None]
                  + offs[None, :], 0, gray_l.shape[1] - 1)
    pl = gray_l[vi[:, None], ul]  # [N, 11]

    def sad_at(du):
        u = (uR0 + du)[:, None] + offs[None, :].astype(jnp.float32)
        u = jnp.clip(u, 0.0, gray_r.shape[1] - 1.001)
        u0 = jnp.floor(u).astype(jnp.int32)
        fu = u - u0
        pr = gray_r[vi[:, None], u0] * (1 - fu) + gray_r[vi[:, None], u0 + 1] * fu
        return jnp.sum(jnp.abs(pl - pr), axis=-1)

    deltas = jnp.linspace(-1.0, 1.0, 9)
    sads = jnp.stack([sad_at(d) for d in deltas])  # [9, N]
    bidx = jnp.argmin(sads, axis=0)
    bidx_c = jnp.clip(bidx, 1, 7)
    c0 = jnp.take_along_axis(sads, (bidx_c - 1)[None], 0)[0]
    c1 = jnp.take_along_axis(sads, bidx_c[None], 0)[0]
    c2 = jnp.take_along_axis(sads, (bidx_c + 1)[None], 0)[0]
    denom = c0 - 2 * c1 + c2
    step = deltas[1] - deltas[0]
    sub = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / denom, 0.0)
    uR = uR0 + deltas[bidx_c] + jnp.clip(sub, -1.0, 1.0) * step
    disparity = kp_l.xy[:, 0] - uR
    ok = ok & (disparity > 0.1) & (disparity < max_disp)
    # photometric outlier gate (reference: median-SAD outlier removal)
    sad_best = jnp.minimum(jnp.minimum(c0, c1), c2)
    med = jnp.median(jnp.where(ok, sad_best, jnp.nan))
    med = jnp.where(jnp.isnan(med), 1e9, med)
    ok = ok & (sad_best <= 2.1 * med + 1e-3)

    d = jnp.where(ok, cam.bf / jnp.maximum(disparity, 0.1), 0.0)
    uR_out = jnp.where(ok, uR, -1.0)
    uvr = jnp.concatenate([kp_l.xy, uR_out[:, None]], axis=-1)
    xyz = cam_mod.backproject(cam, kp_l.xy, d)
    inv_s2 = orb.inv_scale_sigma2(kp_l.octave, scale)
    return Frame(kp_l, uvr, d, inv_s2, xyz)


@functools.partial(
    jax.jit, static_argnames=("cam_l", "cam_r", "num_features", "n_levels",
                              "scale")
)
def build_frame_stereo_rig(
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    cam_l: cam_mod.Camera,
    cam_r: cam_mod.Camera,
    R_lr: jnp.ndarray,
    t_lr: jnp.ndarray,
    num_features: int = 1024,
    n_levels: int = 8,
    scale: float = 1.2,
    epipolar_tol: float = 0.008,
    reproj_tol: float = 2.0,
) -> Frame:
    """Non-rectified stereo rig (e.g. KB8 fisheye pair) -> Frame.

    TPU re-derivation of the reference's general two-camera stereo
    (reference: KannalaBrandt8::matchAndtriangulate used by the fisheye
    Frame constructor, src/CameraModels/KannalaBrandt8.cpp; rig extrinsics
    Stereo.T_c1_c2, src/Settings.cc:404-409): descriptor matching between
    the two images gated by the epipolar-plane constraint on unprojected
    bearings, then two-ray midpoint triangulation in the left camera
    frame. (R_lr, t_lr) maps right-camera points into the left camera:
    X_l = R_lr X_r + t_lr.

    Depths land in Frame.depth/xyz_cam (like RGB-D); uR stays -1 so pose
    residuals are monocular on the left camera.
    """
    from ..features import matching as matching_mod

    kp_l = orb.extract(gray_l, num_features, n_levels, scale)
    kp_r = orb.extract(gray_r, num_features, n_levels, scale)

    dl = cam_mod.unproject(cam_l, kp_l.xy)           # [N, 3] z=1 rays
    dr = cam_mod.unproject(cam_r, kp_r.xy)
    dl = dl / jnp.linalg.norm(dl, axis=-1, keepdims=True)
    dr = dr / jnp.linalg.norm(dr, axis=-1, keepdims=True)
    dr_l = dr @ R_lr.T                               # right rays in left frame

    # epipolar-plane gate: the left bearing must lie on the plane spanned
    # by the baseline and the right bearing (angular distance)
    n_plane = jnp.cross(jnp.broadcast_to(t_lr, dr_l.shape), dr_l)
    n_plane = n_plane / jnp.maximum(
        jnp.linalg.norm(n_plane, axis=-1, keepdims=True), 1e-9)
    epi = jnp.abs(dl @ n_plane.T)                    # [N_l, N_r] |sin(angle)|
    oct_ok = jnp.abs(kp_l.octave[:, None] - kp_r.octave[None, :]) <= 1
    cand = ((epi <= epipolar_tol) & oct_ok
            & kp_l.mask[:, None] & kp_r.mask[None, :])
    dist = matching_mod.hamming(kp_l.desc, kp_r.desc)
    best, second, idx = matching_mod._masked_best2(dist, cand)
    ok = (best <= matching_mod.TH_LOW) & (
        best.astype(jnp.float32) <= 0.8 * second.astype(jnp.float32))

    # two-ray midpoint triangulation: O_l = 0, O_r = t_lr in the left frame
    dm = dr_l[idx]                                   # matched right rays
    d11 = jnp.sum(dl * dl, -1)                       # = 1
    d12 = jnp.sum(dl * dm, -1)
    d22 = jnp.sum(dm * dm, -1)
    b1 = dl @ t_lr
    b2 = dm @ t_lr
    det = d11 * d22 - d12 * d12
    det = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)  # parallel rays
    a = (b1 * d22 - b2 * d12) / det                  # depth along left ray
    b = (b1 * d12 - b2 * d11) / det                  # depth along right ray
    X = 0.5 * (a[:, None] * dl + (t_lr + b[:, None] * dm))

    # cheirality + reprojection verification in both cameras
    uv_l = cam_mod.project(cam_l, X)
    X_r = (X - t_lr) @ R_lr                          # R_lr^T (X - t_lr)
    uv_r = cam_mod.project(cam_r, X_r)
    err_l = jnp.linalg.norm(uv_l - kp_l.xy, axis=-1)
    err_r = jnp.linalg.norm(uv_r - kp_r.xy[idx], axis=-1)
    tol = reproj_tol * (scale ** kp_l.octave.astype(jnp.float32))
    ok = (ok & (a > 0.05) & (b > 0.05) & (X[:, 2] > 0.05)
          & (err_l < tol) & (err_r < tol))

    # subpixel refinement ALONG the epipolar curve: integer keypoint
    # coordinates put ~0.5 px of noise on a few-pixel disparity, i.e. ~10%
    # depth noise; a photometric parabola along the right image's epipolar
    # tangent recovers most of it (the rectified path's 1D SAD scan,
    # generalized to an arbitrary rig geometry)
    uv_r2 = cam_mod.project(cam_r, ((1.05 * a)[:, None] * dl - t_lr) @ R_lr)
    tang = uv_r2 - uv_r
    tang = tang / jnp.maximum(jnp.linalg.norm(tang, axis=-1, keepdims=True),
                              1e-6)
    W = 4  # 9x9 SAD window

    def bilinear(img, uv):
        u = jnp.clip(uv[..., 0], 0.0, img.shape[1] - 1.001)
        v = jnp.clip(uv[..., 1], 0.0, img.shape[0] - 1.001)
        u0 = jnp.floor(u).astype(jnp.int32)
        v0 = jnp.floor(v).astype(jnp.int32)
        fu, fv = u - u0, v - v0
        return ((img[v0, u0] * (1 - fu) + img[v0, u0 + 1] * fu) * (1 - fv)
                + (img[v0 + 1, u0] * (1 - fu)
                   + img[v0 + 1, u0 + 1] * fu) * fv)

    oy, ox = jnp.mgrid[-W:W + 1, -W:W + 1]
    win = jnp.stack([ox, oy], -1).reshape(-1, 2).astype(jnp.float32)
    patch_l = bilinear(gray_l, kp_l.xy[:, None, :] + win[None])   # [N, 81]

    deltas = jnp.linspace(-2.0, 2.0, 17)
    sads = jnp.stack([
        jnp.sum(jnp.abs(patch_l - bilinear(
            gray_r,
            (uv_r + s * tang)[:, None, :] + win[None])), axis=-1)
        for s in deltas
    ])                                                            # [17, N]
    bidx = jnp.clip(jnp.argmin(sads, axis=0), 1, len(deltas) - 2)
    c0 = jnp.take_along_axis(sads, (bidx - 1)[None], 0)[0]
    c1 = jnp.take_along_axis(sads, bidx[None], 0)[0]
    c2 = jnp.take_along_axis(sads, (bidx + 1)[None], 0)[0]
    denom = c0 - 2 * c1 + c2
    step = deltas[1] - deltas[0]
    sub = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (c0 - c2) / denom, 0.0)
    shift = deltas[bidx] + jnp.clip(sub, -1.0, 1.0) * step
    uv_r_ref = uv_r + shift[:, None] * tang

    # re-triangulate with the refined right bearing
    dr2 = cam_mod.unproject(cam_r, uv_r_ref)
    dr2 = dr2 / jnp.linalg.norm(dr2, axis=-1, keepdims=True)
    dm2 = dr2 @ R_lr.T
    d12b = jnp.sum(dl * dm2, -1)
    d22b = jnp.sum(dm2 * dm2, -1)
    b2b = dm2 @ t_lr
    detb = d11 * d22b - d12b * d12b
    detb = jnp.where(jnp.abs(detb) < 1e-9, 1e-9, detb)
    a2 = (b1 * d22b - b2b * d12b) / detb
    bb2 = (b1 * d12b - b2b * d11) / detb
    X2 = 0.5 * (a2[:, None] * dl + (t_lr + bb2[:, None] * dm2))
    refine_ok = (a2 > 0.05) & (bb2 > 0.05) & (X2[:, 2] > 0.05) & (
        jnp.abs(a2 - a) < 0.3 * jnp.maximum(a, 1e-3))
    X = jnp.where(refine_ok[:, None], X2, X)

    d = jnp.where(ok, X[:, 2], 0.0)
    xyz = jnp.where(ok[:, None], X, 0.0)
    uvr = jnp.concatenate(
        [kp_l.xy, jnp.full((kp_l.xy.shape[0], 1), -1.0)], axis=-1)
    inv_s2 = orb.inv_scale_sigma2(kp_l.octave, scale)
    return Frame(kp_l, uvr, d, inv_s2, xyz)


@functools.partial(jax.jit, static_argnames=("cam", "max_lines"))
def build_frame_lines(
    gray: jnp.ndarray,
    depth_img: jnp.ndarray,
    cam: cam_mod.Camera,
    max_lines: int = 128,
) -> FrameLines:
    """Line extraction + endpoint depth association for one RGB-D frame."""
    from ..features import lines as lines_mod

    kl = lines_mod.extract_lines(gray, max_lines=max_lines)
    nld = lines_mod.line_nld(kl.sp, kl.ep)

    def sample_depth(xy):
        xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, gray.shape[1] - 1)
        yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, gray.shape[0] - 1)
        # decimated-depth aware (see build_frame_rgbd)
        dy = gray.shape[0] // depth_img.shape[0]
        dx = gray.shape[1] // depth_img.shape[1]
        return depth_img[yi // dy, xi // dx]

    ds = sample_depth(kl.sp)
    de = sample_depth(kl.ep)
    Xs = cam_mod.backproject(cam, kl.sp, jnp.where(ds > 0, ds, 0.0))
    Xe = cam_mod.backproject(cam, kl.ep, jnp.where(de > 0, de, 0.0))
    return FrameLines(kl, nld, ds, de, Xs, Xe)


@functools.partial(jax.jit, static_argnames=("cam", "max_lines"))
def build_frame_lines_stereo(
    gray_l: jnp.ndarray,
    gray_r: jnp.ndarray,
    cam: cam_mod.Camera,
    max_lines: int = 128,
    max_disp: float = 128.0,
    theta_tol: float = 0.08,
    max_hamming: int = 80,
) -> FrameLines:
    """Line extraction with endpoint depths from left-right line matching on
    a rectified stereo pair.

    TPU re-derivation of the reference's stereo line depth path (reference:
    LineMatcher::SearchStereoMatchesByKnn + the endpoint disparity
    computation in Frame's stereo line setup): a 3D segment projects to a
    line in each rectified image; once the left keyline is matched to its
    right-image counterpart, the disparity at a left endpoint (u, v) is
    u - u_r(v) where u_r(v) solves the right line's equation at the same
    row. Near-horizontal lines (parallel to the epipolar rows) are
    degenerate and get no depth.
    """
    from ..features import lines as lines_mod
    from ..features.matching import hamming, _masked_best2

    kl_l = lines_mod.extract_lines(gray_l, max_lines=max_lines)
    kl_r = lines_mod.extract_lines(gray_r, max_lines=max_lines)
    nld_l = lines_mod.line_nld(kl_l.sp, kl_l.ep)
    nld_r = lines_mod.line_nld(kl_r.sp, kl_r.ep)

    th_l, _dl = lines_mod.line_theta_d(kl_l.sp, kl_l.ep)
    th_r, _dr = lines_mod.line_theta_d(kl_r.sp, kl_r.ep)
    dth = jnp.abs(th_l[:, None] - th_r[None, :])
    dth = jnp.minimum(dth, jnp.pi - dth)
    # vertical-extent overlap (rows are epipolar lines)
    v_lo_l = jnp.minimum(kl_l.sp[:, 1], kl_l.ep[:, 1])
    v_hi_l = jnp.maximum(kl_l.sp[:, 1], kl_l.ep[:, 1])
    v_lo_r = jnp.minimum(kl_r.sp[:, 1], kl_r.ep[:, 1])
    v_hi_r = jnp.maximum(kl_r.sp[:, 1], kl_r.ep[:, 1])
    v_overlap = (jnp.minimum(v_hi_l[:, None], v_hi_r[None, :])
                 - jnp.maximum(v_lo_l[:, None], v_lo_r[None, :]))
    cand = ((dth < theta_tol) & (v_overlap > 5.0)
            & kl_l.mask[:, None] & kl_r.mask[None, :])
    dist = hamming(kl_l.desc, kl_r.desc)
    best, second, idx = _masked_best2(dist, cand)
    ok = (best <= max_hamming) & (
        best.astype(jnp.float32) <= 0.9 * second.astype(jnp.float32))

    # disparity from the matched right line's equation nx u + ny v + d = 0
    nr = nld_r[idx]                     # [L, 3] matched right line
    nx, ny, dd = nr[:, 0], nr[:, 1], nr[:, 2]
    # epipolar degeneracy: horizontal lines have |nx| ~ 0
    nx_ok = jnp.abs(nx) > 0.15
    nx_safe = jnp.where(nx_ok, nx, 1.0)

    def endpoint_depth(xy):
        u_r = -(ny * xy[:, 1] + dd) / nx_safe
        disp = xy[:, 0] - u_r
        good = ok & nx_ok & (disp > 0.3) & (disp < max_disp) & kl_l.mask
        return jnp.where(good, cam.bf / jnp.maximum(disp, 0.3), 0.0)

    ds = endpoint_depth(kl_l.sp)
    de = endpoint_depth(kl_l.ep)
    # endpoint-depth consistency (reference: skLineStereoMaxDist gate)
    consistent = (ds > 0) & (de > 0) & (
        jnp.abs(ds - de) < 0.5 * jnp.maximum(ds, de))
    ds = jnp.where(consistent, ds, 0.0)
    de = jnp.where(consistent, de, 0.0)
    Xs = cam_mod.backproject(cam, kl_l.sp, ds)
    Xe = cam_mod.backproject(cam, kl_l.ep, de)
    return FrameLines(kl_l, nld_l, ds, de, Xs, Xe)


@functools.partial(jax.jit, static_argnames=("cam",))
def project_points(cam: cam_mod.Camera, R, t, xyz, margin: float = 8.0):
    """Project world points into a frame. Returns (uv [M,2], z [M], valid)."""
    from ..geometry import lie

    Xc = lie.se3_apply(R, t, xyz)
    uv = cam_mod.project(cam, Xc)
    z = Xc[..., 2]
    valid = (z > 0.05) & cam_mod.in_image(cam, uv, margin)
    return uv, z, valid
