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
    d = depth_img[yi, xi]
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
        return depth_img[yi, xi]

    ds = sample_depth(kl.sp)
    de = sample_depth(kl.ep)
    Xs = cam_mod.backproject(cam, kl.sp, jnp.where(ds > 0, ds, 0.0))
    Xe = cam_mod.backproject(cam, kl.ep, jnp.where(de > 0, de, 0.0))
    return FrameLines(kl, nld, ds, de, Xs, Xe)


@functools.partial(jax.jit, static_argnames=("cam",))
def project_points(cam: cam_mod.Camera, R, t, xyz, margin: float = 8.0):
    """Project world points into a frame. Returns (uv [M,2], z [M], valid)."""
    from ..geometry import lie

    Xc = lie.se3_apply(R, t, xyz)
    uv = cam_mod.project(cam, Xc)
    z = Xc[..., 2]
    valid = (z > 0.05) & cam_mod.in_image(cam, uv, margin)
    return uv, z, valid
