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
