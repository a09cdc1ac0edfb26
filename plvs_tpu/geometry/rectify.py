"""Image-level stereo rectification: precomputed remap tables.

TPU-native equivalent of the reference's rectification path (reference:
`Camera.needRectification` + the cv::stereoRectify/initUndistortRectifyMap
setup in Settings, src/Settings.cc:205-207,280 — calibrated non-rectified
pairs are warped to a common row-aligned pinhole pair before the row-scan
stereo matcher and the dense stereo engine see them; the dense mapper's
fisheye path rectifies the same way, include/PointCloudKeyFrame.h:113).

Design: the rectifying rotations come from Bouguet's construction (baseline
to the x-axis, split between the two views); the per-camera maps store, for
every RECTIFIED pixel, its source pixel through the ORIGINAL camera model
(radtan pinhole or KB8 fisheye — any model `geometry.cameras` projects).
The warp itself is one jitted bilinear gather per image, so the per-frame
cost is a single fused device pass, and everything downstream (row-scan
matcher, census/SGM dense stereo, line endpoint depths) runs the rectified
fast path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import cameras as cam_mod


class RectifyMaps(NamedTuple):
    """Precomputed rectification (host-resident numpy; uploaded once)."""

    cam: cam_mod.Camera          # common rectified pinhole (bf set)
    map_l: np.ndarray            # [H, W, 2] source pixel per rectified pixel
    map_r: np.ndarray
    R_rect_l: np.ndarray         # [3,3] cam_l -> rectified-left rotation
    R_rect_r: np.ndarray         # [3,3] cam_r -> rectified-right rotation


def stereo_rectify(cam_l: cam_mod.Camera, cam_r: cam_mod.Camera,
                   T_c1_c2: np.ndarray,
                   width: int | None = None,
                   height: int | None = None) -> RectifyMaps:
    """Build rectification maps for a calibrated stereo pair.

    ``T_c1_c2`` is the right-to-left transform X_c1 = R X_c2 + t (the
    reference's Stereo.T_c1_c2, src/Settings.cc:404-409).
    """
    T = np.asarray(T_c1_c2, np.float64)
    R_lr = T[:3, :3]
    t_lr = T[:3, 3]                      # right camera center in left frame
    b = float(np.linalg.norm(t_lr))
    if b < 1e-9:
        raise ValueError("degenerate stereo baseline")

    # Bouguet: rectified x-axis along the baseline, z close to the mean
    # optical axis
    e1 = t_lr / b
    z0 = np.asarray([0.0, 0.0, 1.0])
    e2 = np.cross(z0, e1)
    n2 = np.linalg.norm(e2)
    if n2 < 1e-9:                        # baseline parallel to z (unusual)
        e2 = np.asarray([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    R_rect_l = np.stack([e1, e2, e3])    # rows: rectified axes in cam_l
    # right view first rotates into the left frame: X_c1 = R_lr X_c2
    R_rect_r = R_rect_l @ R_lr

    W = int(width or cam_l.width)
    H = int(height or cam_l.height)
    fx = 0.5 * (cam_l.fx + cam_r.fx)
    fy = 0.5 * (cam_l.fy + cam_r.fy)
    f = 0.5 * (fx + fy)
    rect_cam = cam_mod.pinhole(f, f, W / 2.0, H / 2.0, width=W, height=H,
                               bf=f * b)

    def build_map(src_cam: cam_mod.Camera, R_rect: np.ndarray) -> np.ndarray:
        ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
        uv = np.stack([xs, ys], -1).reshape(-1, 2)
        # rectified pixel -> rectified ray -> source-camera ray -> source px
        rays = np.stack([(uv[:, 0] - rect_cam.cx) / rect_cam.fx,
                         (uv[:, 1] - rect_cam.cy) / rect_cam.fy,
                         np.ones(len(uv), np.float32)], -1)
        rays_src = rays @ R_rect.astype(np.float32)   # R_rect^T @ ray, rowwise
        uv_src = np.array(jax.jit(
            lambda r: cam_mod.project(src_cam, r))(jnp.asarray(rays_src)))
        # behind-camera rays map far outside -> bilinear gather zeros them
        bad = rays_src[:, 2] <= 1e-6
        uv_src[bad] = -1e6
        return uv_src.reshape(H, W, 2).astype(np.float32)

    return RectifyMaps(rect_cam, build_map(cam_l, R_rect_l),
                       build_map(cam_r, R_rect_r),
                       R_rect_l.astype(np.float32),
                       R_rect_r.astype(np.float32))


@functools.partial(jax.jit, static_argnames=())
def remap_bilinear(img: jnp.ndarray, map_xy: jnp.ndarray) -> jnp.ndarray:
    """Warp ``img`` [H,W] by the precomputed map (source pixel per output
    pixel); out-of-bounds samples become 0 (one fused device pass)."""
    H, W = img.shape
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx_ = x - x0
    fy_ = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(ok, v, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return ((1 - fy_) * ((1 - fx_) * v00 + fx_ * v01)
            + fy_ * ((1 - fx_) * v10 + fx_ * v11))


class StereoRectifier:
    """Per-frame rectification front end: holds device-resident maps and
    warps both images in two jitted gathers."""

    def __init__(self, cam_l: cam_mod.Camera, cam_r: cam_mod.Camera,
                 T_c1_c2: np.ndarray):
        self.maps = stereo_rectify(cam_l, cam_r, T_c1_c2)
        self._map_l_d = jnp.asarray(self.maps.map_l)
        self._map_r_d = jnp.asarray(self.maps.map_r)

    @property
    def cam(self) -> cam_mod.Camera:
        return self.maps.cam

    def __call__(self, gray_l, gray_r):
        gl = remap_bilinear(jnp.asarray(gray_l, jnp.float32), self._map_l_d)
        gr = remap_bilinear(jnp.asarray(gray_r, jnp.float32), self._map_r_d)
        return gl, gr
