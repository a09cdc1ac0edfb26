"""Batched camera models: Pinhole (+radtan distortion) and Kannala-Brandt8.

TPU-native replacement for the reference's GeometricCamera hierarchy
(reference: include/CameraModels/GeometricCamera.h:83-151,
src/CameraModels/Pinhole.cpp, src/CameraModels/KannalaBrandt8.cpp). Instead
of virtual dispatch per point, a camera here is a small static pytree of
parameters and every operation is batched over points; Jacobians come from
closed forms (not autodiff) so they fuse into the GN/LM solver kernels.

Camera convention: z forward, x right, y down; pixel = K * normalize(Xc).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

PINHOLE = 0
KANNALA_BRANDT8 = 1


class Camera(NamedTuple):
    """A unified camera parameter block (hashable static config).

    ``kind`` selects the model (PINHOLE / KANNALA_BRANDT8); ``params`` is a
    plain tuple of python floats so the whole Camera can be a static jit
    argument — jit specializes per camera, like the reference specializes by
    subclass, and the intrinsics fold into the compiled kernels as constants.

    params layout:
      PINHOLE:          (fx, fy, cx, cy, k1, k2, p1, p2, k3) (radtan, may be 0)
      KANNALA_BRANDT8:  (fx, fy, cx, cy, k1, k2, k3, k4)
    """

    kind: int
    params: tuple
    width: int = 640
    height: int = 480
    bf: float = 0.0  # stereo baseline * fx (reference: Frame.mbf)

    @property
    def fx(self):
        return self.params[0]

    @property
    def fy(self):
        return self.params[1]

    @property
    def cx(self):
        return self.params[2]

    @property
    def cy(self):
        return self.params[3]

    @property
    def K(self):
        fx, fy, cx, cy = self.params[:4]
        return jnp.asarray(
            [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32
        )


def pinhole(fx, fy, cx, cy, dist=None, width=640, height=480, bf=0.0) -> Camera:
    d = [0.0] * 5 if dist is None else list(float(x) for x in dist)
    d = d + [0.0] * (5 - len(d))
    p = (float(fx), float(fy), float(cx), float(cy), *d)
    return Camera(PINHOLE, p, int(width), int(height), float(bf))


def kannala_brandt8(fx, fy, cx, cy, k1, k2, k3, k4, width=640, height=480, bf=0.0) -> Camera:
    p = tuple(float(v) for v in (fx, fy, cx, cy, k1, k2, k3, k4))
    return Camera(KANNALA_BRANDT8, p, int(width), int(height), float(bf))


def scale_camera(cam: Camera, s: float) -> Camera:
    """Camera for images resized by factor ``s`` (reference:
    Camera.imageScale handling — System::TrackRGBD rescales images and
    Settings scales fx/fy/cx/cy/bf accordingly). Distortion coefficients
    are scale-invariant; bf is in pixel-metres so it scales with fx."""
    fx, fy, cx, cy, *rest = cam.params
    p = (fx * s, fy * s, cx * s, cy * s, *rest)
    return Camera(cam.kind, p, int(round(cam.width * s)),
                  int(round(cam.height * s)), cam.bf * s)


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------

def _pinhole_project(params, Xc):
    """Project camera-frame points [..., 3] -> pixels [..., 2] (with radtan)."""
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    z = Xc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    x = Xc[..., 0] * inv_z
    y = Xc[..., 1] * inv_z
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def _kb8_theta_d(params, theta):
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    t2 = theta * theta
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def _kb8_project(params, Xc):
    """Kannala-Brandt (equidistant + poly) projection.

    reference behavior: src/CameraModels/KannalaBrandt8.cpp project().
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    theta_d = _kb8_theta_d(params, theta)
    inv_r = 1.0 / jnp.where(r < 1e-9, 1e-9, r)
    scale = jnp.where(r < 1e-9, 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z), theta_d * inv_r)
    return jnp.stack([fx * x * scale + cx, fy * y * scale + cy], axis=-1)


def project(cam: Camera, Xc: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame 3D points [..., 3] -> pixel coords [..., 2]."""
    if cam.kind == PINHOLE:
        return _pinhole_project(cam.params, Xc)
    return _kb8_project(cam.params, Xc)


def project_jac(cam: Camera, Xc: jnp.ndarray) -> jnp.ndarray:
    """d(pixel)/d(Xc): [..., 2, 3] closed-form Jacobian.

    (reference: GeometricCamera::projectJac,
    src/CameraModels/Pinhole.cpp / KannalaBrandt8.cpp projectJac)
    For pinhole, the distortion-free Jacobian is used (the reference tracks on
    undistorted/rectified keypoints, so BA Jacobians are distortion-free too).
    """
    if cam.kind == PINHOLE:
        fx, fy = cam.params[0], cam.params[1]
        x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z2 = inv_z * inv_z
        zr = jnp.zeros_like(x)
        row0 = jnp.stack([fx * inv_z, zr, -fx * x * inv_z2], axis=-1)
        row1 = jnp.stack([zr, fy * inv_z, -fy * y * inv_z2], axis=-1)
        return jnp.stack([row0, row1], axis=-2)
    # KB8: closed form via chain rule.
    params = cam.params
    fx, fy = params[0], params[1]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    r2 = x * x + y * y
    r = jnp.sqrt(r2)
    r_safe = jnp.where(r < 1e-9, 1e-9, r)
    norm2 = r2 + z * z
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
    d_thetad_d_theta = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + 9.0 * k4 * t2)))
    d_theta_dx = x * z / (norm2 * r_safe)
    d_theta_dy = y * z / (norm2 * r_safe)
    d_theta_dz = -r / norm2
    s = theta_d / r_safe
    ds_dtheta = d_thetad_d_theta / r_safe
    # ds/dr (explicit r dependence) = -theta_d / r^2
    ds_dx = ds_dtheta * d_theta_dx + (-theta_d / (r_safe * r_safe)) * (x / r_safe)
    ds_dy = ds_dtheta * d_theta_dy + (-theta_d / (r_safe * r_safe)) * (y / r_safe)
    ds_dz = ds_dtheta * d_theta_dz
    row0 = jnp.stack([fx * (s + x * ds_dx), fx * x * ds_dy, fx * x * ds_dz], axis=-1)
    row1 = jnp.stack([fy * y * ds_dx, fy * (s + y * ds_dy), fy * y * ds_dz], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


# ---------------------------------------------------------------------------
# Unprojection
# ---------------------------------------------------------------------------

def _pinhole_unproject(params, uv):
    """Pixels -> unit-depth camera rays [..., 3].

    Newton solve of distort(x) = x_d with the closed-form 2x2 Jacobian —
    converges even for strong radial distortion where the classic fixed-point
    iteration (cv::undistortPoints-style) diverges near the image border.
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, p1, p2, k3 = params[4], params[5], params[6], params[7], params[8]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dradial = 2.0 * (k1 + r2 * (2.0 * k2 + 3.0 * k3 * r2))
        fx_ = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x) - xd
        fy_ = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y - yd
        j00 = radial + x * x * dradial + 2.0 * p1 * y + 6.0 * p2 * x
        j01 = x * y * dradial + 2.0 * p1 * x + 2.0 * p2 * y
        j10 = x * y * dradial + 2.0 * p2 * y + 2.0 * p1 * x
        j11 = radial + y * y * dradial + 2.0 * p2 * x + 6.0 * p1 * y
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        return (x - (j11 * fx_ - j01 * fy_) / det, y - (-j10 * fx_ + j00 * fy_) / det)

    x, y = jax.lax.fori_loop(0, 10, body, (xd, yd))
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def _kb8_unproject(params, uv):
    """KB8 unprojection: Newton solve of theta_d(theta) = d.

    (reference: KannalaBrandt8::unproject's iterative solve,
    src/CameraModels/KannalaBrandt8.cpp)
    """
    fx, fy, cx, cy = params[0], params[1], params[2], params[3]
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    mx = (uv[..., 0] - cx) / fx
    my = (uv[..., 1] - cy) / fy
    theta_d = jnp.sqrt(mx * mx + my * my)
    theta_d_c = jnp.clip(theta_d, 0.0, jnp.pi)

    def body(_, theta):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d_c
        fp = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + 9.0 * k4 * t2)))
        return theta - f / jnp.where(jnp.abs(fp) < 1e-9, 1e-9, fp)

    theta = jax.lax.fori_loop(0, 10, body, theta_d_c)
    scale = jnp.where(theta_d < 1e-9, 1.0, jnp.tan(theta) / jnp.where(theta_d < 1e-9, 1.0, theta_d))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def unproject(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Pixels [..., 2] -> unit-depth rays [..., 3] (z = 1)."""
    if cam.kind == PINHOLE:
        return _pinhole_unproject(cam.params, uv)
    return _kb8_unproject(cam.params, uv)


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixels + depth -> camera-frame 3D points."""
    return unproject(cam, uv) * depth[..., None]


def undistort_points(cam: Camera, uv: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels -> ideal-pinhole pixels through K (reference:
    Frame::UndistortKeyPoints, src/Frame.cc)."""
    rays = unproject(cam, uv)
    fx, fy, cx, cy = cam.params[0], cam.params[1], cam.params[2], cam.params[3]
    return jnp.stack([fx * rays[..., 0] + cx, fy * rays[..., 1] + cy], axis=-1)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Visibility mask for pixel coords."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


def stereo_disparity_u(cam: Camera, Xc: jnp.ndarray) -> jnp.ndarray:
    """Right-image u coordinate for rectified stereo: uR = uL - bf/z
    (reference: Frame.mvuRight semantics, src/Frame.cc ComputeStereoMatches)."""
    uv = project(cam, Xc)
    z = Xc[..., 2]
    return uv[..., 0] - cam.bf / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
