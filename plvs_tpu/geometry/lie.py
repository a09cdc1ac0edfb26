"""Batched Lie-group operations for TPU (SO3 / SE3 / Sim3).

TPU-native replacement for the reference's Sophus dependency
(reference: Thirdparty/Sophus — SE3/SO3/Sim3 groups with exp/log used
throughout e.g. src/Optimizer.cc, src/ImuTypes.cc). Re-derived from the
standard closed forms; everything is written as batched jax ops so poses for
all keyframes / all factors are transformed in one fused VPU pass instead of
per-object C++ calls.

Conventions
-----------
* Rotations are 3x3 matrices, poses are (R, t) pairs stored as a single
  ``[..., 3, 4]`` array or as separate arrays. Tangent vectors follow the
  (rho, theta) = (translation, rotation) ordering for SE3 (matching Sophus),
  and (rho, theta, sigma) with log-scale sigma for Sim3.
* All functions broadcast over leading batch dimensions.
* float32-safe: small-angle branches use Taylor expansions selected with
  ``jnp.where`` so everything stays jit/vmap/grad friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


def _safe_norm(v):
    """Norm with a finite gradient at v = 0 (plain jnp.linalg.norm has a NaN
    sqrt'(0) gradient, which poisons jacfwd through exp/log at identity)."""
    n2 = jnp.sum(v * v, axis=-1)
    return jnp.sqrt(jnp.maximum(n2, 1e-24))


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: [..., 3] -> [..., 3, 3] skew matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`hat`: [..., 3, 3] -> [..., 3]."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x with Taylor fallback."""
    x2 = x * x
    small = jnp.abs(x) < _EPS
    safe = jnp.where(small, 1.0, x)
    return jnp.where(small, 1.0 - x2 / 6.0, jnp.sin(safe) / safe)


def _cosc(x):
    """(1-cos(x))/x^2 with Taylor fallback."""
    x2 = x * x
    small = jnp.abs(x) < _EPS
    safe2 = jnp.where(small, 1.0, x2)
    return jnp.where(small, 0.5 - x2 / 24.0, (1.0 - jnp.cos(jnp.where(small, 1.0, x))) / safe2)


def _sin3(x):
    """(x - sin(x))/x^3 with Taylor fallback."""
    x2 = x * x
    small = jnp.abs(x) < _EPS
    safe3 = jnp.where(small, 1.0, x2 * x)
    return jnp.where(small, 1.0 / 6.0 - x2 / 120.0, (jnp.where(small, 1.0, x) - jnp.sin(jnp.where(small, 1.0, x))) / safe3)


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map so(3) -> SO(3). w: [..., 3] -> [..., 3, 3]."""
    theta = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + a * W + b * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map SO(3) -> so(3). R: [..., 3, 3] -> [..., 3].

    Numerically stable for angles near 0 and near pi (quaternion route).
    """
    # Convert through a quaternion: robust at theta ~ pi.
    q = rotmat_to_quat(R)  # [..., 4] (w, x, y, z), w >= 0
    qw = q[..., 0]
    qv = q[..., 1:]
    nv = _safe_norm(qv)
    # theta = 2 atan2(|qv|, qw); axis = qv/|qv|
    theta = 2.0 * jnp.arctan2(nv, qw)
    small = nv < _EPS
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), theta / jnp.where(small, 1.0, nv))
    return qv * scale[..., None]


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J_l of SO(3): integral of exp; used by se3_exp."""
    theta = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    b = _cosc(theta)[..., None, None]
    c = _sin3(theta)[..., None, None]
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + b * W + c * W2


def so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse left Jacobian of SO(3)."""
    theta = _safe_norm(w)
    W = hat(w)
    W2 = W @ W
    half = 0.5
    x = theta
    x2 = x * x
    small = jnp.abs(x) < _EPS
    safex = jnp.where(small, 1.0, x)
    # coefficient: 1/x^2 - (1+cos x)/(2 x sin x)
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + x2 / 720.0,
        1.0 / jnp.where(small, 1.0, x2)
        - (1.0 + jnp.cos(safex)) / (2.0 * safex * jnp.where(jnp.abs(jnp.sin(safex)) < _EPS, 1.0, jnp.sin(safex))),
    )
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - half * W + cot_term[..., None, None] * W2


# ---------------------------------------------------------------------------
# Quaternions (w, x, y, z)
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w,x,y,z) -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> unit quaternion [..., 4] with w >= 0.

    Branch-free Shepperd-style selection computed with jnp.where so it is
    batched & differentiable-safe away from branch boundaries.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate quaternions (up to scale), one per dominant element.
    qw0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx0 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy0 = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz0 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick the numerically largest pivot.
    c0 = 1.0 + tr
    c1 = 1.0 + m00 - m11 - m22
    c2 = 1.0 - m00 + m11 - m22
    c3 = 1.0 - m00 - m11 + m22
    cands = jnp.stack([c0, c1, c2, c3], axis=-1)
    idx = jnp.argmax(cands, axis=-1)
    qs = jnp.stack([qw0, qx0, qy0, qz0], axis=-2)  # [..., 4 pivots, 4]
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# SE(3): pose = (R [...,3,3], t [...,3]); tangent xi = [rho, theta] (6,)
# ---------------------------------------------------------------------------

def se3_exp(xi: jnp.ndarray):
    """Exp map se(3) -> SE(3). xi: [..., 6] (rho, theta) -> (R, t)."""
    rho, theta = xi[..., :3], xi[..., 3:]
    R = so3_exp(theta)
    J = so3_left_jacobian(theta)
    t = jnp.einsum("...ij,...j->...i", J, rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Log map SE(3) -> se(3) -> [..., 6] (rho, theta)."""
    theta = so3_log(R)
    Jinv = so3_left_jacobian_inv(theta)
    rho = jnp.einsum("...ij,...j->...i", Jinv, t)
    return jnp.concatenate([rho, theta], axis=-1)


def se3_inverse(R: jnp.ndarray, t: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_compose(R1, t1, R2, t2):
    """(R1,t1) * (R2,t2)."""
    return R1 @ R2, jnp.einsum("...ij,...j->...i", R1, t2) + t1


def se3_apply(R, t, p):
    """Apply pose to points p [..., 3]."""
    return jnp.einsum("...ij,...j->...i", R, p) + t


def se3_adjoint(R, t) -> jnp.ndarray:
    """Adjoint of SE(3) acting on (rho, theta)-ordered tangents: [..., 6, 6]."""
    tR = hat(t) @ R
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_from_mat(T: jnp.ndarray):
    return T[..., :3, :3], T[..., :3, 3]


def se3_to_mat(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Sim(3): (R, t, s); tangent zeta = [rho, theta, sigma] (7,), s = exp(sigma)
# ---------------------------------------------------------------------------

def _sim3_W(theta_vec: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """The Sim3 'W' matrix such that t = W @ rho.

    W = int_0^1 e^{sigma u} exp(u hat(theta)) du
      = A I + C hat(theta) + D hat(theta)^2, with the closed-form integrals
      I0 = (e^s - 1)/s, I1 = (e^s (s sin h - h cos h) + h) / (s^2 + h^2),
      I2 = (e^s (s cos h + h sin h) - s) / (s^2 + h^2)
      (s = sigma, h = |theta|), A = I0, C = I1/h, D = (I0 - I2)/h^2,
    with Taylor fallbacks near s = 0 and h = 0 for float32 stability.
    """
    h = _safe_norm(theta_vec)
    W = hat(theta_vec)
    W2 = W @ W
    es = jnp.exp(sigma)
    eps = 1e-4  # float32-safe threshold

    s_small = jnp.abs(sigma) < eps
    h_small = h < eps
    ss = jnp.where(s_small, 1.0, sigma)
    hh = jnp.where(h_small, 1.0, h)
    denom = ss * ss + hh * hh

    A = jnp.where(s_small, 1.0 + 0.5 * sigma + sigma * sigma / 6.0, (es - 1.0) / ss)

    I1 = (es * (ss * jnp.sin(hh) - hh * jnp.cos(hh)) + hh) / denom
    I2 = (es * (ss * jnp.cos(hh) + hh * jnp.sin(hh)) - ss) / denom
    I0g = (es - 1.0) / ss  # only used where not s_small

    C_gen = I1 / hh
    D_gen = (jnp.where(s_small, A, I0g) - I2) / (hh * hh)

    # h -> 0 limits (sigma general, then sigma also small)
    C_h0 = jnp.where(s_small, 0.5 + sigma / 3.0, (es * (ss - 1.0) + 1.0) / (ss * ss))
    D_h0 = jnp.where(
        s_small,
        1.0 / 6.0 + sigma / 8.0,
        (es * (ss * ss - 2.0 * ss + 2.0) - 2.0) / (2.0 * ss ** 3),
    )

    # s -> 0 limits with h general (classic SE3 left-Jacobian coefficients,
    # plus first-order sigma correction is negligible below eps)
    C_s0 = (1.0 - jnp.cos(hh)) / (hh * hh)
    D_s0 = (hh - jnp.sin(hh)) / (hh ** 3)

    C = jnp.where(h_small, C_h0, jnp.where(s_small, C_s0, C_gen))
    D = jnp.where(h_small, D_h0, jnp.where(s_small, D_s0, D_gen))

    I = jnp.broadcast_to(jnp.eye(3, dtype=theta_vec.dtype), W.shape)
    return A[..., None, None] * I + C[..., None, None] * W + D[..., None, None] * W2


def sim3_exp(zeta: jnp.ndarray):
    """Exp map sim(3) -> Sim(3). zeta: [..., 7] (rho, theta, sigma) -> (R, t, s)."""
    rho, theta, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    R = so3_exp(theta)
    Wm = _sim3_W(theta, sigma)
    t = jnp.einsum("...ij,...j->...i", Wm, rho)
    return R, t, jnp.exp(sigma)


def sim3_log(R: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Log map Sim(3) -> sim(3). Solves W rho = t with a 3x3 solve."""
    theta = so3_log(R)
    sigma = jnp.log(s)
    Wm = _sim3_W(theta, sigma)
    rho = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([rho, theta, sigma[..., None]], axis=-1)


def sim3_inverse(R, t, s):
    Rt = jnp.swapaxes(R, -1, -2)
    inv_s = 1.0 / s
    return Rt, -inv_s[..., None] * jnp.einsum("...ij,...j->...i", Rt, t), inv_s


def sim3_compose(R1, t1, s1, R2, t2, s2):
    """(R1,t1,s1) * (R2,t2,s2): x -> s1 R1 (s2 R2 x + t2) + t1."""
    return (
        R1 @ R2,
        s1[..., None] * jnp.einsum("...ij,...j->...i", R1, t2) + t1,
        s1 * s2,
    )


def sim3_apply(R, t, s, p):
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, p) + t


def normalize_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Re-orthonormalize a drifting rotation matrix via quaternion round-trip."""
    return quat_to_rotmat(rotmat_to_quat(R))
