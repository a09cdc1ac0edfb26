"""IMU preintegration on manifold, as a single lax.scan.

TPU-native re-derivation of the reference's IMU::Preintegrated
(reference: src/ImuTypes.cc / include/ImuTypes.h:64-208 — ΔR/ΔV/ΔP,
bias Jacobians JRg/JVg/JVa/JPg/JPa, 15x15 covariance propagated through
IntegrateNewMeasurement, bias-corrected getters and Reintegrate). The
per-sample sequential update is expressed as one ``lax.scan`` over the
measurement window, so a whole inter-keyframe batch preintegrates in one
compiled kernel, and re-integration after a bias update is just re-running
the scan (or the first-order bias correction, as in the reference).

State ordering for the 15x15 covariance: [δθ(3), δv(3), δp(3), δbg(3), δba(3)].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie

GRAVITY = jnp.asarray([0.0, 0.0, -9.81], jnp.float32)


class ImuCalib(NamedTuple):
    """Noise densities (continuous-time), like the reference's IMU::Calib
    (include/ImuTypes.h)."""

    gyro_noise: float = 1.7e-4    # rad/s/sqrt(Hz)
    acc_noise: float = 2.0e-3     # m/s^2/sqrt(Hz)
    gyro_walk: float = 1.9e-5     # rad/s^2/sqrt(Hz)
    acc_walk: float = 3.0e-3      # m/s^3/sqrt(Hz)


class Preintegrated(NamedTuple):
    """Result of preintegrating a window of IMU samples at a fixed bias."""

    dT: jnp.ndarray        # [] total time
    dR: jnp.ndarray        # [3,3]
    dV: jnp.ndarray        # [3]
    dP: jnp.ndarray        # [3]
    # bias Jacobians
    JRg: jnp.ndarray       # [3,3] d(dR)/d(bg)
    JVg: jnp.ndarray       # [3,3]
    JVa: jnp.ndarray       # [3,3]
    JPg: jnp.ndarray       # [3,3]
    JPa: jnp.ndarray       # [3,3]
    cov: jnp.ndarray       # [15,15]
    bias_gyro: jnp.ndarray  # [3] linearization bias
    bias_acc: jnp.ndarray   # [3]


def preintegrate(
    gyro: jnp.ndarray,     # [T,3] rad/s
    acc: jnp.ndarray,      # [T,3] m/s^2 (body frame, includes gravity reaction)
    dts: jnp.ndarray,      # [T] seconds
    bias_gyro: jnp.ndarray,
    bias_acc: jnp.ndarray,
    calib: ImuCalib = ImuCalib(),
    mask: jnp.ndarray | None = None,
) -> Preintegrated:
    """Integrate a window of samples (midpoint-free, per-sample forward Euler
    on the manifold like the reference's IntegrateNewMeasurement)."""
    T = gyro.shape[0]
    if mask is None:
        mask = jnp.ones((T,), bool)

    Ng = calib.gyro_noise ** 2
    Na = calib.acc_noise ** 2
    Nwg = calib.gyro_walk ** 2
    Nwa = calib.acc_walk ** 2

    def step(carry, inp):
        dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, dT = carry
        w, a, dt, m = inp
        dt = jnp.where(m, dt, 0.0)
        w = w - bias_gyro
        a = a - bias_acc

        # position/velocity first (use current dR), as in the reference
        acc_w = dR @ a
        dP_n = dP + dV * dt + 0.5 * acc_w * dt * dt
        dV_n = dV + acc_w * dt

        # Jacobians w.r.t. bias (reference: ImuTypes.cc order)
        aH = lie.hat(a)
        JPa_n = JPa + JVa * dt - 0.5 * dt * dt * dR
        JPg_n = JPg + JVg * dt - 0.5 * dt * dt * (dR @ aH) @ JRg
        JVa_n = JVa - dR * dt
        JVg_n = JVg - dt * (dR @ aH) @ JRg

        # rotation increment
        dRi = lie.so3_exp(w * dt)
        rightJ = lie.so3_left_jacobian(-w * dt)  # right Jacobian J_r(θ)=J_l(-θ)

        # covariance propagation: x = [δθ, δv, δp, δbg, δba]
        A = jnp.zeros((15, 15), dR.dtype)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR @ aH * dt)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 0:3].set(-0.5 * dR @ aH * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        A = A.at[9:15, 9:15].set(jnp.eye(6))
        B = jnp.zeros((15, 6), dR.dtype)
        B = B.at[0:3, 0:3].set(rightJ * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt * dt)
        Qn = jnp.diag(
            jnp.concatenate([jnp.full((3,), Ng), jnp.full((3,), Na)])
        ) / jnp.maximum(dt, 1e-6)
        C_n = A @ C @ A.T + B @ Qn @ B.T
        C_n = C_n.at[9:12, 9:12].add(jnp.eye(3) * Nwg * dt)
        C_n = C_n.at[12:15, 12:15].add(jnp.eye(3) * Nwa * dt)

        dR_n = lie.normalize_rotation(dR @ dRi)
        JRg_n = dRi.T @ JRg - rightJ * dt

        new = (dR_n, dV_n, dP_n, JRg_n, JVg_n, JVa_n, JPg_n, JPa_n, C_n, dT + dt)
        # masked samples leave the state untouched
        out = jax.tree.map(lambda n, o: jnp.where(m, n, o), new, carry)
        return out, None

    I3 = jnp.eye(3, dtype=gyro.dtype)
    Z3 = jnp.zeros((3, 3), gyro.dtype)
    init = (
        I3, jnp.zeros(3, gyro.dtype), jnp.zeros(3, gyro.dtype),
        Z3, Z3, Z3, Z3, Z3,
        jnp.zeros((15, 15), gyro.dtype), jnp.zeros((), gyro.dtype),
    )
    (dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C, dT), _ = jax.lax.scan(
        step, init, (gyro, acc, dts, mask)
    )
    return Preintegrated(dT, dR, dV, dP, JRg, JVg, JVa, JPg, JPa, C,
                         bias_gyro, bias_acc)


import functools as _functools  # noqa: E402


@_functools.partial(jax.jit, static_argnames=("calib",))
def _preintegrate_jit(gyro, acc, dts, bias_gyro, bias_acc, calib, mask):
    return preintegrate(gyro, acc, dts, bias_gyro, bias_acc, calib, mask)


def preintegrate_padded(gyro, acc, dts, bias_gyro, bias_acc,
                        calib: ImuCalib = ImuCalib(), lo: int = 32):
    """Jitted, BUCKET-PADDED preintegration for the realtime path: the raw
    eager scan compiles per distinct sample count (a frame gap at 300 Hz
    jitters 8-12 samples, and through the tunnel backend every new count is
    a fresh multi-second compile inside the tracking loop). Pads the window
    to a power-of-two capacity with masked zero samples — masked steps are
    exact no-ops in the scan — and dispatches ONE compiled program."""
    import numpy as _np

    T = int(gyro.shape[0])
    Tb = lo
    while Tb < T:
        Tb *= 2
    if Tb > T:
        pad = ((0, Tb - T), (0, 0))
        gyro = _np.pad(_np.asarray(gyro, _np.float32), pad)
        acc = _np.pad(_np.asarray(acc, _np.float32), pad)
        dts = _np.pad(_np.asarray(dts, _np.float32), ((0, Tb - T),))
    mask = _np.zeros((Tb,), bool)
    mask[:T] = True
    return _preintegrate_jit(jnp.asarray(gyro), jnp.asarray(acc),
                             jnp.asarray(dts), jnp.asarray(bias_gyro),
                             jnp.asarray(bias_acc), calib,
                             jnp.asarray(mask))


# -- bias-corrected getters (reference: GetDeltaRotation/Velocity/Position) --

@jax.jit
def deltas_jit(p: "Preintegrated", bias_gyro, bias_acc):
    """All bias-corrected deltas + the prior-relevant stats in ONE jitted
    program: the realtime VI path needs (dR, dV, dP, dT, cov) every frame,
    and fetching them as separate eager expressions costs one tunnel round
    trip EACH (~25 ms flat per await, measured)."""
    return (delta_rotation(p, bias_gyro),
            delta_velocity(p, bias_gyro, bias_acc),
            delta_position(p, bias_gyro, bias_acc),
            p.dT, p.cov)


def delta_rotation(p: Preintegrated, bias_gyro: jnp.ndarray) -> jnp.ndarray:
    db = bias_gyro - p.bias_gyro
    return p.dR @ lie.so3_exp(p.JRg @ db)


def delta_velocity(p: Preintegrated, bias_gyro, bias_acc) -> jnp.ndarray:
    return p.dV + p.JVg @ (bias_gyro - p.bias_gyro) + p.JVa @ (bias_acc - p.bias_acc)


def delta_position(p: Preintegrated, bias_gyro, bias_acc) -> jnp.ndarray:
    return p.dP + p.JPg @ (bias_gyro - p.bias_gyro) + p.JPa @ (bias_acc - p.bias_acc)


def inertial_residual(
    p: Preintegrated,
    R1, p1, v1,            # body state at t1 (world frame, R_wb)
    R2, p2, v2,            # body state at t2
    bias_gyro, bias_acc,
    gravity: jnp.ndarray = GRAVITY,
):
    """9D preintegration residual (er, ev, ep) — the reference's EdgeInertial
    (include/G2oTypes.h:532-585).
    """
    dT = p.dT
    dR = delta_rotation(p, bias_gyro)
    dV = delta_velocity(p, bias_gyro, bias_acc)
    dP = delta_position(p, bias_gyro, bias_acc)
    er = lie.so3_log(dR.T @ R1.T @ R2)
    ev = R1.T @ (v2 - v1 - gravity * dT) - dV
    ep = R1.T @ (p2 - p1 - v1 * dT - 0.5 * gravity * dT * dT) - dP
    return jnp.concatenate([er, ev, ep])
