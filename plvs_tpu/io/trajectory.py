"""Trajectory writers: TUM, KITTI and EuRoC formats.

(reference: System::SaveTrajectoryTUM / SaveTrajectoryKITTI /
SaveTrajectoryEuRoC, include/System.h:179-200)
"""

from __future__ import annotations

import numpy as np


def _cam_in_world(R_cw: np.ndarray, t_cw: np.ndarray):
    R_wc = R_cw.T
    return R_wc, -R_wc @ t_cw


def write_tum(path: str, trajectory):
    """Rows: t tx ty tz qx qy qz qw (camera-in-world)."""
    import jax.numpy as jnp

    from ..geometry import lie

    with open(path, "w") as f:
        for ts, R, t in trajectory:
            Rwc, twc = _cam_in_world(R, t)
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(Rwc)))
            f.write(
                f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                f"{q[1]:.7f} {q[2]:.7f} {q[3]:.7f} {q[0]:.7f}\n"
            )


def write_kitti(path: str, trajectory):
    """Rows: flattened 3x4 [R_wc | t_wc] per frame (KITTI odometry format)."""
    with open(path, "w") as f:
        for ts, R, t in trajectory:
            Rwc, twc = _cam_in_world(R, t)
            T = np.hstack([Rwc, twc[:, None]])
            f.write(" ".join(f"{v:.9e}" for v in T.reshape(-1)) + "\n")


def write_euroc(path: str, trajectory):
    """EuRoC csv: timestamp_ns, px, py, pz, qw, qx, qy, qz."""
    import jax.numpy as jnp

    from ..geometry import lie

    with open(path, "w") as f:
        f.write("#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z\n")
        for ts, R, t in trajectory:
            Rwc, twc = _cam_in_world(R, t)
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(Rwc)))
            f.write(
                f"{int(ts * 1e9)},{twc[0]:.6f},{twc[1]:.6f},{twc[2]:.6f},"
                f"{q[0]:.6f},{q[1]:.6f},{q[2]:.6f},{q[3]:.6f}\n"
            )


def read_tum(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            rows.append([float(x) for x in line.split()])
    return np.asarray(rows)
