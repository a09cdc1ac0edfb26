"""Synthetic RGB-D sequence generator for end-to-end SLAM tests/benchmarks.

The reference validates only on real datasets (TUM/KITTI/EuRoC, see
SURVEY.md §4); this module adds what it lacks: a deterministic, ground-truth
sequence so CI can gate ATE without dataset downloads. Scene = textured
fronto-parallel wall (plus optional second plane) rendered by ray-plane
intersection; depth is exact.
"""

from __future__ import annotations

import numpy as np

from ..geometry import cameras as cam_mod


def make_texture(size: int = 1024, rng: np.random.Generator | None = None) -> np.ndarray:
    """High-contrast blob texture rich in FAST corners."""
    rng = rng or np.random.default_rng(0)
    tex = np.full((size, size), 40.0, np.float32)
    n = (size // 28) ** 2
    xs = rng.integers(8, size - 24, n)
    ys = rng.integers(8, size - 24, n)
    for x, y in zip(xs, ys):
        w = int(rng.integers(6, 18))
        h = int(rng.integers(6, 18))
        tex[y : y + h, x : x + w] = rng.uniform(90, 250)
    tex += rng.normal(size=tex.shape).astype(np.float32) * 2.0
    return np.clip(tex, 0, 255)


def make_line_texture(size: int = 1024,
                      rng: np.random.Generator | None = None,
                      n_bars: int = 26, n_blobs: int = 40) -> np.ndarray:
    """Low-corner-density texture dominated by long straight bars.

    Exercises the line pipeline: point-only tracking survives on the few
    blobs but drifts; line landmarks along the bars should tighten the pose
    solves (the PLVS motivation — low-texture man-made scenes,
    reference README.md:14)."""
    rng = rng or np.random.default_rng(3)
    tex = np.full((size, size), 55.0, np.float32)
    for _ in range(n_bars):
        # long bar through a random anchor at a random angle
        ang = rng.uniform(0, np.pi)
        cx, cy = rng.uniform(0, size, 2)
        width = float(rng.integers(3, 9))
        val = float(rng.uniform(140, 250))
        L = size * 1.5
        n_samp = int(L)
        ts = np.linspace(-L / 2, L / 2, n_samp)
        dx, dy = np.cos(ang), np.sin(ang)
        for off in np.arange(-width / 2, width / 2 + 0.5, 0.5):
            xs = (cx + ts * dx - off * dy).astype(int) % size
            ys = (cy + ts * dy + off * dx).astype(int) % size
            tex[ys, xs] = val
    # sparse weak blobs so the point tracker stays alive
    xs = rng.integers(8, size - 16, n_blobs)
    ys = rng.integers(8, size - 16, n_blobs)
    for x, y in zip(xs, ys):
        w = int(rng.integers(5, 10))
        tex[y : y + w, x : x + w] = rng.uniform(90, 200)
    tex += rng.normal(size=tex.shape).astype(np.float32) * 1.5
    return np.clip(tex, 0, 255)


def _so3_exp_np(w: np.ndarray) -> np.ndarray:
    """Host-side Rodrigues formula — the trajectory generator is a data
    source and must never dispatch to (or wait on) an accelerator."""
    th = float(np.linalg.norm(w))
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]],
                 np.float64)
    if th < 1e-12:
        return np.eye(3, dtype=np.float32)
    A, B = np.sin(th) / th, (1 - np.cos(th)) / th ** 2
    return (np.eye(3) + A * K + B * (K @ K)).astype(np.float32)


def default_trajectory(n_frames: int = 60) -> list[tuple[np.ndarray, np.ndarray]]:
    """World-to-camera poses: lateral sweep + mild yaw/depth changes."""
    poses = []
    for i in range(n_frames):
        s = i / max(n_frames - 1, 1)
        yaw = 0.10 * np.sin(2 * np.pi * s)
        pitch = 0.04 * np.sin(4 * np.pi * s)
        C = np.array([0.8 * s, 0.12 * np.sin(2 * np.pi * s), 0.25 * s], np.float32)
        R = _so3_exp_np(np.array([pitch, yaw, 0.0]))
        t = (-R @ C).astype(np.float32)
        poses.append((R.astype(np.float32), t))
    return poses


class SyntheticRGBD:
    """Renders frames of a textured wall at world z = wall_z.

    Camera convention matches the framework: x right, y down, z forward;
    world frame = first camera frame of the canonical trajectory.
    """

    def __init__(self, cam: cam_mod.Camera, wall_z: float = 3.0,
                 tex_size: int = 1024, tex_scale: float = 220.0,
                 seed: int = 0, texture: np.ndarray | None = None):
        self.cam = cam
        self.wall_z = wall_z
        self.tex = (texture if texture is not None
                    else make_texture(tex_size, np.random.default_rng(seed)))
        self.tex_scale = tex_scale  # pixels per world unit on the wall
        # camera-model-generic ray table (pinhole or KB8 fisheye): rays at
        # z=1 so the plane-intersection scalar is the camera z-depth
        h, w = cam.height, cam.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        import jax
        import jax.numpy as jnp

        uv = np.stack([xs, ys], -1).reshape(-1, 2)
        # the renderer is a host-side data source — pin its one jax call to
        # the CPU backend so it never touches (or waits on) an accelerator
        try:
            cpu = jax.local_devices(backend="cpu")[0]
            with jax.default_device(cpu):
                rays = np.asarray(cam_mod.unproject(cam, jnp.asarray(uv)))
        except RuntimeError:
            rays = np.asarray(cam_mod.unproject(cam, jnp.asarray(uv)))
        self._rays_c = rays.T  # [3, H*W]

    def render(self, R: np.ndarray, t: np.ndarray):
        """Returns (gray [H,W] f32, depth [H,W] f32 meters)."""
        from scipy.ndimage import map_coordinates

        h, w = self.cam.height, self.cam.width
        rays_c = self._rays_c  # camera-frame rays, z = 1
        Rwc = R.T
        C = -Rwc @ t
        rays_w = Rwc @ rays_c
        denom = rays_w[2]
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        a = (self.wall_z - C[2]) / denom
        Xw = C[:, None] + a * rays_w
        depth = a.reshape(h, w).astype(np.float32)  # camera z (rays have z=1)
        # texture lookup (wrap)
        ts = self.tex.shape[0]
        u = (Xw[0] * self.tex_scale) % ts
        v = (Xw[1] * self.tex_scale) % ts
        gray = map_coordinates(self.tex, [v.reshape(-1), u.reshape(-1)], order=1,
                               mode="wrap").reshape(h, w).astype(np.float32)
        invalid = (a <= 0.05).reshape(h, w)
        depth = np.where(invalid, 0.0, depth)
        return gray, depth

    def sequence(self, poses=None, n_frames: int = 60, fps: float = 30.0):
        poses = poses if poses is not None else default_trajectory(n_frames)
        for i, (R, t) in enumerate(poses):
            gray, depth = self.render(R, t)
            yield i / fps, gray, depth, R, t
