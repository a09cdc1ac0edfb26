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


def make_structured_texture(size: int = 2048,
                            rng: np.random.Generator | None = None,
                            n_panels: int = 48,
                            n_blobs: int = 600) -> np.ndarray:
    """Man-made indoor look: rectangular panels (doors/windows/shelves)
    whose long straight borders feed the LINE pipeline, plus dense corner
    blobs so the point pipeline runs at full strength. This is the flagship
    bench scene — the reference's line claims target exactly this scene
    class (structured low/mid-texture interiors, README.md:14 and the TUM
    fr3 structure-vs-texture sequences)."""
    rng = rng or np.random.default_rng(7)
    tex = np.full((size, size), 70.0, np.float32)
    # axis-aligned panels with contrasting 4-px borders
    for _ in range(n_panels):
        w = int(rng.integers(size // 16, size // 4))
        h = int(rng.integers(size // 16, size // 4))
        x = int(rng.integers(0, size - w))
        y = int(rng.integers(0, size - h))
        fill = float(rng.uniform(60, 200))
        border = 250.0 if fill < 130 else 30.0
        tex[y:y + h, x:x + w] = fill
        b = 4
        tex[y:y + b, x:x + w] = border
        tex[y + h - b:y + h, x:x + w] = border
        tex[y:y + h, x:x + b] = border
        tex[y:y + h, x + w - b:x + w] = border
    # corner blobs on top (keep clear of panel borders is unnecessary —
    # extra corners only help)
    xs = rng.integers(8, size - 24, n_blobs)
    ys = rng.integers(8, size - 24, n_blobs)
    for x, y in zip(xs, ys):
        w = int(rng.integers(6, 16))
        h = int(rng.integers(6, 16))
        tex[y:y + h, x:x + w] = rng.uniform(90, 250)
    tex += rng.normal(size=tex.shape).astype(np.float32) * 2.0
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


class SyntheticRoom:
    """Four textured vertical walls forming a square room (infinite in y):
    the scene class a GENUINE loop-closure scenario needs — a trajectory
    that turns away from its start region loses covisibility with it and
    must re-recognize it on return (a single wall keeps every keyframe
    covisible with every other, so place recognition correctly never fires
    there). Each wall gets its own texture so BoW similarity discriminates.

    Walls: z=+half, z=-half, x=+half, x=-half around the world origin.
    """

    def __init__(self, cam: cam_mod.Camera, half: float = 3.0,
                 tex_size: int = 1024, tex_scale: float | None = None,
                 seed: int = 0, structured: bool = True):
        self.cam = cam
        self.half = half
        # default: one texture period spans the wall EXACTLY — a repeating
        # (wrapped) texture makes place recognition alias between wall
        # positions one period apart, which manifests as catastrophic
        # false loop closures (observed: a 5.12 m period on a 6 m wall)
        self.tex_scale = (tex_size / (2.0 * half)
                          if tex_scale is None else tex_scale)
        make = make_structured_texture if structured else make_texture
        self.texs = [make(tex_size, np.random.default_rng(seed + i))
                     for i in range(4)]
        h, w = cam.height, cam.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        import jax
        import jax.numpy as jnp

        uv = np.stack([xs, ys], -1).reshape(-1, 2)
        rays = np.asarray(jax.jit(
            lambda u: cam_mod.unproject(cam, u))(jnp.asarray(uv)))
        rays = rays / rays[:, 2:3]
        self._rays_c = rays.T  # [3, H*W], z = 1

    # wall table: (axis, sign, u_axis, u_sign) — u = horizontal tex coord
    _WALLS = (
        (2, +1.0, 0, +1.0),   # z = +half, u = +x
        (2, -1.0, 0, -1.0),   # z = -half, u = -x
        (0, +1.0, 2, -1.0),   # x = +half, u = -z
        (0, -1.0, 2, +1.0),   # x = -half, u = +z
    )

    def render(self, R: np.ndarray, t: np.ndarray):
        """(gray [H,W] f32, depth [H,W] f32 camera-z meters)."""
        from scipy.ndimage import map_coordinates

        h, w = self.cam.height, self.cam.width
        Rwc = R.T
        C = -Rwc @ t
        rays_w = Rwc @ self._rays_c              # [3, HW]
        n = rays_w.shape[1]
        best_a = np.full((n,), np.inf, np.float32)
        gray = np.zeros((n,), np.float32)
        for wi, (ax, sign, uax, usign) in enumerate(self._WALLS):
            denom = rays_w[ax]
            denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
            a = (sign * self.half - C[ax]) / denom
            hit = (a > 0.05) & (a < best_a)
            if not hit.any():
                continue
            X = C[:, None] + a * rays_w
            tex = self.texs[wi]
            ts_ = self.tex_scale
            u = (usign * X[uax, hit] * ts_) % tex.shape[1]
            v = (X[1, hit] * ts_) % tex.shape[0]
            vals = map_coordinates(tex, [v, u], order=1, mode="wrap")
            gray[hit] = vals
            best_a[hit] = a[hit]
        depth = best_a.copy()
        depth[~np.isfinite(depth)] = 0.0
        return gray.reshape(h, w), depth.reshape(h, w)

    def sequence(self, poses, fps: float = 30.0):
        for i, (R, t) in enumerate(poses):
            gray, depth = self.render(R, t)
            yield i / fps, gray, depth, R, t


def orbit_loop_trajectory(n_frames: int = 96, radius: float = 1.0,
                          wobble: float = 0.05, laps: float = 1.0):
    """Camera orbits the room center looking outward: mid-orbit frames
    share NO walls with the start, so returning past 360 degrees is a true
    place-recognition loop. ``laps`` > 1 keeps revisiting (the classic
    loop-closure evaluation — sustained overlap lets the consecutive-
    coincidence gate engage, like a corridor walked twice)."""
    poses = []
    for i in range(n_frames):
        s = i / (n_frames / laps)
        ang = 2.0 * np.pi * s
        # camera center on a circle, looking radially outward (+z toward
        # the wall it faces)
        C = np.array([radius * np.sin(ang),
                      wobble * np.sin(4 * np.pi * s),
                      radius * np.cos(ang)], np.float32)
        R = _so3_exp_np(np.array([0.0, -ang, 0.0]))
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
