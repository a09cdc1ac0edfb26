"""Synthetic RGB-D sequence generator for end-to-end SLAM tests/benchmarks.

The reference validates only on real datasets (TUM/KITTI/EuRoC, see
SURVEY.md §4); this module adds what it lacks: a deterministic, ground-truth
sequence so CI can gate ATE without dataset downloads. Scene = textured
fronto-parallel wall (plus optional second plane) rendered by ray-plane
intersection; depth is exact.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..geometry import cameras as cam_mod


@dataclasses.dataclass
class SensorModel:
    """RGB-D sensor-artifact model applied on top of the ideal renderers.

    The reference is validated on real Kinect/Asus captures (TUM RGB-D,
    SURVEY.md §6); the ideal ray-traced frames here have none of those
    sensors' defects, so ATE gates pass in conditions no real run would
    see. This model injects the dominant ones:

    - photometric: additive Gaussian read noise + per-frame exposure gain
      jitter (auto-exposure hunting),
    - motion blur: 1-D blur of the gray image along the apparent image
      motion between consecutive frames (length ~ pixel flow x shutter
      fraction, capped),
    - depth quantization: structured-light disparity is quantized in steps
      (Kinect ~1/8 px), so depth comes back staircased with error growing
      ~z^2 (d = bf/z rounding),
    - axial depth noise: sigma_z(z) = noise_at_1m * z^2 (the standard
      Khoshelham model shape, also the reference's SigmaZ weighting
      include/Utils.h sigma-depth model),
    - edge shadowing: depth invalidated in a band around strong depth
      discontinuities (the emitter/receiver parallax shadow) plus sparse
      random speckle dropout.
    """

    photometric_sigma: float = 2.5   # gray DN
    exposure_jitter: float = 0.03    # multiplicative gain sd per frame
    shutter_fraction: float = 0.5    # fraction of inter-frame motion blurred
    blur_max_px: float = 6.0
    disparity_step: float = 0.125    # px; 0 disables quantization
    stereo_bf: float = 40.0          # disparity bf fallback when cam.bf == 0
    depth_noise_at_1m: float = 0.0015  # m (sigma ~ this * z^2)
    edge_shadow_px: int = 2          # half-width of invalid discontinuity band
    edge_grad_m: float = 0.10        # depth-jump threshold (m / px)
    dropout_frac: float = 0.002      # random invalid-pixel speckle
    seed: int = 0

    def _rng(self, frame_idx: int) -> np.random.Generator:
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, frame_idx]))

    # ------------------------------------------------------------------
    def apply(self, gray: np.ndarray, depth: np.ndarray, frame_idx: int,
              bf: float = 0.0, flow_px: np.ndarray | None = None):
        """Return (gray', depth') with sensor artifacts. ``flow_px`` is the
        apparent image-motion vector (du, dv) since the previous frame for
        motion blur; None/zero skips the blur."""
        rng = self._rng(frame_idx)
        g = gray.astype(np.float32)

        if flow_px is not None and self.shutter_fraction > 0:
            L = float(np.hypot(*flow_px)) * self.shutter_fraction
            L = min(L, self.blur_max_px)
            if L >= 1.0:
                g = _directional_blur(g, np.asarray(flow_px, np.float64), L)

        gain = 1.0 + self.exposure_jitter * rng.standard_normal()
        g = g * gain + self.photometric_sigma * \
            rng.standard_normal(g.shape).astype(np.float32)
        g = np.clip(g, 0.0, 255.0)

        d = depth.astype(np.float32).copy()
        valid = d > 1e-6

        if self.edge_shadow_px > 0:
            from scipy.ndimage import binary_dilation

            gy, gx = np.gradient(np.where(valid, d, 0.0))
            edge = (np.abs(gy) > self.edge_grad_m) | \
                   (np.abs(gx) > self.edge_grad_m)
            edge &= valid
            if edge.any():
                band = binary_dilation(edge, iterations=self.edge_shadow_px)
                valid &= ~band

        if self.depth_noise_at_1m > 0:
            sig = self.depth_noise_at_1m * np.square(d)
            d = d + sig * rng.standard_normal(d.shape).astype(np.float32)

        if self.disparity_step > 0:
            bf_eff = bf if bf > 1e-6 else self.stereo_bf
            disp = bf_eff / np.where(valid, d, 1.0)
            disp = np.round(disp / self.disparity_step) * self.disparity_step
            d = np.where(disp > 1e-6, bf_eff / np.maximum(disp, 1e-6), d)

        if self.dropout_frac > 0:
            valid &= rng.random(d.shape) >= self.dropout_frac

        return g, np.where(valid, d, 0.0).astype(np.float32)


def _directional_blur(img: np.ndarray, direction: np.ndarray,
                      length_px: float) -> np.ndarray:
    """Box blur along ``direction`` with total extent ``length_px`` (line
    kernel rasterized into a small 2-D stencil; linear motion blur)."""
    from scipy.ndimage import convolve

    n = max(int(np.ceil(length_px)), 1)
    dnorm = np.linalg.norm(direction)
    u = direction / dnorm if dnorm > 1e-9 else np.array([1.0, 0.0])
    half = (n - 1) / 2.0
    r = int(np.ceil(half)) + 1
    k = np.zeros((2 * r + 1, 2 * r + 1), np.float32)
    taps = max(2 * n, 2)
    for s in np.linspace(-half, half, taps):
        x, y = r + s * u[0], r + s * u[1]
        x0, y0 = int(np.floor(x)), int(np.floor(y))
        fx, fy = x - x0, y - y0
        for dy_, wy in ((0, 1 - fy), (1, fy)):
            for dx_, wx in ((0, 1 - fx), (1, fx)):
                k[y0 + dy_, x0 + dx_] += wx * wy
    k /= k.sum()
    return convolve(img, k, mode="nearest")


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


def _center_flow(cam: cam_mod.Camera, prev_R, prev_t, prev_depth,
                 R, t) -> np.ndarray | None:
    """Apparent image-plane motion (du, dv) of the scene point seen at the
    image center of the previous frame — drives the motion-blur length.
    Host-side pinhole approximation (adequate for blur even on fisheye)."""
    d0 = float(prev_depth) if prev_depth > 1e-3 else 3.0
    X_w = prev_R.T @ (np.array([0.0, 0.0, d0], np.float64) - prev_t)
    X_c = R @ X_w + t
    if X_c[2] <= 1e-6:
        return None
    fx, fy, cx, cy = (float(p) for p in cam.params[:4])
    u = fx * X_c[0] / X_c[2] + cx
    v = fy * X_c[1] / X_c[2] + cy
    return np.array([u - cx, v - cy], np.float64)


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

    def sequence(self, poses, fps: float = 30.0,
                 sensor: "SensorModel | None" = None):
        prev = None
        for i, (R, t) in enumerate(poses):
            gray, depth = self.render(R, t)
            if sensor is not None:
                flow = None if prev is None else _center_flow(
                    self.cam, prev[0], prev[1], prev[2], R, t)
                h, w = depth.shape
                prev = (R, t, float(depth[h // 2, w // 2]))
                gray, depth = sensor.apply(gray, depth, i, bf=self.cam.bf,
                                           flow_px=flow)
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

    def sequence(self, poses=None, n_frames: int = 60, fps: float = 30.0,
                 sensor: "SensorModel | None" = None):
        poses = poses if poses is not None else default_trajectory(n_frames)
        prev = None
        for i, (R, t) in enumerate(poses):
            gray, depth = self.render(R, t)
            if sensor is not None:
                flow = None if prev is None else _center_flow(
                    self.cam, prev[0], prev[1], prev[2], R, t)
                h, w = depth.shape
                prev = (R, t, float(depth[h // 2, w // 2]))
                gray, depth = sensor.apply(gray, depth, i, bf=self.cam.bf,
                                           flow_px=flow)
            yield i / fps, gray, depth, R, t
