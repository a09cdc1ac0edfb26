"""Benchmark: RGB-D tracking throughput of the jitted hot path.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline semantics: the reference (CPU PLVS) tracks at dataset rate, ~30 fps
(SURVEY.md §6: camera-rate realtime budget, Settings Camera.fps=30). The
north-star target is >=2x that per chip, so vs_baseline = fps / 30.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plvs_tpu.geometry import cameras
    from plvs_tpu.io import synthetic
    from plvs_tpu.slam import frame as frame_mod
    from plvs_tpu.slam import tracking as tracking_mod

    cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240, bf=24.0)
    NUM_FEATS = 512
    N_PTS = 1024

    def track_step(gray, depth, R_pred, t_pred, pts_xyz, pts_desc, pts_octave, pts_valid):
        fr = frame_mod.build_frame_rgbd(gray, depth, cam, NUM_FEATS, 4, 1.2)
        return tracking_mod._match_and_optimize(
            cam, R_pred, t_pred, pts_xyz, pts_desc, pts_octave, pts_valid,
            fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr, fr.inv_sigma2,
            10.0,
        )[:2]

    step = jax.jit(track_step)

    # pre-render a short synthetic sequence on the host
    scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=0)
    frames = []
    for ts, gray, depth, R, t in scene.sequence(n_frames=12):
        frames.append((jnp.asarray(gray), jnp.asarray(depth)))

    rng = np.random.default_rng(0)
    pts_xyz = jnp.asarray(
        np.stack([rng.uniform(-2, 2, N_PTS), rng.uniform(-1.5, 1.5, N_PTS),
                  rng.uniform(2, 5, N_PTS)], -1), jnp.float32)
    pts_desc = jnp.asarray(rng.integers(0, 2 ** 32, (N_PTS, 8), dtype=np.uint32))
    pts_octave = jnp.zeros((N_PTS,), jnp.int32)
    pts_valid = jnp.ones((N_PTS,), bool)
    R0 = jnp.eye(3, dtype=jnp.float32)
    t0 = jnp.zeros(3, jnp.float32)

    # warmup / compile
    out = step(frames[0][0], frames[0][1], R0, t0, pts_xyz, pts_desc, pts_octave, pts_valid)
    jax.block_until_ready(out)

    n_timed = 30
    t_start = time.perf_counter()
    for i in range(n_timed):
        g, d = frames[i % len(frames)]
        out = step(g, d, R0, t0, pts_xyz, pts_desc, pts_octave, pts_valid)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t_start
    fps = n_timed / dt

    print(json.dumps({
        "metric": "rgbd_track_fps",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
