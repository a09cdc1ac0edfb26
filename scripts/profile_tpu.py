"""Per-component device timing of the tracking hot path on the attached
chip. Each jitted program is timed with block_until_ready after a warm-up
call, isolating device compute + one round trip from the pipeline.

Usage: python scripts/profile_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _t(fn, reps=10):
    out = fn()
    import jax

    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    from plvs_tpu.geometry import cameras
    from plvs_tpu.slam import frame as frame_mod
    from plvs_tpu.slam import tracking as tr

    cam = cameras.pinhole(520.9, 521.0, 325.1, 249.7, width=640, height=480,
                          bf=40.0)
    rng = np.random.default_rng(0)
    gray = jnp.asarray(rng.uniform(0, 255, (480, 640)).astype(np.float32))
    depth = jnp.asarray(np.full((480, 640), 2.5, np.float32))

    ms = _t(lambda: frame_mod.build_frame_rgbd(gray, depth, cam, 1024, 8, 1.2))
    print(f"build_frame_rgbd(1024,8lvl): {ms:.1f} ms")
    fr = frame_mod.build_frame_rgbd(gray, depth, cam, 1024, 8, 1.2)

    ms = _t(lambda: frame_mod.build_frame_lines(gray, depth, cam, 128))
    print(f"build_frame_lines(128): {ms:.1f} ms")
    fl = frame_mod.build_frame_lines(gray, depth, cam, 128)

    # fused tracking program, representative shapes
    P, L, icap, lcap = 2048, 256, 1024, 128
    pt_tbl = (jnp.asarray(rng.normal(0, 1, (P, 3)).astype(np.float32)),
              jnp.asarray(rng.integers(0, 2**32, (P, 8), dtype=np.uint32)),
              jnp.zeros((P, 3), jnp.float32),
              jnp.zeros((P,), jnp.float32), jnp.zeros((P,), jnp.float32),
              jnp.zeros((P,), jnp.float32),
              jnp.ones((P,), bool))
    ln_tbl = (jnp.zeros((L, 3), jnp.float32), jnp.zeros((L, 3), jnp.float32),
              jnp.zeros((L, 8), jnp.uint32), jnp.zeros((L,), bool))
    # packed meta vector (mirrors Tracker._dispatch_fused): candidate id
    # sets + line ids + predicted-pose f32 bits in ONE int32 upload
    Rt_bits = np.concatenate([np.eye(3, dtype=np.float32).ravel(),
                              np.zeros(3, np.float32)]).view(np.int32)
    meta = np.full((2 * icap + lcap + 12,), -1, np.int32)
    meta[:icap] = rng.integers(0, P, icap)
    meta[icap: 2 * icap] = rng.integers(0, P, icap)
    meta[2 * icap + lcap:] = Rt_bits
    meta_d = jnp.asarray(meta)

    ms = _t(lambda: tr._track_frame_tables_pl(
        cam, meta_d, pt_tbl, ln_tbl,
        fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr,
        fr.inv_sigma2, fr.kp.angle,
        fl.kl.sp, fl.kl.ep, fl.kl.desc, fl.kl.mask,
        icap=icap, lcap=lcap, line_weight=2.0, check_rotation=True))
    print(f"fused track (pl, P={P}): {ms:.1f} ms")

    # pose_opt alone
    from plvs_tpu.solvers import pose_opt as po

    Xw = jnp.asarray(rng.normal(0, 1, (1024, 3)).astype(np.float32) +
                     np.array([0, 0, 3], np.float32))
    obs = po.make_pose_obs(Xw, fr.uvr, fr.inv_sigma2,
                           jnp.asarray(np.ones(1024, bool)))
    R0 = jnp.eye(3)
    t0v = jnp.zeros(3)
    ms = _t(lambda: po.pose_optimize(cam, R0, t0v, obs))
    print(f"pose_optimize(1024 obs): {ms:.1f} ms")

    # matcher alone
    from plvs_tpu.features import matching

    uv = jnp.asarray(rng.uniform(0, 640, (icap, 2)).astype(np.float32))
    ms = _t(lambda: matching.search_by_projection(
        uv, jnp.ones((icap,), bool), pt_tbl[1][:icap],
        jnp.zeros((icap,), jnp.int32),
        fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask,
        radius=jnp.full((icap,), 15.0)))
    print(f"search_by_projection({icap}x1024): {ms:.1f} ms")

    # local BA shapes
    from plvs_tpu.solvers import ba

    K, Pb, Mb = 16, 2048, 8192
    Rk = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (K, 1, 1)))
    tk = jnp.asarray(rng.normal(0, 0.1, (K, 3)).astype(np.float32))
    fixed = jnp.asarray(np.arange(K) == 0)
    pts = jnp.asarray((rng.normal(0, 1, (Pb, 3)) +
                       [0, 0, 3]).astype(np.float32))
    ocam = jnp.asarray(rng.integers(0, K, Mb).astype(np.int32))
    opt = jnp.asarray(rng.integers(0, Pb, Mb).astype(np.int32))
    ouvr = jnp.asarray(
        np.concatenate([rng.uniform(0, 640, (Mb, 2)),
                        np.full((Mb, 1), -1.0)], -1).astype(np.float32))
    ois2 = jnp.ones((Mb,), jnp.float32)
    omask = jnp.ones((Mb,), bool)
    prob = ba.make_problem(Rk, tk, fixed, pts, ocam, opt, ouvr, ois2, omask,
                           cam_mask=jnp.ones((K,), bool),
                           point_mask=jnp.ones((Pb,), bool))
    ms = _t(lambda: ba.bundle_adjust_jit(cam, prob, num_iters=6, cg_iters=30),
            reps=3)
    print(f"local BA (K={K}, P={Pb}, M={Mb}, 6 LM x 30 CG): {ms:.1f} ms")


if __name__ == "__main__":
    main()
