"""Diagnose the bench loop scenario: run the room orbit under the EXACT
bench configuration (pipelined + interleaved backend + lines + dense +
fixed shapes) and print per-KF loop-closer trace, tracking states, and KF
cadence — the instrumentation VERDICT r4 asked for (why does the product
configuration close zero loops while the sync flagship test closes them?).

Usage: python scripts/diag_loop_scenario.py [--cpu] [--frames N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames", type=int, default=132)
    ap.add_argument("--features", type=int, default=None)
    ap.add_argument("--sync", action="store_true",
                    help="disable pipeline/interleave (flagship-like)")
    ap.add_argument("--no-dense", action="store_true")
    ap.add_argument("--no-lines", action="store_true")
    ap.add_argument("--no-fixed", action="store_true",
                    help="disable backend_fixed_shapes bucket pinning")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if jax.default_backend() != "cpu":
        cache = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache_tpu")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    if args.no_fixed:
        os.environ["PLVS_BENCH_FIXED"] = "0"
    if args.sync:
        os.environ["PLVS_BENCH_PIPELINED"] = "0"
    import bench
    from plvs_tpu.io import synthetic

    if args.features:
        bench.NUM_FEATURES = args.features
    cam, system = bench.build_system()
    if args.no_dense:
        system.dense_mapper = None
    if args.no_lines:
        system.config.use_lines = False
        system.tracker.use_lines = False
        system.local_mapper.use_lines = False
    if system.loop_closer is not None:
        system.loop_closer.trace = []

    room = synthetic.SyntheticRoom(cam, half=3.0, tex_size=2048, seed=3)
    poses = synthetic.orbit_loop_trajectory(n_frames=args.frames, radius=1.0,
                                            laps=1.375)
    rng = np.random.default_rng(1)
    # record per-frame inlier counts as results resolve (pipelined results
    # land late; the wrap sees every final TrackResult)
    inliers = []
    orig_post = system._post_track

    def post(res, ts, payload=None):
        inliers.append(int(res.n_inliers))
        return orig_post(res, ts, payload)

    system._post_track = post
    states = []
    t0 = time.perf_counter()
    for i, (ts, gray, depth, R, t) in enumerate(room.sequence(poses)):
        depth = depth + rng.normal(0, 0.01, depth.shape).astype(
            np.float32) * depth ** 2
        st, _, _ = system.track_rgbd(gray, depth, ts)
        states.append(int(st))
    system.flush()
    el = time.perf_counter() - t0
    print(f"ran {len(states)} frames in {el:.1f}s "
          f"({1e3 * el / len(states):.0f} ms/frame)")
    print("tracking states:", "".join(str(s) for s in states))
    print("inliers/frame:", " ".join(str(n) for n in inliers))
    print("map:", system.map_statistics())
    print("loops_closed:", len(system.loops_closed))
    for kf, info in system.loops_closed:
        print("  loop @kf", kf, {k: v for k, v in info.items()
                                 if k != "pairs"})
    lc = system.loop_closer
    if lc is not None and lc.trace is not None:
        print(f"loop-closer trace ({len(lc.trace)} KFs processed):")
        for rec in lc.trace:
            print("  ", rec)
    st = system.store
    live = np.nonzero(st.kf_mask)[0]
    print("KF frame ids:", st.kf_frame_id[live].tolist())


if __name__ == "__main__":
    main()
