"""Measure sharded-BA scaling across a device mesh.

Runs the point+observation-sharded LM bundle adjustment at a fixed problem
size over meshes of 1/2/4/8 devices and reports BA iterations/s + scaling
efficiency (BASELINE.md: >=70% at >=2 hosts). On this CI box the devices
are virtual CPU shards — the numbers exercise the collective layout, not
real ICI bandwidth; on a TPU pod slice the same script runs unmodified.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python scripts/measure_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np


def build_problem(cam, K=256, P=49152, M=524288, seed=0):
    import jax.numpy as jnp

    from plvs_tpu.geometry import cameras as cam_mod
    from plvs_tpu.geometry import lie
    from plvs_tpu.solvers import ba

    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-4, 4, P), rng.uniform(-2.5, 2.5, P),
                    rng.uniform(3, 12, P)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.zeros((K, 3), np.float32)
    t[:, 0] = np.linspace(0, -2.0, K)
    obs_cam = rng.integers(0, K, M).astype(np.int32)
    obs_pt = rng.integers(0, P, M).astype(np.int32)
    Xc = lie.se3_apply(jnp.asarray(R)[obs_cam], jnp.asarray(t)[obs_cam],
                       jnp.asarray(pts)[obs_pt])
    uv = cam_mod.project(cam, Xc)
    uv = uv + jnp.asarray(rng.normal(0, 0.5, (M, 2)), jnp.float32)
    uvr = jnp.concatenate([uv, -jnp.ones((M, 1))], axis=-1)
    fixed = np.zeros((K,), bool)
    fixed[0] = True
    return ba.make_problem(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(fixed),
        jnp.asarray(pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)),
        jnp.asarray(obs_cam), jnp.asarray(obs_pt), uvr,
        jnp.ones((M,)), jnp.ones((M,), bool))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from plvs_tpu.geometry import cameras
    from plvs_tpu.parallel import sharded_ba

    cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                          bf=24.0)
    prob = build_problem(cam)
    n_avail = len(jax.devices())
    iters = 4
    results = {}
    for n in [1, 2, 4, 8]:
        if n > n_avail:
            break
        mesh = sharded_ba.make_mesh(n)
        # warmup/compile
        out = sharded_ba.bundle_adjust_sharded(
            cam, prob, mesh, num_iters=1, cg_iters=10, shard_points=True)
        jax.block_until_ready(out[0])
        t0 = time.perf_counter()
        out = sharded_ba.bundle_adjust_sharded(
            cam, prob, mesh, num_iters=iters, cg_iters=10, shard_points=True)
        jax.block_until_ready(out[0])
        dt = time.perf_counter() - t0
        results[n] = iters / dt
        print(f"{n} devices: {iters / dt:.3f} LM iters/s "
              f"({dt:.2f}s for {iters})", flush=True)
    base = results.get(1)
    if base:
        for n, r in results.items():
            eff = r / (base * n)
            print(f"scaling efficiency @ {n} devices: {100 * eff:.0f}%")
    out_path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
    base = results.get(1)
    payload = {
        "metric": "sharded BA LM iterations/s (K=256, P=49k, M=524k, cg=10)",
        "lm_iters_per_s": {str(k): v for k, v in results.items()},
        "efficiency_vs_1dev": {
            str(k): round(v / (base * k), 3)
            for k, v in results.items() if base and k > 1},
        "platform": jax.default_backend(),
        "physical_cores": os.cpu_count(),
        "note": ("virtual host-platform mesh when physical_cores < devices: "
                 "validates the collective layout, not ICI bandwidth — the "
                 "1-device baseline already uses every core via intra-op "
                 "threading, so wall-clock efficiency is structurally capped "
                 "below 1/n there. Run on a pod slice for the >=70% target."),
        "script": "scripts/measure_scaling.py",
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
