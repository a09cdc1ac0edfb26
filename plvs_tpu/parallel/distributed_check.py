"""Multi-process (multi-host analogue) sharded-BA check.

The reference is single-process (SURVEY.md §1); the TPU framework scales
across hosts with ``jax.distributed``: each process owns its local devices,
the mesh spans all of them, and the same ``bundle_adjust_sharded`` program
runs SPMD with cross-host collectives on the ICI/DCN path.

Run as a worker (one per "host"):
    XLA_FLAGS=--xla_force_host_platform_device_count=4 JAX_PLATFORMS=cpu \
    python -m plvs_tpu.parallel.distributed_check <coordinator> <nprocs> <pid>

Each worker prints ``DIST_OK cost=<float>`` on success; the launcher (see
tests/test_distributed.py) asserts both workers agree.
"""

from __future__ import annotations

import sys

import numpy as np


def run_worker(coordinator: str, num_processes: int, process_id: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from plvs_tpu.geometry import cameras, lie
    from plvs_tpu.parallel import sharded_ba
    from plvs_tpu.solvers import ba

    devs = jax.devices()  # global devices across processes
    mesh = Mesh(np.asarray(devs), ("obs",))

    cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                          bf=24.0)
    rng = np.random.default_rng(0)  # identical problem on every process
    K, Pn, M = 16, 1024, 8192
    pts = np.stack([rng.uniform(-2, 2, Pn), rng.uniform(-1.5, 1.5, Pn),
                    rng.uniform(3, 8, Pn)], -1).astype(np.float32)
    R = np.tile(np.eye(3, dtype=np.float32), (K, 1, 1))
    t = np.zeros((K, 3), np.float32)
    t[:, 0] = np.linspace(0, -0.5, K)
    obs_cam = rng.integers(0, K, M).astype(np.int32)
    obs_pt = rng.integers(0, Pn, M).astype(np.int32)
    Xc = lie.se3_apply(jnp.asarray(R)[obs_cam], jnp.asarray(t)[obs_cam],
                       jnp.asarray(pts)[obs_pt])
    uv = cameras.project(cam, Xc)
    # noise so the solve does real work
    uv = uv + jnp.asarray(rng.normal(0, 0.5, (M, 2)), jnp.float32)
    uvr = jnp.concatenate([uv, -jnp.ones((M, 1))], axis=-1)
    fixed = np.zeros((K,), bool)
    fixed[0] = True
    prob = ba.make_problem(
        jnp.asarray(R), jnp.asarray(t), jnp.asarray(fixed), jnp.asarray(pts),
        jnp.asarray(obs_cam), jnp.asarray(obs_pt), uvr,
        jnp.ones((M,)), jnp.ones((M,), bool),
    )
    # multi-process arrays: each process supplies its local block
    sharded = NamedSharding(mesh, P("obs"))
    repl = NamedSharding(mesh, P())
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    def as_repl(x):
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    def as_sharded(x):
        x = np.asarray(x)
        per = x.shape[0] // n_global
        lo = jax.process_index() * n_local * per
        return jax.make_array_from_process_local_data(
            sharded, x[lo: lo + n_local * per])

    prob = prob._replace(
        R=as_repl(prob.R), t=as_repl(prob.t),
        fixed_cam=as_repl(prob.fixed_cam),
        cam_mask=as_repl(prob.cam_mask),
        points=as_repl(prob.points),
        point_mask=as_repl(prob.point_mask),
        obs_cam=as_sharded(prob.obs_cam),
        obs_pt=as_sharded(prob.obs_pt),
        obs_uvr=as_sharded(prob.obs_uvr),
        obs_inv_sigma2=as_sharded(prob.obs_inv_sigma2),
        obs_mask=as_sharded(prob.obs_mask),
    )
    fn = jax.jit(
        lambda p: ba.bundle_adjust(cam, p, num_iters=2, cg_iters=8),
        out_shardings=(repl, repl, repl, repl, repl, None),
    )
    out = fn(prob)
    jax.block_until_ready(out[0])
    cost = float(out[-1]["cost"])
    assert np.isfinite(cost)
    print(f"DIST_OK cost={cost:.6f}", flush=True)


if __name__ == "__main__":
    run_worker(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
