"""Multi-device bundle adjustment: observation-sharded SPMD over a mesh.

The reference has no distributed execution (SURVEY.md §1: single-process
threads + mutex queues). This module defines the TPU-native scaling axis:
the observation table (the dominant data volume in BA) is sharded across a
``jax.sharding.Mesh`` axis; cameras/landmarks stay replicated so the
per-observation Jacobian pass is embarrassingly parallel and XLA inserts the
``psum`` for the two segment-sum reductions (ICI all-reduce) automatically
under jit — the SPMD analogue of g2o's single-threaded Hessian assembly.

Landmark-sharded variants (reduce-scatter of point blocks) build on the same
problem layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import cameras as cam_mod
from ..solvers import ba


def make_mesh(n_devices: int | None = None, axis: str = "obs") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise RuntimeError(
            f"requested {n}-device mesh but only {len(devs)} devices visible "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
            "virtual CPU mesh)"
        )
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_problem(prob: ba.BAProblem, mesh: Mesh, axis: str = "obs") -> ba.BAProblem:
    """Place the observation table sharded over ``axis``; everything else
    replicated. Observation capacity must be divisible by the axis size."""
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(x, spec):
        return jax.device_put(x, spec)

    return prob._replace(
        R=put(prob.R, repl), t=put(prob.t, repl),
        fixed_cam=put(prob.fixed_cam, repl), cam_mask=put(prob.cam_mask, repl),
        points=put(prob.points, repl), point_mask=put(prob.point_mask, repl),
        obs_cam=put(prob.obs_cam, sharded), obs_pt=put(prob.obs_pt, sharded),
        obs_uvr=put(prob.obs_uvr, sharded),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, sharded),
        obs_mask=put(prob.obs_mask, sharded),
    )


def partition_by_point(prob: ba.BAProblem, n_shards: int) -> ba.BAProblem:
    """Reorder the observation table so each mesh shard's observations
    reference a contiguous range of landmark ids (host-side sort + pad).

    This is the layout that makes POINT sharding communication-efficient:
    with ``points`` sharded on dim 0 and the observations aligned to the
    owning shard, the gather ``points[obs_pt]`` and the point-side
    segment-sum are shard-local; only the (small, replicated) camera blocks
    need the all-reduce. Observation sharding alone replicates the whole
    landmark array on every device and caps the map size at one device's
    HBM — this layout scales map size with the mesh (VERDICT r1 item 7)."""
    M = int(prob.obs_cam.shape[0])
    P_ = int(prob.points.shape[0])
    if P_ % n_shards != 0:
        raise ValueError(f"point capacity {P_} not divisible by {n_shards}")
    per = P_ // n_shards
    obs_pt = np.asarray(prob.obs_pt)
    obs_mask = np.asarray(prob.obs_mask)
    owner = np.where(obs_mask, obs_pt // per, n_shards - 1)
    order = np.argsort(owner, kind="stable")
    counts = np.bincount(owner, minlength=n_shards)
    cap = int(counts.max())
    cap = ((cap + 7) // 8) * 8  # pad per-shard capacity
    new_M = cap * n_shards

    def take(a, fill=0):
        a = np.asarray(a)
        out = np.full((new_M,) + a.shape[1:], fill, a.dtype)
        off = 0
        pos = 0
        for s in range(n_shards):
            c = counts[s]
            out[s * cap: s * cap + c] = a[order[pos: pos + c]]
            pos += c
        return out

    return prob._replace(
        obs_cam=jnp.asarray(take(prob.obs_cam)),
        obs_pt=jnp.asarray(take(prob.obs_pt)),
        obs_uvr=jnp.asarray(take(prob.obs_uvr, fill=-1.0)),
        obs_inv_sigma2=jnp.asarray(take(prob.obs_inv_sigma2)),
        obs_mask=jnp.asarray(take(prob.obs_mask, fill=False)),
    )


def shard_problem_points(prob: ba.BAProblem, mesh: Mesh,
                         axis: str = "obs") -> ba.BAProblem:
    """Shard BOTH the observation table and the landmark array over the mesh
    axis (cameras replicated). Call :func:`partition_by_point` first so the
    observation shards align with their landmark shards."""
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    return prob._replace(
        R=put(prob.R, repl), t=put(prob.t, repl),
        fixed_cam=put(prob.fixed_cam, repl), cam_mask=put(prob.cam_mask, repl),
        points=put(prob.points, sharded),
        point_mask=put(prob.point_mask, sharded),
        obs_cam=put(prob.obs_cam, sharded), obs_pt=put(prob.obs_pt, sharded),
        obs_uvr=put(prob.obs_uvr, sharded),
        obs_inv_sigma2=put(prob.obs_inv_sigma2, sharded),
        obs_mask=put(prob.obs_mask, sharded),
    )


def bundle_adjust_sharded(
    cam: cam_mod.Camera,
    prob: ba.BAProblem,
    mesh: Mesh,
    num_iters: int = 5,
    cg_iters: int = 20,
    shard_points: bool = False,
):
    """Run the LM core over a sharded problem. The same `ba.bundle_adjust`
    program is used — GSPMD propagates the shardings through the Jacobian
    pass and turns the segment-sums into local partial reductions +
    all-reduce over the mesh axis. With ``shard_points`` the landmark array
    is partitioned too (map size scales with the mesh)."""
    if shard_points:
        prob = partition_by_point(prob, int(np.prod(mesh.devices.shape)))
        prob = shard_problem_points(prob, mesh)
        pt_sh = NamedSharding(mesh, P("obs"))
    else:
        prob = shard_problem(prob, mesh)
        pt_sh = NamedSharding(mesh, P())
    repl = NamedSharding(mesh, P())

    fn = _sharded_fn(cam, mesh, shard_points)
    return fn(prob, num_iters, cg_iters)


@functools.lru_cache(maxsize=32)
def _sharded_fn(cam, mesh, shard_points: bool):
    """One cached jit wrapper per (camera, mesh, sharding mode): a fresh
    ``jax.jit(lambda ...)`` per call would retrace — and recompile — the
    whole LM program on every backend dispatch. Iteration budgets are
    dynamic loop bounds (see ba.bundle_adjust_jit), so they don't key the
    cache."""
    pt_sh = NamedSharding(mesh, P("obs")) if shard_points \
        else NamedSharding(mesh, P())
    repl = NamedSharding(mesh, P())
    return jax.jit(
        lambda p, ni, ci: ba.bundle_adjust(
            cam, p, num_iters=ni, cg_iters=ci),
        out_shardings=(repl, repl, pt_sh, repl, repl, None),
    )
