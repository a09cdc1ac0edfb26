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


def bundle_adjust_sharded(
    cam: cam_mod.Camera,
    prob: ba.BAProblem,
    mesh: Mesh,
    num_iters: int = 5,
    cg_iters: int = 20,
):
    """Run the LM core over a sharded problem. The same `ba.bundle_adjust`
    program is used — GSPMD propagates the observation sharding through the
    Jacobian pass and turns the segment-sums into local partial reductions +
    all-reduce over the mesh axis."""
    prob = shard_problem(prob, mesh)
    repl = NamedSharding(mesh, P())

    fn = jax.jit(
        lambda p: ba.bundle_adjust(cam, p, num_iters=num_iters, cg_iters=cg_iters),
        out_shardings=(repl, repl, repl, repl, repl, None),
    )
    return fn(prob)
