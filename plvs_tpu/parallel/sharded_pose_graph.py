"""Multi-device pose-graph optimization: edge-sharded SPMD.

The reference's essential-graph solve is a single-threaded g2o run
(reference: src/Optimizer.cc:4487 OptimizeEssentialGraph). Here the edge
table — the dominant volume in a long-trajectory pose graph — shards over a
mesh axis; vertices stay replicated. The vmapped edge linearization is
embarrassingly parallel and GSPMD turns the vertex segment-sums inside
``solvers.pose_graph.optimize`` into local partial sums + ``psum`` over ICI
(SURVEY.md §5.8: submap/edge-sharded pose graph).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import pose_graph
from .sharded_ba import make_mesh  # noqa: F401  (re-exported convenience)


def shard_problem(prob: pose_graph.PoseGraphProblem, mesh: Mesh,
                  axis: str = "obs") -> pose_graph.PoseGraphProblem:
    """Edge arrays sharded over ``axis``; vertex state replicated. Edge
    capacity must divide the axis size."""
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    return prob._replace(
        R=put(prob.R, repl), t=put(prob.t, repl), s=put(prob.s, repl),
        fixed=put(prob.fixed, repl),
        edge_i=put(prob.edge_i, sharded), edge_j=put(prob.edge_j, sharded),
        edge_R=put(prob.edge_R, sharded), edge_t=put(prob.edge_t, sharded),
        edge_s=put(prob.edge_s, sharded),
        edge_weight=put(prob.edge_weight, sharded),
        edge_mask=put(prob.edge_mask, sharded),
    )


def optimize_sharded(prob: pose_graph.PoseGraphProblem, mesh: Mesh,
                     num_iters: int = 15, cg_iters: int = 50,
                     fix_scale: bool = False):
    """Run the LM pose-graph core over an edge-sharded problem."""
    prob = shard_problem(prob, mesh)
    repl = NamedSharding(mesh, P())
    fn = jax.jit(
        lambda p: pose_graph.optimize(
            p, num_iters=num_iters, cg_iters=cg_iters, fix_scale=fix_scale),
        out_shardings=(repl, repl, repl, None),
    )
    return fn(prob)
