"""Multi-device TSDF fusion: voxel-block-sharded integration.

The reference's dense backends integrate serially on one host thread
(reference: src/PointCloudMapping.cc UpdateMap -> backend integrators).
TPU-native scaling axis (SURVEY.md §5.8: voxel blocks partitioned across
devices): the block tables shard over the mesh; the depth/color frame is
replicated (it is small — one image vs thousands of blocks), so the
projective update runs with zero communication. Queries/meshing gather the
shards back (all_gather happens implicitly at host fetch).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..dense import tsdf as tsdf_mod
from ..geometry import cameras as cam_mod
from .sharded_ba import make_mesh  # noqa: F401


def integrate_blocks_sharded(
    mesh: Mesh,
    block_coords, tsdf, weight, color,
    depth_img, color_img, Rcw, tcw,
    cam: cam_mod.Camera,
    voxel_size: float,
    trunc: float,
    axis: str = "obs",
):
    """One frame's projective TSDF update with the block dimension sharded
    over the mesh. Block count must divide the axis size (pad with empty
    blocks). Returns (tsdf, weight, color) with the same shardings."""
    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put = jax.device_put
    args = (
        put(block_coords, sharded), put(tsdf, sharded), put(weight, sharded),
        put(color, sharded), put(depth_img, repl), put(color_img, repl),
        put(Rcw, repl), put(tcw, repl),
    )
    fn = jax.jit(
        lambda bc, ts, w, c, d, ci, R, t: tsdf_mod.integrate_blocks(
            bc, ts, w, c, d, ci, R, t, cam, voxel_size, trunc),
        out_shardings=(sharded, sharded, sharded),
    )
    return fn(*args)


class ShardedTSDFVolume(tsdf_mod.TSDFVolume):
    """TSDFVolume whose integration runs block-sharded over a device mesh.

    Host-side allocation bookkeeping is unchanged; only the batched device
    update is distributed. Block batches are padded to a multiple of the
    mesh size with empty blocks (weight 0, coords far away)."""

    def __init__(self, mesh: Mesh, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.mesh = mesh
        self.n_dev = int(np.prod([mesh.devices.size]))

    def integrate(self, depth: np.ndarray, color: np.ndarray,
                  Rcw: np.ndarray, tcw: np.ndarray):
        import jax.numpy as jnp

        self._allocate_for_frame(depth, Rcw, tcw)
        n = self.n_blocks
        if n == 0:
            return
        # pad the active slice to a multiple of the mesh size
        npad = -n % self.n_dev
        m = n + npad
        bc = np.full((m, 3), 1 << 20, np.int32)
        bc[:n] = self.block_coords[:n]
        ts = np.ones((m,) + self.tsdf.shape[1:], np.float32)
        ts[:n] = self.tsdf[:n]
        w = np.zeros((m,) + self.weight.shape[1:], np.float32)
        w[:n] = self.weight[:n]
        c = np.zeros((m,) + self.color.shape[1:], np.float32)
        c[:n] = self.color[:n]
        t_out, w_out, c_out = integrate_blocks_sharded(
            self.mesh, jnp.asarray(bc), jnp.asarray(ts), jnp.asarray(w),
            jnp.asarray(c), jnp.asarray(depth), jnp.asarray(color),
            jnp.asarray(Rcw), jnp.asarray(tcw),
            self.cam, self.voxel_size, self.trunc)
        d = self._dev
        d["tsdf"] = d["tsdf"].at[:n].set(t_out[:n])
        d["weight"] = d["weight"].at[:n].set(w_out[:n])
        d["color"] = d["color"].at[:n].set(c_out[:n])
        self._mirror = None
