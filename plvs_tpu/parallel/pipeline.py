"""Device pipelining: tracking and dense mapping on separate devices.

The reference overlaps tracking and dense mapping with host threads + a
condition-variable queue (reference: PointCloudMapping's own thread,
src/PointCloudMapping.cc:466-495; tracking pushes KF images at
src/Tracking.cc:4401-4423). The TPU-native analogue: the tracking hot path
owns device 0 while TSDF integration dispatches asynchronously onto device
1 — JAX's async dispatch IS the queue (results are futures; the host never
blocks on mapping), so the 30 Hz track loop never waits for integration.
"""

from __future__ import annotations

import jax
import numpy as np

from ..dense import tsdf as tsdf_mod
from ..geometry import cameras as cam_mod


class DevicePlacedTSDF(tsdf_mod.TSDFVolume):
    """TSDFVolume pinned to a specific device; integrations dispatch async
    and results are fetched lazily (``flush()`` or any query blocks)."""

    def __init__(self, device, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.device = device
        # device-resident state (kept as jax arrays to avoid per-frame
        # host->device reuploads of the whole volume)
        self._dev_tsdf = None
        self._dev_weight = None
        self._dev_color = None
        self._dev_n = 0
        self._dirty = False

    def _sync_device_state(self):
        import jax.numpy as jnp

        n = self.n_blocks
        if n != self._dev_n:
            # block table grew: upload the active slice once
            self._dev_tsdf = jax.device_put(self.tsdf[:n], self.device)
            self._dev_weight = jax.device_put(self.weight[:n], self.device)
            self._dev_color = jax.device_put(self.color[:n], self.device)
            self._dev_n = n

    def integrate(self, depth: np.ndarray, color: np.ndarray,
                  Rcw: np.ndarray, tcw: np.ndarray):
        import jax.numpy as jnp

        self._allocate_for_frame(depth, Rcw, tcw)
        if self.n_blocks == 0:
            return
        self._sync_device_state()
        n = self._dev_n
        bc = jax.device_put(self.block_coords[:n], self.device)
        d = jax.device_put(np.asarray(depth, np.float32), self.device)
        ci = jax.device_put(np.asarray(color, np.float32), self.device)
        R = jax.device_put(np.asarray(Rcw, np.float32), self.device)
        t = jax.device_put(np.asarray(tcw, np.float32), self.device)
        # async dispatch on the mapping device — does not block tracking
        self._dev_tsdf, self._dev_weight, self._dev_color = (
            tsdf_mod.integrate_blocks(
                bc, self._dev_tsdf, self._dev_weight, self._dev_color,
                d, ci, R, t, self.cam, self.voxel_size, self.trunc))
        self._dirty = True

    def flush(self):
        """Block on outstanding integrations and mirror state to the host."""
        if self._dirty and self._dev_tsdf is not None:
            jax.block_until_ready(self._dev_tsdf)
            n = self._dev_n
            self.tsdf[:n] = np.asarray(self._dev_tsdf)
            self.weight[:n] = np.asarray(self._dev_weight)
            self.color[:n] = np.asarray(self._dev_color)
            self._dirty = False

    # queries go through the host mirror
    def occupied_cloud(self, *a, **kw):
        self.flush()
        return super().occupied_cloud(*a, **kw)

    def save_ply(self, *a, **kw):
        self.flush()
        return super().save_ply(*a, **kw)


def make_pipelined_dense_mapper(cam: cam_mod.Camera, voxel_size: float = 0.02,
                                device=None, **kwargs):
    """A DenseMapper whose TSDF volume lives on ``device`` (default: the
    second visible device, falling back to the first)."""
    from ..dense.mapping import DenseMapper

    devs = jax.devices()
    device = device or (devs[1] if len(devs) > 1 else devs[0])
    mapper = DenseMapper(cam, voxel_size=voxel_size, **kwargs)
    vol = DevicePlacedTSDF(
        device, cam, voxel_size=voxel_size,
        with_labels=mapper.volume.with_labels,
        max_blocks=mapper.volume.max_blocks)
    mapper.volume = vol
    return mapper
