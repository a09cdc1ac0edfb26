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
    """TSDFVolume pinned to a specific device.

    The base class is already device-resident and async-dispatching (JAX's
    dispatch IS the queue); this subclass only selects WHICH device the
    block table lives on, so integration runs concurrently with tracking
    on another chip. Queries pull the host mirror, which blocks on any
    outstanding integrations."""

    def __init__(self, device, *args, **kwargs):
        super().__init__(*args, device=device, **kwargs)

    def flush(self):
        """Block on outstanding integrations."""
        jax.block_until_ready(self._dev["tsdf"])


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
