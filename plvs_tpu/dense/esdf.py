"""Euclidean signed distance field (ESDF) from the fused TSDF map.

TPU-native replacement for voxblox's ESDF integrator (reference:
Thirdparty/voxblox — esdf_integrator, consumed through
Thirdparty/voxblox_server/include/voxblox_ros/esdf_server.h; PLVS links the
TSDF server which voxblox extends to ESDF). Design shift: instead of the
incremental open-list wavefront propagation voxblox runs per updated voxel,
the field is computed over the active map bounding box with the
jump-flooding algorithm (JFA) — O(log n) dense passes, each a pure gather +
elementwise min, which is exactly the regime XLA tiles well on TPU. SLAM
maps are bounded (voxel blocks are capacity-limited), so the dense sweep of
the occupied bbox is cheap relative to per-voxel queue churn.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import tsdf as tsdf_mod


@functools.partial(jax.jit, static_argnames=("max_steps",))
def esdf_jfa(occupied: jnp.ndarray, voxel_size: float, max_steps: int = 0):
    """Unsigned Euclidean distance-to-surface on a dense [X, Y, Z] bool grid.

    Jump flooding: every voxel tracks the coordinates of its current nearest
    seed; passes with strides n/2, n/4, ..., 1 propagate seeds through 27
    offsets per pass. Exact for all but adversarial layouts (standard JFA
    error is rare and sub-voxel at SLAM resolutions).

    Returns distances in metres (float32, same shape).
    """
    shape = occupied.shape
    n = max(shape)
    steps = max_steps or max(1, int(np.ceil(np.log2(max(n, 2)))))

    big = jnp.asarray(1e9, jnp.float32)
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(shape[0]), jnp.arange(shape[1]), jnp.arange(shape[2]),
        indexing="ij",
    )
    coords = jnp.stack([ii, jj, kk], -1).astype(jnp.float32)
    # seed: occupied voxels point at themselves, others at "nowhere"
    seed = jnp.where(occupied[..., None], coords, big)

    offsets = [
        (dx, dy, dz)
        for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ]

    def dist2(s):
        d = s - coords
        return jnp.where(s[..., 0] > big / 2, big, jnp.sum(d * d, -1))

    def one_pass(seed, stride):
        best = seed
        best_d = dist2(seed)
        for dx, dy, dz in offsets:
            cand = jnp.roll(seed, (dx * stride, dy * stride, dz * stride),
                            axis=(0, 1, 2))
            # rolled-in wraparound keeps its (now wrong) seed coords; the
            # distance test rejects it unless it is genuinely closer
            d = dist2(cand)
            take = d < best_d
            best = jnp.where(take[..., None], cand, best)
            best_d = jnp.where(take, d, best_d)
        return best

    stride = 1 << (steps - 1)
    for _ in range(steps):
        seed = one_pass(seed, max(stride, 1))
        stride //= 2
    seed = one_pass(seed, 1)  # cleanup pass (JFA+1)

    d2 = dist2(seed)
    return jnp.where(d2 > big / 2, jnp.asarray(np.inf, jnp.float32),
                     jnp.sqrt(d2) * voxel_size)


def esdf_from_tsdf(vol: "tsdf_mod.TSDFVolume", tsdf_eps: float = 0.25,
                   min_weight: float = 1.0, margin: int = 8):
    """Dense ESDF grid over the TSDF volume's occupied bounding box.

    Returns (origin_xyz [3] world coords of grid corner, grid [X, Y, Z]
    float32 metres, sign [X, Y, Z] int8: -1 observed-inside, +1 otherwise).
    The sign channel comes from the fused TSDF (negative = behind surface),
    matching voxblox's signed field semantics.
    """
    pts, _ = vol.occupied_cloud(tsdf_eps=tsdf_eps, min_weight=min_weight)
    if len(pts) == 0:
        return np.zeros(3, np.float32), np.zeros((0, 0, 0), np.float32), \
            np.zeros((0, 0, 0), np.int8)
    vs = vol.voxel_size
    idx = np.floor(pts / vs).astype(np.int64)
    lo = idx.min(0) - margin
    hi = idx.max(0) + margin + 1
    shape = tuple((hi - lo).tolist())
    occ = np.zeros(shape, bool)
    occ[tuple((idx - lo).T)] = True

    grid = np.asarray(esdf_jfa(jnp.asarray(occ), vs))

    # sign: mark voxels the TSDF observed as interior (tsdf < 0, weighted)
    sign = np.ones(shape, np.int8)
    n = vol.n_blocks
    S = tsdf_mod.BLOCK
    inside = (vol.tsdf[:n] < 0) & (vol.weight[:n] > 0)
    b, zi, yi, xi = np.nonzero(inside)
    if len(b):
        vidx = vol.block_coords[:n][b] * S + np.stack([xi, yi, zi], -1)
        keep = np.all((vidx >= lo) & (vidx < hi), axis=1)
        v = vidx[keep] - lo
        sign[v[:, 0], v[:, 1], v[:, 2]] = -1

    origin = lo.astype(np.float32) * vs
    return origin, grid, sign


def query_esdf(origin: np.ndarray, grid: np.ndarray, voxel_size: float,
               pts_world: np.ndarray) -> np.ndarray:
    """Trilinear ESDF lookup at world points (outside the grid -> +inf).

    The planner-facing query voxblox's esdf_server exposes.
    """
    if grid.size == 0 or len(pts_world) == 0:
        return np.full(len(pts_world), np.inf, np.float32)
    g = (pts_world - origin) / voxel_size - 0.5
    lo = np.floor(g).astype(np.int64)
    f = (g - lo).astype(np.float32)
    out = np.full(len(pts_world), np.inf, np.float32)
    ok = np.all(lo >= 0, 1) & np.all(lo + 1 < np.asarray(grid.shape), 1)
    if not ok.any():
        return out
    l0 = lo[ok]
    fx, fy, fz = f[ok, 0], f[ok, 1], f[ok, 2]
    acc = np.zeros(ok.sum(), np.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (fx if dx else 1 - fx)
                    * (fy if dy else 1 - fy)
                    * (fz if dz else 1 - fz)
                )
                acc += w * grid[l0[:, 0] + dx, l0[:, 1] + dy, l0[:, 2] + dz]
    out[ok] = acc
    return out
