"""Voxel-block TSDF fusion engine — one batched projective-update kernel.

TPU-native replacement for the reference's six volumetric backends
(reference: PointCloudMap implementations selected by
``PointCloudMapping.type`` — chisel TSDF src/PointCloudMapChisel.cc,
voxblox src/PointCloudMapVoxblox.cc, fastfusion, octomap, octree_point,
voxelgrid; see include/PointCloudMapTypes.h:13-21). Design shift: instead
of per-backend C++ integrators with pointer/hash chasing per voxel, ONE
engine integrates depth frames into fixed-capacity 8^3 voxel blocks with a
fully batched projective update — every voxel of every active block
projects into the depth image, gathers the measured depth, and applies the
weighted TSDF running average in a single fused pass (no scatter, no
collisions). Block allocation (which blocks exist) is cheap host-side set
arithmetic, mirroring the host-orchestration/device-compute split used
throughout the framework.

Occupancy/octomap mode falls out for free: weight > 0 & |tsdf| < eps is an
occupied-voxel query; the voxelgrid backend is the weight>0 centroid cloud.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import cameras as cam_mod

BLOCK = 8  # voxels per block side


@functools.partial(
    jax.jit, static_argnames=("cam", "voxel_size", "trunc", "max_weight")
)
def integrate_blocks(
    block_coords: jnp.ndarray,   # [B, 3] int32 block grid coords (world/block)
    tsdf: jnp.ndarray,           # [B, S, S, S] f32
    weight: jnp.ndarray,         # [B, S, S, S] f32
    color: jnp.ndarray,          # [B, S, S, S, 3] f32
    depth_img: jnp.ndarray,      # [H, W] f32 (<= 0 invalid)
    color_img: jnp.ndarray,      # [H, W, 3] f32
    Rcw: jnp.ndarray, tcw: jnp.ndarray,
    cam: cam_mod.Camera,
    voxel_size: float,
    trunc: float,
    max_weight: float = 100.0,
):
    """Projective TSDF update of all blocks against one depth frame.

    (reference behavior: chisel ProjectionIntegrator / voxblox fast
    integrator — here inverted into a gather so it vectorizes.)
    """
    B = block_coords.shape[0]
    S = BLOCK
    # voxel center world coords [B, S^3, 3]
    r = (jnp.arange(S) + 0.5) * voxel_size
    zz, yy, xx = jnp.meshgrid(r, r, r, indexing="ij")
    offs = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)  # [S^3, 3] (x,y,z)
    origin = block_coords.astype(jnp.float32) * (S * voxel_size)
    Xw = origin[:, None, :] + offs[None, :, :]
    Xc = jnp.einsum("ij,bnj->bni", Rcw, Xw) + tcw
    uv = cam_mod.project(cam, Xc)
    z = Xc[..., 2]

    H, W = depth_img.shape
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[vi, ui]
    col = color_img[vi, ui]

    in_img = cam_mod.in_image(cam, uv) & (z > 0.05) & (d > 0.0)
    sdf = d - z
    upd = in_img & (sdf > -trunc)
    tsdf_new = jnp.clip(sdf / trunc, -1.0, 1.0)
    # tapered weight behind the surface (voxblox-style)
    w_new = jnp.where(sdf < 0, jnp.maximum((trunc + sdf) / trunc, 0.0), 1.0)
    w_new = jnp.where(upd, w_new, 0.0)

    w_old = weight.reshape(B, -1)
    t_old = tsdf.reshape(B, -1)
    c_old = color.reshape(B, -1, 3)
    w_sum = w_old + w_new
    w_safe = jnp.maximum(w_sum, 1e-6)
    t_out = (t_old * w_old + tsdf_new * w_new) / w_safe
    c_out = (c_old * w_old[..., None] + col * w_new[..., None]) / w_safe[..., None]
    w_out = jnp.minimum(w_sum, max_weight)
    return (
        t_out.reshape(tsdf.shape),
        w_out.reshape(weight.shape),
        c_out.reshape(color.shape),
    )


@functools.partial(
    jax.jit, static_argnames=("cam", "voxel_size", "trunc", "max_conf")
)
def integrate_blocks_labels(
    block_coords: jnp.ndarray,   # [B, 3]
    label: jnp.ndarray,          # [B, S, S, S] int32 global segment id
    label_conf: jnp.ndarray,     # [B, S, S, S] f32 confidence counter
    depth_img: jnp.ndarray,
    label_img: jnp.ndarray,      # [H, W] int32 global labels (0 = none)
    Rcw: jnp.ndarray, tcw: jnp.ndarray,
    cam: cam_mod.Camera,
    voxel_size: float,
    trunc: float,
    max_conf: float = 64.0,
):
    """Per-voxel label confidence fusion (reference: label + confidence
    accumulation in OctreePointCloudCentroid voxels,
    include/OctreePointCloudCentroid.h:236-269): observing the stored label
    raises its confidence, a conflicting observation lowers it, and the
    label flips once confidence is exhausted."""
    B = block_coords.shape[0]
    S = BLOCK
    r = (jnp.arange(S) + 0.5) * voxel_size
    zz, yy, xx = jnp.meshgrid(r, r, r, indexing="ij")
    offs = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    origin = block_coords.astype(jnp.float32) * (S * voxel_size)
    Xw = origin[:, None, :] + offs[None, :, :]
    Xc = jnp.einsum("ij,bnj->bni", Rcw, Xw) + tcw
    uv = cam_mod.project(cam, Xc)
    z = Xc[..., 2]

    H, W = depth_img.shape
    ui = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[vi, ui]
    lbl_new = label_img[vi, ui]

    # only fuse labels in the surface band of this observation
    in_band = (
        cam_mod.in_image(cam, uv) & (z > 0.05) & (d > 0.0)
        & (jnp.abs(d - z) < trunc) & (lbl_new > 0)
    )
    l_old = label.reshape(B, -1)
    c_old = label_conf.reshape(B, -1)
    same = l_old == lbl_new
    unlabeled = l_old == 0
    c_out = jnp.where(
        same, jnp.minimum(c_old + 1.0, max_conf), c_old - 1.0)
    c_out = jnp.where(unlabeled, 1.0, c_out)
    flip = (~same) & (~unlabeled) & (c_out <= 0.0)
    l_out = jnp.where(unlabeled | flip, lbl_new, l_old)
    c_out = jnp.where(flip, 1.0, c_out)
    l_out = jnp.where(in_band, l_out, l_old)
    c_out = jnp.where(in_band, c_out, c_old)
    return l_out.reshape(label.shape), c_out.reshape(label_conf.shape)


@dataclasses.dataclass
class TSDFVolume:
    """Host-managed block table + device-batched integration."""

    cam: cam_mod.Camera
    voxel_size: float = 0.02
    trunc_factor: float = 4.0      # truncation = factor * voxel_size
    max_blocks: int = 8192
    depth_subsample: int = 4       # allocation raycast stride
    max_depth: float = 8.0
    with_labels: bool = False      # per-voxel segment labels (octree_point)

    def __post_init__(self):
        S = BLOCK
        self.block_map: dict[tuple, int] = {}
        self.block_coords = np.zeros((self.max_blocks, 3), np.int32)
        self.tsdf = np.ones((self.max_blocks, S, S, S), np.float32)
        self.weight = np.zeros((self.max_blocks, S, S, S), np.float32)
        self.color = np.zeros((self.max_blocks, S, S, S, 3), np.float32)
        if self.with_labels:
            self.label = np.zeros((self.max_blocks, S, S, S), np.int32)
            self.label_conf = np.zeros((self.max_blocks, S, S, S), np.float32)
        self.n_blocks = 0

    @property
    def trunc(self):
        return self.trunc_factor * self.voxel_size

    # -- allocation ---------------------------------------------------------
    def _allocate_for_frame(self, depth, Rcw, tcw):
        """New blocks touched by the depth frame (truncation band around the
        back-projected surface), host-side set arithmetic."""
        h, w = depth.shape
        ss = self.depth_subsample
        vs, us = np.mgrid[0:h:ss, 0:w:ss]
        d = depth[vs, us]
        ok = (d > 0) & (d < self.max_depth)
        if not ok.any():
            return
        uv = np.stack([us[ok], vs[ok]], -1).astype(np.float32)
        import jax.numpy as jnp
        rays = np.asarray(cam_mod.unproject(self.cam, jnp.asarray(uv)))
        Rwc = Rcw.T
        C = -Rwc @ tcw
        pts = []
        for dd in (-self.trunc, 0.0, self.trunc):
            Xc = rays * (d[ok, None] + dd)
            pts.append(Xc @ Rwc.T + C)
        P = np.concatenate(pts)
        bc = np.floor(P / (BLOCK * self.voxel_size)).astype(np.int32)
        uniq = np.unique(bc, axis=0)
        for c in map(tuple, uniq.tolist()):
            if c not in self.block_map:
                if self.n_blocks >= self.max_blocks:
                    return  # capacity — silently stop allocating (bounded map)
                self.block_map[c] = self.n_blocks
                self.block_coords[self.n_blocks] = c
                self.n_blocks += 1

    # -- integration --------------------------------------------------------
    def integrate(self, depth: np.ndarray, color: np.ndarray,
                  Rcw: np.ndarray, tcw: np.ndarray):
        """Fuse one registered RGB-D frame."""
        self._allocate_for_frame(depth, Rcw, tcw)
        n = self.n_blocks
        if n == 0:
            return
        t, w, c = integrate_blocks(
            jnp.asarray(self.block_coords[:n]),
            jnp.asarray(self.tsdf[:n]), jnp.asarray(self.weight[:n]),
            jnp.asarray(self.color[:n]),
            jnp.asarray(depth), jnp.asarray(color),
            jnp.asarray(Rcw), jnp.asarray(tcw),
            self.cam, self.voxel_size, self.trunc,
        )
        self.tsdf[:n] = np.asarray(t)
        self.weight[:n] = np.asarray(w)
        self.color[:n] = np.asarray(c)

    def integrate_labels(self, depth: np.ndarray, label_img: np.ndarray,
                         Rcw: np.ndarray, tcw: np.ndarray):
        """Fuse one frame's global label image into the voxel labels
        (call after ``integrate`` so new blocks exist)."""
        assert self.with_labels
        n = self.n_blocks
        if n == 0:
            return
        l, c = integrate_blocks_labels(
            jnp.asarray(self.block_coords[:n]),
            jnp.asarray(self.label[:n]), jnp.asarray(self.label_conf[:n]),
            jnp.asarray(depth), jnp.asarray(label_img, np.int32),
            jnp.asarray(Rcw), jnp.asarray(tcw),
            self.cam, self.voxel_size, self.trunc,
        )
        self.label[:n] = np.asarray(l)
        self.label_conf[:n] = np.asarray(c)

    def labels_at(self, pts_world: np.ndarray) -> np.ndarray:
        """Stored global label at each world point's voxel (0 if the voxel's
        block is unallocated) — the map side of local->global label
        association (reference: LabelMap voxel-overlap matching)."""
        assert self.with_labels
        S = BLOCK
        out = np.zeros(len(pts_world), np.int32)
        if self.n_blocks == 0 or len(pts_world) == 0:
            return out
        bs = S * self.voxel_size
        bc = np.floor(pts_world / bs).astype(np.int32)
        vox = np.floor(pts_world / self.voxel_size).astype(np.int32) - bc * S
        vox = np.clip(vox, 0, S - 1)
        # vectorized block lookup through a dense table of seen coords
        uniq, inv = np.unique(bc, axis=0, return_inverse=True)
        slot = np.array(
            [self.block_map.get(tuple(c), -1) for c in uniq.tolist()],
            np.int64)[inv]
        ok = slot >= 0
        out[ok] = self.label[slot[ok], vox[ok, 2], vox[ok, 1], vox[ok, 0]]
        return out

    def reset(self):
        self.__post_init__()

    # -- queries ------------------------------------------------------------
    def occupied_cloud(self, tsdf_eps: float = 0.5, min_weight: float = 1.0):
        """Surface-band voxel centroids + colors (voxelgrid/octomap modes)."""
        n = self.n_blocks
        if n == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.float32)
        S = BLOCK
        sel = (np.abs(self.tsdf[:n]) < tsdf_eps) & (self.weight[:n] >= min_weight)
        b, zi, yi, xi = np.nonzero(sel)
        centers = (
            self.block_coords[:n][b] * (S * self.voxel_size)
            + (np.stack([xi, yi, zi], -1) + 0.5) * self.voxel_size
        )
        return centers.astype(np.float32), self.color[:n][sel]

    def segmented_cloud(self, tsdf_eps: float = 0.5, min_weight: float = 1.0,
                        min_conf: float = 2.0):
        """Surface voxel centroids + their global segment labels (the
        octree_point backend's segment view; labels below the confidence
        floor report 0)."""
        assert self.with_labels
        n = self.n_blocks
        if n == 0:
            return (np.zeros((0, 3), np.float32), np.zeros((0,), np.int32))
        S = BLOCK
        sel = (np.abs(self.tsdf[:n]) < tsdf_eps) & (self.weight[:n] >= min_weight)
        b, zi, yi, xi = np.nonzero(sel)
        centers = (
            self.block_coords[:n][b] * (S * self.voxel_size)
            + (np.stack([xi, yi, zi], -1) + 0.5) * self.voxel_size
        ).astype(np.float32)
        lab = self.label[:n][sel]
        conf = self.label_conf[:n][sel]
        return centers, np.where(conf >= min_conf, lab, 0).astype(np.int32)

    def save_ply(self, path: str, max_points: int | None = None):
        pts, cols = self.occupied_cloud()
        if max_points and len(pts) > max_points:
            idx = np.random.default_rng(0).choice(len(pts), max_points, replace=False)
            pts, cols = pts[idx], cols[idx]
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
            f.write("end_header\n")
            for p, c in zip(pts, cols):
                f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                        f"{int(c[0])} {int(c[1])} {int(c[2])}\n")
