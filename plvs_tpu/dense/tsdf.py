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


def _next_bucket(n: int, floor: int, cap: int) -> int:
    """Round a live block count up to a power-of-two bucket so the jitted
    integrators see a handful of static shapes instead of one per frame."""
    b = floor
    while b < n:
        b *= 2
    return min(b, cap)


def _tsdf_update(
    block_coords, tsdf, weight, color, depth_img, color_img, Rcw, tcw,
    cam, voxel_size, trunc, max_weight=100.0, block_valid=None,
):
    """Projective TSDF update math (unjitted body shared by the public
    fixed-shape entry and the device-resident bucketed entry).

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
    if color_img.ndim == 2:
        # grayscale input: broadcast to the RGB color volume (uploading a
        # replicated [H, W, 3] float image cost 3x the link bytes)
        col = col[..., None]

    in_img = cam_mod.in_image(cam, uv) & (z > 0.05) & (d > 0.0)
    sdf = d - z
    upd = in_img & (sdf > -trunc)
    tsdf_new = jnp.clip(sdf / trunc, -1.0, 1.0)
    # tapered weight behind the surface (voxblox-style)
    w_new = jnp.where(sdf < 0, jnp.maximum((trunc + sdf) / trunc, 0.0), 1.0)
    w_new = jnp.where(upd, w_new, 0.0)
    if block_valid is not None:
        w_new = jnp.where(block_valid[:, None], w_new, 0.0)

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
    """Projective TSDF update of all blocks against one depth frame
    (fixed-shape public entry; also the unit of the sharded multi-device
    path in plvs_tpu.parallel.sharded_tsdf)."""
    return _tsdf_update(
        block_coords, tsdf, weight, color, depth_img, color_img, Rcw, tcw,
        cam, voxel_size, trunc, max_weight)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "voxel_size", "trunc", "nb"),
    donate_argnums=(1, 2, 3),
)
def _integrate_resident(
    coords_full, tsdf_full, weight_full, color_full, n_valid,
    depth_img, color_img, Rcw, tcw, cam, voxel_size, trunc, nb,
):
    """Device-resident bucketed update: the full-capacity block table stays
    on the device across frames (donated in/out, zero host round trips);
    only the first ``nb`` slots (live count rounded up to a power-of-two
    bucket, so recompiles are O(log capacity) not O(frames)) are touched,
    and slots past ``n_valid`` are masked out of the update."""
    bc = coords_full[:nb]
    valid = jnp.arange(nb) < n_valid
    t, w, c = _tsdf_update(
        bc, tsdf_full[:nb], weight_full[:nb], color_full[:nb],
        depth_img, color_img, Rcw, tcw, cam, voxel_size, trunc,
        block_valid=valid)
    # per-block MEANINGFUL-change mask at full depth resolution — this is
    # what the incremental mesher's version bump keys off. Mesh vertices
    # depend on the tsdf values and on cubes crossing the mesher's validity
    # weight, so a block is dirty when its tsdf moved visibly or a voxel
    # just became mesh-valid; weight-only accumulation on a converged
    # surface (every observed block, every frame) must NOT dirty it or the
    # "incremental" mesher re-extracts the whole visible map per keyframe.
    MESH_W = 1.0   # IncrementalMesher min_weight default
    EPS = 0.01     # 1% of the truncation range ~ sub-voxel-size shift
    changed = (
        jnp.any(jnp.abs(t - tsdf_full[:nb]) > EPS, axis=(1, 2, 3))
        | jnp.any((weight_full[:nb] <= MESH_W) & (w > MESH_W),
                  axis=(1, 2, 3))
    )
    return (
        tsdf_full.at[:nb].set(t),
        weight_full.at[:nb].set(w),
        color_full.at[:nb].set(c),
        changed,
    )


def _label_update(
    block_coords, label, label_conf, depth_img, label_img, Rcw, tcw,
    cam, voxel_size, trunc, max_conf=64.0, block_valid=None,
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
    if block_valid is not None:
        in_band = in_band & block_valid[:, None]
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
    """Fixed-shape public entry for label fusion (see _label_update)."""
    return _label_update(
        block_coords, label, label_conf, depth_img, label_img, Rcw, tcw,
        cam, voxel_size, trunc, max_conf)


@functools.partial(
    jax.jit,
    static_argnames=("cam", "voxel_size", "trunc", "nb"),
    donate_argnums=(1, 2),
)
def _integrate_labels_resident(
    coords_full, label_full, conf_full, n_valid,
    depth_img, label_img, Rcw, tcw, cam, voxel_size, trunc, nb,
):
    bc = coords_full[:nb]
    valid = jnp.arange(nb) < n_valid
    l, c = _label_update(
        bc, label_full[:nb], conf_full[:nb], depth_img, label_img, Rcw, tcw,
        cam, voxel_size, trunc, block_valid=valid)
    return label_full.at[:nb].set(l), conf_full.at[:nb].set(c)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _carve_unstable(tsdf_full, weight_full, block_old, min_weight):
    """Reset voxels with 0 < weight < min_weight in 'old' blocks to empty."""
    unstable = (
        (weight_full > 0.0) & (weight_full < min_weight)
        & block_old[:, None, None, None]
    )
    return (
        jnp.where(unstable, 1.0, tsdf_full),
        jnp.where(unstable, 0.0, weight_full),
    )


@dataclasses.dataclass
class TSDFVolume:
    """Host-managed block table + device-batched integration."""

    cam: cam_mod.Camera
    voxel_size: float = 0.02
    trunc_factor: float = 4.0      # truncation = factor * voxel_size
    max_blocks: int = 8192
    depth_subsample: int = 4       # allocation raycast stride
    max_depth: float = 8.0
    # power-of-two bucket floor for the resident integrator's block-count
    # shape: raise it (e.g. 4096) on realtime runs so the whole sequence
    # compiles ONE integrator instead of one per growth bucket
    bucket_floor: int = 512
    with_labels: bool = False      # per-voxel segment labels (octree_point)
    device: object = None          # pin state to a device (pipelining)

    def __post_init__(self):
        S = BLOCK
        self.block_map: dict[tuple, int] = {}
        self.block_coords = np.zeros((self.max_blocks, 3), np.int32)
        self.n_blocks = 0
        # per-block bookkeeping for incremental meshing + unstable-voxel
        # removal: frame counter, last-touched version, allocation frame
        self.frame_idx = 0
        self.block_version = np.zeros(self.max_blocks, np.int64)
        self.block_alloc_frame = np.zeros(self.max_blocks, np.int64)
        # working state lives ON DEVICE across frames (the reference's
        # backends mutate host memory in place; here the per-frame hot loop
        # must not ship the whole block table over PCIe/tunnel every frame)
        self._dev = {
            "tsdf": jnp.ones((self.max_blocks, S, S, S), jnp.float32),
            "weight": jnp.zeros((self.max_blocks, S, S, S), jnp.float32),
            "color": jnp.zeros((self.max_blocks, S, S, S, 3), jnp.float32),
        }
        if self.with_labels:
            self._dev["label"] = jnp.zeros((self.max_blocks, S, S, S), jnp.int32)
            self._dev["label_conf"] = jnp.zeros(
                (self.max_blocks, S, S, S), jnp.float32)
        if self.device is not None:
            self._dev = {k: jax.device_put(v, self.device)
                         for k, v in self._dev.items()}
        self._coords_d = None          # device copy, refreshed on allocation
        self._mirror: dict | None = None  # lazy host copy for queries/save
        self._alloc_rays = None        # cached subsampled unprojection rays
        self._pending_touch = []       # deferred (frame_idx, changed-mask)

    @property
    def trunc(self):
        return self.trunc_factor * self.voxel_size

    def _put(self, x, dtype=None):
        if isinstance(x, jax.Array):
            # already device-resident (e.g. the filtered depth straight
            # from the filter program): never round-trip through the host
            return x.astype(dtype) if dtype is not None else x
        a = np.asarray(x, dtype) if dtype is not None else np.asarray(x)
        if self.device is not None:
            return jax.device_put(a, self.device)
        return jnp.asarray(a)

    # -- host views (read-only; pulled from device lazily, invalidated by
    # integrate). Mutating these does NOT write back — use load_state. ------
    def _pull(self):
        self.flush_touched()
        if self._mirror is None:
            self._mirror = {k: np.asarray(v) for k, v in self._dev.items()}
        return self._mirror

    @property
    def tsdf(self):
        return self._pull()["tsdf"]

    @property
    def weight(self):
        return self._pull()["weight"]

    @property
    def color(self):
        return self._pull()["color"]

    @property
    def label(self):
        return self._pull()["label"]

    @property
    def label_conf(self):
        return self._pull()["label_conf"]

    def load_state(self, block_coords, tsdf, weight, color,
                   label=None, label_conf=None):
        """Replace the volume contents (checkpoint restore path)."""
        n = len(block_coords)
        assert n <= self.max_blocks
        self.n_blocks = n
        self.block_coords[:] = 0
        self.block_coords[:n] = block_coords
        self.block_map = {tuple(c): i for i, c in
                          enumerate(np.asarray(block_coords).tolist())}
        self.frame_idx = 1
        self.block_version[:] = 0
        self.block_version[:n] = 1
        self.block_alloc_frame[:] = 0
        S = BLOCK
        for key, init, val in (
            ("tsdf", 1.0, tsdf), ("weight", 0.0, weight), ("color", 0.0, color),
            ("label", 0, label), ("label_conf", 0.0, label_conf),
        ):
            if key not in self._dev:
                continue
            full = np.full_like(np.asarray(self._dev[key]), init)
            if val is not None:
                full[:n] = val
            self._dev[key] = self._put(full)
        self._coords_d = None
        self._mirror = None
        self._pending_touch = []

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
        if self._alloc_rays is None or self._alloc_rays.shape[:2] != d.shape:
            uv_all = np.stack([us, vs], -1).astype(np.float32).reshape(-1, 2)
            self._alloc_rays = np.asarray(
                cam_mod.unproject(self.cam, jnp.asarray(uv_all))
            ).reshape(*d.shape, 3)
        rays = self._alloc_rays[ok]
        Rwc = Rcw.T
        C = -Rwc @ tcw
        pts = []
        for dd in (-self.trunc, 0.0, self.trunc):
            Xc = rays * (d[ok, None] + dd)
            pts.append(Xc @ Rwc.T + C)
        P = np.concatenate(pts)
        bc = np.floor(P / (BLOCK * self.voxel_size)).astype(np.int64)
        # dedup via packed int64 keys: np.unique(axis=0) sorts void views
        # (~44 ms for 57k rows, measured); a 1-D int64 sort is ~1 ms
        OFF = 1 << 20
        key = (((bc[:, 0] + OFF) << 42) | ((bc[:, 1] + OFF) << 21)
               | (bc[:, 2] + OFF))
        ku = np.unique(key)
        uniq = np.stack([(ku >> 42) - OFF, ((ku >> 21) & 0x1FFFFF) - OFF,
                         (ku & 0x1FFFFF) - OFF], axis=1).astype(np.int32)
        n0 = self.n_blocks
        for c in map(tuple, uniq.tolist()):
            if c in self.block_map:
                continue
            if self.n_blocks >= self.max_blocks:
                continue  # capacity — stop allocating (bounded map)
            i = self.n_blocks
            self.block_map[c] = i
            self.block_coords[i] = c
            self.block_alloc_frame[i] = self.frame_idx
            self.n_blocks += 1
        if self.n_blocks != n0:
            self._coords_d = None  # device copy stale

    # -- integration --------------------------------------------------------
    def integrate(self, depth, color, Rcw: np.ndarray, tcw: np.ndarray,
                  alloc_depth: np.ndarray | None = None):
        """Fuse one registered RGB-D frame (device-resident hot path: the
        only per-frame host→device traffic is the images + pose, and the
        call does NOT synchronize — the exact changed-block mask is fetched
        lazily at the first block_version read).

        ``depth``/``color`` may be device arrays (e.g. straight out of the
        depth filter program); ``alloc_depth`` is the host-side depth used
        for block allocation (defaults to ``depth`` fetched; pass the raw
        host depth to keep the filtered depth on device)."""
        if alloc_depth is None:
            alloc_depth = np.asarray(depth)
        self._allocate_for_frame(alloc_depth, Rcw, tcw)
        n = self.n_blocks
        if n == 0:
            return
        if self._coords_d is None:
            self._coords_d = self._put(self.block_coords)
        nb = _next_bucket(n, self.bucket_floor, self.max_blocks)
        d = self._dev
        t, w, c, changed = _integrate_resident(
            self._coords_d, d["tsdf"], d["weight"], d["color"],
            self._put(n, np.int32),
            self._put(depth, np.float32), self._put(color, np.float32),
            self._put(Rcw, np.float32), self._put(tcw, np.float32),
            self.cam, self.voxel_size, self.trunc, nb,
        )
        d["tsdf"], d["weight"], d["color"] = t, w, c
        self._mirror = None
        self.frame_idx += 1
        # LAZY version bump: fetching ``changed`` here would synchronize on
        # the whole integrate chain (a flat ~25 ms link fetch per KF);
        # consumers of block_version call flush_touched() first
        self._pending_touch.append((self.frame_idx, changed))

    def flush_touched(self):
        """Apply deferred changed-block version bumps (one batched fetch)."""
        if not self._pending_touch:
            return
        pending, self._pending_touch = self._pending_touch, []
        masks = jax.device_get(tuple(ch for _, ch in pending))
        self._apply_touched(pending, masks)

    def dispatch_touched(self, submit):
        """Staged alternative to flush_touched: hand the pending changed-
        mask fetch to ``submit`` (fn(outs) -> future) so a helper thread
        blocks on it while the tracking loop keeps running; pass the
        returned ctx to :meth:`apply_touched` a stage later. None when
        nothing is pending."""
        if not self._pending_touch:
            return None
        pending, self._pending_touch = self._pending_touch, []
        return (pending, submit(tuple(ch for _, ch in pending)))

    def apply_touched(self, ctx):
        if ctx is None:
            return
        pending, fut = ctx
        self._apply_touched(pending, fut.result())

    def _apply_touched(self, pending, masks):
        for (fidx, _), ch in zip(pending, masks):
            idx = np.nonzero(np.asarray(ch))[0]
            if len(idx):
                self.block_version[idx] = fidx

    def _mark_touched(self, Rcw, tcw, changed=None):
        """Bump the version of exactly the blocks the integration pass
        changed. ``changed`` is the exact per-block mask computed on the
        device by _integrate_resident (full depth resolution — NOT the
        stride-subsampled allocation sample set, which misses blocks covered
        only by skipped pixels); falls back to a conservative camera-range
        test when no mask is available."""
        if changed is not None:
            ch = np.asarray(changed)
            idx = np.nonzero(ch)[0]
            if len(idx):
                self.block_version[idx] = self.frame_idx
            return
        n = self.n_blocks
        S = BLOCK
        centers = (self.block_coords[:n].astype(np.float32) + 0.5) * (
            S * self.voxel_size)
        Xc = centers @ Rcw.T + tcw
        diag = S * self.voxel_size * np.sqrt(3.0)
        touched = (Xc[:, 2] > -diag) & (
            np.linalg.norm(Xc, axis=1) < self.max_depth + diag)
        self.block_version[:n][touched] = self.frame_idx

    def remove_unstable(self, min_weight: float = 2.0, min_age: int = 3):
        """Clear voxels that never accumulated ``min_weight`` observations in
        blocks at least ``min_age`` frames old (reference: the octree_point
        backend's unstable-point removal,
        include/OctreePointCloudCentroid.h:74-316 — sporadic depth noise is
        dropped once it fails to be re-observed)."""
        n = self.n_blocks
        if n == 0:
            return
        old = np.zeros(self.max_blocks, bool)
        old[:n] = (self.frame_idx - self.block_alloc_frame[:n]) >= min_age
        d = self._dev
        t, w = _carve_unstable(
            d["tsdf"], d["weight"], self._put(old), float(min_weight))
        d["tsdf"], d["weight"] = t, w
        self._mirror = None
        self.block_version[:n][old[:n]] = self.frame_idx

    def integrate_labels(self, depth: np.ndarray, label_img: np.ndarray,
                         Rcw: np.ndarray, tcw: np.ndarray):
        """Fuse one frame's global label image into the voxel labels
        (call after ``integrate`` so new blocks exist)."""
        assert self.with_labels
        n = self.n_blocks
        if n == 0:
            return
        if self._coords_d is None:
            self._coords_d = self._put(self.block_coords)
        nb = _next_bucket(n, 512, self.max_blocks)
        d = self._dev
        l, c = _integrate_labels_resident(
            self._coords_d, d["label"], d["label_conf"],
            self._put(n, np.int32),
            self._put(depth, np.float32), self._put(label_img, np.int32),
            self._put(Rcw, np.float32), self._put(tcw, np.float32),
            self.cam, self.voxel_size, self.trunc, nb,
        )
        d["label"], d["label_conf"] = l, c
        self._mirror = None

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
