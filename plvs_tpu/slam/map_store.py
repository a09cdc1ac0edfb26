"""Host-side map store: fixed-capacity SoA arrays for keyframes, landmarks
and observations.

TPU-native redesign of the reference's pointer-graph map data model
(reference: src/Map.cc, src/KeyFrame.cc, src/MapPoint.cc, src/MapLine.cc —
mutex-protected sets of heap objects with per-object observation maps and a
weighted covisibility graph, include/KeyFrame.h:124-138). Here the canonical
state is flat numpy arrays managed by the host orchestration layer
(allocation, culling, compaction are cheap vectorized bookkeeping), and the
jitted device kernels consume padded slices of them. The covisibility graph
is *derived* from the observation table by segment counting instead of being
maintained edge-by-edge.
"""

from __future__ import annotations

import dataclasses

import numpy as np


_DISTINCTIVE_JIT = None


def _distinctive_rows(desc, mask):
    """[P, M, 8] uint32 descriptors + [P, M] validity -> [P] index of the
    row with minimum median Hamming distance to the other valid rows
    (reference: MapPoint::ComputeDistinctiveDescriptors, src/MapPoint.cc).
    Jitted once (lazy import keeps the module importable without jax work
    at load time); the whole batch is one popcount/sort pass."""
    global _DISTINCTIVE_JIT
    if _DISTINCTIVE_JIT is None:
        import jax
        import jax.numpy as jnp

        def run(desc, mask):
            x = jnp.bitwise_xor(desc[:, :, None, :], desc[:, None, :, :])
            d = jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)
            M = desc.shape[1]
            pair_ok = mask[:, :, None] & mask[:, None, :]
            # exclude self-distance from the median
            eye = jnp.eye(M, dtype=bool)[None]
            valid = pair_ok & ~eye
            BIG = jnp.int32(4096)
            d = jnp.where(valid, d, BIG)
            d_sorted = jnp.sort(d, axis=-1)
            cnt = jnp.sum(valid, axis=-1)  # [P, M] valid distances per row
            mid = jnp.clip((cnt - 1) // 2, 0, M - 1)
            med = jnp.take_along_axis(d_sorted, mid[..., None], axis=-1)[..., 0]
            med = jnp.where(mask & (cnt > 0), med, BIG)
            return jnp.argmin(med, axis=-1)

        _DISTINCTIVE_JIT = jax.jit(run)
    return _DISTINCTIVE_JIT(desc, mask)


@dataclasses.dataclass
class MapStore:
    max_kf: int = 512
    max_pts: int = 65536
    max_obs: int = 524288
    n_kp: int = 1024   # keypoint capacity per keyframe
    max_lines: int = 8192
    max_lobs: int = 65536
    n_kl: int = 128    # keyline capacity per keyframe

    def __post_init__(self):
        K, P, O, N = self.max_kf, self.max_pts, self.max_obs, self.n_kp
        # keyframes (world-to-camera poses, like the reference's Tcw)
        self.kf_R = np.zeros((K, 3, 3), np.float32)
        self.kf_t = np.zeros((K, 3), np.float32)
        self.kf_mask = np.zeros((K,), bool)
        self.kf_fixed = np.zeros((K,), bool)
        self.kf_timestamp = np.zeros((K,), np.float64)
        self.kf_frame_id = np.zeros((K,), np.int64)
        # multi-map atlas: each keyframe belongs to one map; maps are
        # disjoint id-sets inside this one fixed-capacity store (reference:
        # Atlas multi-map manager include/Atlas.h:87-147 — CreateNewMap on
        # tracking loss, welded back by map merging)
        self.kf_map = np.zeros((K,), np.int64)
        self.active_map = 0
        self.n_maps = 1
        # stable keyframe identity: slots are recycled by alloc_kf, so
        # anything that outlives a keyframe (the relative-pose trajectory
        # log) references keyframes by a monotonically unique uid. Culled
        # keyframes leave a TOMBSTONE — their relative pose to a surviving
        # anchor — so trajectory export can compose through them (reference:
        # SaveTrajectoryTUM walks the spanning tree past bad keyframes,
        # src/System.cc:860-1006)
        self.kf_uid = np.full((K,), -1, np.int64)
        self._next_kf_uid = 0
        self.uid_slot: dict[int, int] = {}
        # uid -> (parent_uid, R_cp, t_cp, R_abs, t_abs); parent_uid < 0
        # means no surviving anchor (the recorded absolute pose is final)
        self.kf_tombstone: dict = {}
        # per-KF keypoints (snapshot of the Frame at KF creation)
        self.kf_kp_xy = np.zeros((K, N, 2), np.float32)
        self.kf_kp_uvr = np.full((K, N, 3), -1.0, np.float32)
        self.kf_kp_desc = np.zeros((K, N, 8), np.uint32)
        self.kf_kp_octave = np.zeros((K, N), np.int32)
        self.kf_kp_angle = np.zeros((K, N), np.float32)
        self.kf_kp_mask = np.zeros((K, N), bool)
        self.kf_kp_pt = np.full((K, N), -1, np.int64)  # map-point id per keypoint
        # map points
        self.pt_xyz = np.zeros((P, 3), np.float32)
        self.pt_desc = np.zeros((P, 8), np.uint32)
        self.pt_normal = np.zeros((P, 3), np.float32)
        self.pt_min_dist = np.zeros((P,), np.float32)
        self.pt_max_dist = np.zeros((P,), np.float32)
        # orientation of the keypoint backing pt_desc (for the rotation-
        # consistency histogram in guided matching)
        self.pt_angle = np.zeros((P,), np.float32)
        self.pt_mask = np.zeros((P,), bool)
        self.pt_ref_kf = np.full((P,), -1, np.int64)
        self.pt_first_kf = np.full((P,), -1, np.int64)
        self.pt_n_obs = np.zeros((P,), np.int32)
        self.pt_visible = np.zeros((P,), np.int32)  # tracking visibility counter
        self.pt_found = np.zeros((P,), np.int32)    # tracking found counter
        # observation table (kf, pt, kp-index-in-kf)
        self.obs_kf = np.zeros((O,), np.int64)
        self.obs_pt = np.zeros((O,), np.int64)
        self.obs_kp = np.zeros((O,), np.int64)
        self.obs_mask = np.zeros((O,), bool)
        # line landmarks (3D segments, reference: MapLine src/MapLine.cc)
        Lm, Ol, Nl = self.max_lines, self.max_lobs, self.n_kl
        self.ln_Xs = np.zeros((Lm, 3), np.float32)
        self.ln_Xe = np.zeros((Lm, 3), np.float32)
        self.ln_desc = np.zeros((Lm, 8), np.uint32)
        self.ln_mask = np.zeros((Lm,), bool)
        self.ln_ref_kf = np.full((Lm,), -1, np.int64)
        self.ln_first_kf = np.full((Lm,), -1, np.int64)
        self.ln_n_obs = np.zeros((Lm,), np.int32)
        self.ln_visible = np.zeros((Lm,), np.int32)
        self.ln_found = np.zeros((Lm,), np.int32)
        # per-KF keylines (snapshot at KF creation)
        self.kf_kl_sp = np.zeros((K, Nl, 2), np.float32)
        self.kf_kl_ep = np.zeros((K, Nl, 2), np.float32)
        self.kf_kl_desc = np.zeros((K, Nl, 8), np.uint32)
        self.kf_kl_mask = np.zeros((K, Nl), bool)
        self.kf_kl_line = np.full((K, Nl), -1, np.int64)
        # measured endpoint depths (<=0 none) — feed the stereo/RGB-D line
        # BA residual's depth rows (reference: the 4D stereo line edge,
        # include/g2o/types_six_dof_expmap2.h:178-388)
        self.kf_kl_depth = np.zeros((K, Nl, 2), np.float32)
        # line observation table
        self.lobs_kf = np.zeros((Ol,), np.int64)
        self.lobs_line = np.zeros((Ol,), np.int64)
        self.lobs_kl = np.zeros((Ol,), np.int64)
        self.lobs_mask = np.zeros((Ol,), bool)
        self._n_kf = 0
        self._n_pt = 0
        self._n_ln = 0
        self._obs_top = 0  # append watermark (holes compacted lazily)
        self._lobs_top = 0
        # landmark mutation counter: bumped by every path that changes
        # landmark geometry/descriptors/masks so per-frame consumers (the
        # tracker's device-resident landmark mirror) can cache until it
        # moves. Mutations are KF-rate events; frames between KFs see a
        # stable map (matching the reference, where the tracking thread
        # reads landmarks the mapping threads update under mutexes).
        self.version = 0
        # coarse store lock for the async runtime: the tracking thread and
        # the mapper actor both touch the SoA arrays; mutating stages and
        # candidate gathers take this (device solves run OUTSIDE it) —
        # the TPU analogue of the reference's per-object mutexes
        # (include/LocalMapping.h:93 etc.)
        import threading

        self.lock = threading.RLock()

    # -- allocation ---------------------------------------------------------

    @staticmethod
    def _grown(arr: np.ndarray, new_cap: int, fill=None) -> np.ndarray:
        shape = (new_cap,) + arr.shape[1:]
        if fill is None:
            out = np.zeros(shape, arr.dtype)
        else:
            out = np.full(shape, fill, arr.dtype)
        out[: arr.shape[0]] = arr
        return out

    def _grow_kfs(self):
        """Double the keyframe capacity (long sequences must survive;
        fixed-capacity hard failure was a v1 limitation — device kernels see
        padded slices, so host-side growth is free of recompiles)."""
        new = self.max_kf * 2
        for name in ("kf_R", "kf_t", "kf_mask", "kf_fixed", "kf_timestamp",
                     "kf_frame_id", "kf_map", "kf_kp_xy", "kf_kp_desc",
                     "kf_kp_octave", "kf_kp_angle", "kf_kp_mask",
                     "kf_kl_sp", "kf_kl_ep", "kf_kl_desc", "kf_kl_mask",
                     "kf_kl_depth"):
            setattr(self, name, self._grown(getattr(self, name), new))
        self.kf_kp_uvr = self._grown(self.kf_kp_uvr, new, fill=-1.0)
        self.kf_kp_pt = self._grown(self.kf_kp_pt, new, fill=-1)
        self.kf_kl_line = self._grown(self.kf_kl_line, new, fill=-1)
        self.kf_uid = self._grown(self.kf_uid, new, fill=-1)
        self.max_kf = new

    def _grow_points(self):
        new = self.max_pts * 2
        for name in ("pt_xyz", "pt_desc", "pt_normal", "pt_min_dist",
                     "pt_max_dist", "pt_angle", "pt_mask", "pt_n_obs",
                     "pt_visible", "pt_found"):
            setattr(self, name, self._grown(getattr(self, name), new))
        self.pt_ref_kf = self._grown(self.pt_ref_kf, new, fill=-1)
        self.pt_first_kf = self._grown(self.pt_first_kf, new, fill=-1)
        self.max_pts = new

    def _grow_lines(self):
        new = self.max_lines * 2
        for name in ("ln_Xs", "ln_Xe", "ln_desc", "ln_mask", "ln_n_obs",
                     "ln_visible", "ln_found"):
            setattr(self, name, self._grown(getattr(self, name), new))
        self.ln_ref_kf = self._grown(self.ln_ref_kf, new, fill=-1)
        self.ln_first_kf = self._grown(self.ln_first_kf, new, fill=-1)
        self.max_lines = new

    def alloc_kf(self) -> int:
        free = np.nonzero(~self.kf_mask[: self._n_kf])[0]
        if len(free):
            k = int(free[0])
        else:
            if self._n_kf >= self.max_kf:
                self._grow_kfs()
            k = self._n_kf
            self._n_kf += 1
        self.kf_map[k] = self.active_map
        uid = self._next_kf_uid
        self._next_kf_uid += 1
        self.kf_uid[k] = uid
        self.uid_slot[uid] = k
        return k

    def ensure_uids(self):
        """Assign uids to live keyframes that lack one (loaded atlases
        predate the uid layer or were saved without it)."""
        for k in np.nonzero(self.kf_mask & (self.kf_uid < 0))[0]:
            uid = self._next_kf_uid
            self._next_kf_uid += 1
            self.kf_uid[k] = uid
            self.uid_slot[uid] = int(k)

    def resolve_kf_pose(self, uid: int):
        """Current world-to-camera pose of keyframe ``uid``, composing
        through tombstones of culled keyframes; None when unresolvable
        (e.g. a uid from a store replaced by load_map)."""
        R_acc = np.eye(3, dtype=np.float32)
        t_acc = np.zeros(3, np.float32)
        for _ in range(4096):  # bounded tombstone chain
            slot = self.uid_slot.get(uid)
            if slot is not None and self.kf_mask[slot]:
                return ((R_acc @ self.kf_R[slot]).astype(np.float32),
                        (R_acc @ self.kf_t[slot] + t_acc).astype(np.float32))
            tomb = self.kf_tombstone.get(uid)
            if tomb is None:
                return None
            parent, R_cp, t_cp, R_abs, t_abs = tomb
            if parent < 0:
                return ((R_acc @ R_abs).astype(np.float32),
                        (R_acc @ t_abs + t_acc).astype(np.float32))
            t_acc = (R_acc @ t_cp + t_acc).astype(np.float32)
            R_acc = (R_acc @ R_cp).astype(np.float32)
            uid = parent
        return None

    # -- multi-map atlas (reference: Atlas, include/Atlas.h:87-147) --------
    def create_map(self) -> int:
        """Start a fresh map; subsequent keyframes belong to it (reference:
        Atlas::CreateNewMap via Tracking::CreateMapInAtlas on loss,
        include/Tracking.h:147)."""
        self.active_map = self.n_maps
        self.n_maps += 1
        return self.active_map

    def kfs_of_map(self, map_id: int) -> np.ndarray:
        return np.nonzero(self.kf_mask & (self.kf_map == map_id))[0]

    def points_of_map(self, map_id: int) -> np.ndarray:
        """Live points whose reference keyframe lies in ``map_id``."""
        pts = np.nonzero(self.pt_mask)[0]
        ref = self.pt_ref_kf[pts]
        ok = (ref >= 0) & (self.kf_map[np.clip(ref, 0, self.max_kf - 1)]
                           == map_id)
        return pts[ok]

    def merge_map_into(self, src_map: int, dst_map: int,
                       G_R: np.ndarray, G_t: np.ndarray,
                       G_s: float = 1.0):
        """Weld ``src_map`` into ``dst_map``'s frame: X_dst = s G_R X_src + G_t
        for every landmark, and T_kf' = T_kf ∘ G^{-1} for every keyframe
        (reference: LoopClosing::MergeLocal Sim3 welding,
        src/LoopClosing.cc:1684-)."""
        kfs = self.kfs_of_map(src_map)
        pts = self.points_of_map(src_map)
        # landmarks
        self.pt_xyz[pts] = (
            G_s * self.pt_xyz[pts] @ G_R.T + G_t).astype(np.float32)
        lns = np.nonzero(self.ln_mask)[0]
        if len(lns):
            ref = self.ln_ref_kf[lns]
            sel = lns[(ref >= 0)
                      & (self.kf_map[np.clip(ref, 0, self.max_kf - 1)]
                         == src_map)]
            for arr in (self.ln_Xs, self.ln_Xe):
                arr[sel] = (G_s * arr[sel] @ G_R.T + G_t).astype(np.float32)
        # keyframes: camera center maps like any world point
        # (C' = s G_R C + G_t), so R' = R G_R^T and t' = s t - R' G_t
        for k in kfs:
            Rk, tk = self.kf_R[k], self.kf_t[k]
            Rn = Rk @ G_R.T
            self.kf_R[k] = Rn.astype(np.float32)
            self.kf_t[k] = (G_s * tk - Rn @ G_t).astype(np.float32)
        self.kf_map[kfs] = dst_map
        if self.active_map == src_map:
            self.active_map = dst_map
        self.version += 1

    def alloc_pts(self, n: int) -> np.ndarray:
        free = np.nonzero(~self.pt_mask[: self._n_pt])[0][:n]
        need = n - len(free)
        if need > 0:
            while self._n_pt + need > self.max_pts:
                self._grow_points()
            fresh = np.arange(self._n_pt, self._n_pt + need)
            self._n_pt += need
            self.version += 1
            return np.concatenate([free, fresh])
        self.version += 1
        return free

    def add_observations(self, kf: int, pt_ids: np.ndarray, kp_ids: np.ndarray):
        n = len(pt_ids)
        if n == 0:
            return
        if self._obs_top + n > self.max_obs:
            self.compact_observations()
            while self._obs_top + n > self.max_obs:
                new = self.max_obs * 2
                for name in ("obs_kf", "obs_pt", "obs_kp", "obs_mask"):
                    setattr(self, name, self._grown(getattr(self, name), new))
                self.max_obs = new
        sl = slice(self._obs_top, self._obs_top + n)
        self.obs_kf[sl] = kf
        self.obs_pt[sl] = pt_ids
        self.obs_kp[sl] = kp_ids
        self.obs_mask[sl] = True
        self._obs_top += n
        self.kf_kp_pt[kf, kp_ids] = pt_ids
        np.add.at(self.pt_n_obs, pt_ids, 1)

    def compact_observations(self):
        live = self.obs_mask[: self._obs_top]
        n = int(live.sum())
        for a in (self.obs_kf, self.obs_pt, self.obs_kp):
            a[:n] = a[: self._obs_top][live]
        self.obs_mask[:n] = True
        self.obs_mask[n:] = False
        self._obs_top = n

    def alloc_lines(self, n: int) -> np.ndarray:
        free = np.nonzero(~self.ln_mask[: self._n_ln])[0][:n]
        need = n - len(free)
        if need > 0:
            while self._n_ln + need > self.max_lines:
                self._grow_lines()
            fresh = np.arange(self._n_ln, self._n_ln + need)
            self._n_ln += need
            self.version += 1
            return np.concatenate([free, fresh])
        self.version += 1
        return free

    def add_line_observations(self, kf: int, line_ids: np.ndarray,
                              kl_ids: np.ndarray):
        n = len(line_ids)
        if n == 0:
            return
        if self._lobs_top + n > self.max_lobs:
            self.compact_line_observations()
            while self._lobs_top + n > self.max_lobs:
                new = self.max_lobs * 2
                for name in ("lobs_kf", "lobs_line", "lobs_kl", "lobs_mask"):
                    setattr(self, name, self._grown(getattr(self, name), new))
                self.max_lobs = new
        sl = slice(self._lobs_top, self._lobs_top + n)
        self.lobs_kf[sl] = kf
        self.lobs_line[sl] = line_ids
        self.lobs_kl[sl] = kl_ids
        self.lobs_mask[sl] = True
        self._lobs_top += n
        self.kf_kl_line[kf, kl_ids] = line_ids
        np.add.at(self.ln_n_obs, line_ids, 1)

    def compact_line_observations(self):
        live = self.lobs_mask[: self._lobs_top]
        n = int(live.sum())
        for a in (self.lobs_kf, self.lobs_line, self.lobs_kl):
            a[:n] = a[: self._lobs_top][live]
        self.lobs_mask[:n] = True
        self.lobs_mask[n:] = False
        self._lobs_top = n

    def remove_lines(self, line_ids: np.ndarray):
        if len(line_ids) == 0:
            return
        self.ln_mask[line_ids] = False
        sel = np.isin(self.lobs_line[: self._lobs_top], line_ids) & \
            self.lobs_mask[: self._lobs_top]
        kfs = self.lobs_kf[: self._lobs_top][sel]
        kls = self.lobs_kl[: self._lobs_top][sel]
        self.kf_kl_line[kfs, kls] = -1
        self.lobs_mask[: self._lobs_top][sel] = False
        self.ln_n_obs[line_ids] = 0
        self.version += 1

    def live_line_obs(self):
        m = self.lobs_mask[: self._lobs_top]
        return (
            self.lobs_kf[: self._lobs_top][m],
            self.lobs_line[: self._lobs_top][m],
            self.lobs_kl[: self._lobs_top][m],
        )

    def lines_in_kfs(self, kf_ids: np.ndarray) -> np.ndarray:
        okf, oln, _ = self.live_line_obs()
        sel = np.isin(okf, kf_ids)
        return np.unique(oln[sel])

    @property
    def num_lines(self):
        return int(self.ln_mask.sum())

    # -- removal ------------------------------------------------------------

    def remove_points(self, pt_ids: np.ndarray):
        if len(pt_ids) == 0:
            return
        self.pt_mask[pt_ids] = False
        sel = np.isin(self.obs_pt[: self._obs_top], pt_ids) & self.obs_mask[: self._obs_top]
        # clear back-references in keyframes
        kfs = self.obs_kf[: self._obs_top][sel]
        kps = self.obs_kp[: self._obs_top][sel]
        self.kf_kp_pt[kfs, kps] = -1
        self.obs_mask[: self._obs_top][sel] = False
        self.pt_n_obs[pt_ids] = 0
        self.version += 1

    def replace_point(self, loser: int, winner: int):
        """Merge landmark ``loser`` into ``winner`` (reference:
        MapPoint::Replace — observations are transferred unless the winner
        is already observed in that keyframe)."""
        if loser == winner:
            return
        top = self._obs_top
        lrows = np.nonzero((self.obs_pt[:top] == loser) & self.obs_mask[:top])[0]
        wkfs = set(self.obs_kf[:top][(self.obs_pt[:top] == winner)
                                     & self.obs_mask[:top]].tolist())
        for r in lrows:
            kf, kp = self.obs_kf[r], self.obs_kp[r]
            if int(kf) in wkfs:
                self.obs_mask[r] = False
                self.kf_kp_pt[kf, kp] = -1
            else:
                self.obs_pt[r] = winner
                self.kf_kp_pt[kf, kp] = winner
                self.pt_n_obs[winner] += 1
                wkfs.add(int(kf))
        self.pt_mask[loser] = False
        self.pt_n_obs[loser] = 0
        self.pt_visible[winner] += self.pt_visible[loser]
        self.pt_found[winner] += self.pt_found[loser]
        self.version += 1

    def remove_keyframe(self, kf: int):
        uid = int(self.kf_uid[kf])
        if uid >= 0:
            # tombstone: relative pose to the strongest surviving covisible
            # anchor (trajectory export composes through it; reference:
            # culled KeyFrames keep mTcp to their spanning-tree parent)
            covis, _ = self.covisibility(kf, min_weight=1)
            anchor = next((int(c) for c in covis if self.kf_mask[c]), None)
            if anchor is None:
                others = np.nonzero(self.kf_mask
                                    & (self.kf_map == self.kf_map[kf]))[0]
                others = others[others != kf]
                anchor = int(others[0]) if len(others) else None
            R_c, t_c = self.kf_R[kf].copy(), self.kf_t[kf].copy()
            if anchor is not None and self.kf_uid[anchor] >= 0:
                R_p, t_p = self.kf_R[anchor], self.kf_t[anchor]
                R_cp = (R_c @ R_p.T).astype(np.float32)
                t_cp = (t_c - R_cp @ t_p).astype(np.float32)
                self.kf_tombstone[uid] = (int(self.kf_uid[anchor]),
                                          R_cp, t_cp, R_c, t_c)
            else:
                self.kf_tombstone[uid] = (-1, None, None, R_c, t_c)
            self.uid_slot.pop(uid, None)
            self.kf_uid[kf] = -1
        self.kf_mask[kf] = False
        sel = (self.obs_kf[: self._obs_top] == kf) & self.obs_mask[: self._obs_top]
        pts = self.obs_pt[: self._obs_top][sel]
        self.obs_mask[: self._obs_top][sel] = False
        np.add.at(self.pt_n_obs, pts, -1)
        self.kf_kp_pt[kf] = -1
        # line observations of the removed KF go with it (reference:
        # KeyFrame::SetBadFlag erases line observations too)
        lsel = (self.lobs_kf[: self._lobs_top] == kf) \
            & self.lobs_mask[: self._lobs_top]
        lns = self.lobs_line[: self._lobs_top][lsel]
        self.lobs_mask[: self._lobs_top][lsel] = False
        np.add.at(self.ln_n_obs, lns, -1)
        self.kf_kl_line[kf] = -1

    def replace_line(self, loser: int, winner: int):
        """Merge line landmark ``loser`` into ``winner`` (reference:
        MapLine::Replace — mirrors MapPoint::Replace)."""
        if loser == winner:
            return
        top = self._lobs_top
        lrows = np.nonzero((self.lobs_line[:top] == loser)
                           & self.lobs_mask[:top])[0]
        wkfs = set(self.lobs_kf[:top][(self.lobs_line[:top] == winner)
                                      & self.lobs_mask[:top]].tolist())
        for r in lrows:
            kf, kl = self.lobs_kf[r], self.lobs_kl[r]
            if int(kf) in wkfs:
                self.lobs_mask[r] = False
                self.kf_kl_line[kf, kl] = -1
            else:
                self.lobs_line[r] = winner
                self.kf_kl_line[kf, kl] = winner
                self.ln_n_obs[winner] += 1
                wkfs.add(int(kf))
        self.ln_mask[loser] = False
        self.ln_n_obs[loser] = 0
        self.ln_visible[winner] += self.ln_visible[loser]
        self.ln_found[winner] += self.ln_found[loser]
        self.version += 1

    # -- derived structures -------------------------------------------------

    def live_obs(self):
        m = self.obs_mask[: self._obs_top]
        return (
            self.obs_kf[: self._obs_top][m],
            self.obs_pt[: self._obs_top][m],
            self.obs_kp[: self._obs_top][m],
        )

    def covisibility(self, kf: int, min_weight: int = 15):
        """KF ids sharing >= min_weight map points with ``kf``, sorted by
        weight desc (reference: KeyFrame::GetBestCovisibilityKeyFrames).

        Uses the native C++ covisibility engine (plvs_tpu.native) when
        available — this runs on the host concurrently with device compute —
        with an equivalent numpy fallback."""
        from .. import native
        if native.available():
            m = self.obs_mask[: self._obs_top]
            counts = native.covis_counts(
                self.obs_kf[: self._obs_top], self.obs_pt[: self._obs_top],
                m, kf, self.max_kf, self.max_pts).astype(np.int64)
        else:
            okf, opt, _ = self.live_obs()
            my_pts = opt[okf == kf]
            if len(my_pts) == 0:
                return np.zeros((0,), np.int64), np.zeros((0,), np.int64)
            sel = np.isin(opt, my_pts) & (okf != kf)
            counts = np.bincount(okf[sel], minlength=self.max_kf)
        ids = np.nonzero(counts >= min_weight)[0]
        order = np.argsort(-counts[ids], kind="stable")
        ids = ids[order]
        return ids, counts[ids]

    def points_in_kfs(self, kf_ids: np.ndarray) -> np.ndarray:
        okf, opt, _ = self.live_obs()
        sel = np.isin(okf, kf_ids)
        return np.unique(opt[sel])

    def covis_graph_full(self, min_weight: int = 15):
        """The FULL weighted covisibility graph in ONE pass: COO edges
        (i, j, w) with i < j over raw keyframe ids (reference: the
        per-KeyFrame mConnectedKeyFrameWeights maps, rebuilt here as a
        single scan of the observation table instead of K separate
        KeyFrame::UpdateConnections passes). Native engine when available;
        dense indicator-matmul fallback otherwise."""
        from .. import native
        if native.available():
            m = self.obs_mask[: self._obs_top]
            return native.covis_graph(
                self.obs_kf[: self._obs_top], self.obs_pt[: self._obs_top],
                m, self.max_kf, self.max_pts, min_weight=min_weight)
        okf, opt, _ = self.live_obs()
        live = np.nonzero(self.kf_mask)[0]
        if len(live) == 0 or len(okf) == 0:
            z = np.zeros((0,), np.int32)
            return z, z, z
        loc = np.full(self.max_kf, -1, np.int64)
        loc[live] = np.arange(len(live))
        upt, pinv = np.unique(opt, return_inverse=True)
        ok = loc[okf] >= 0
        # sparse indicator product: a dense [P, K] matrix is O(P*K) memory
        # and O(P*K^2) time under the store lock on large maps; the K x K
        # co-observation count is all that is ever needed
        from scipy.sparse import coo_matrix

        A = coo_matrix(
            (np.ones(int(ok.sum()), np.int64),
             (pinv[ok], loc[okf[ok]])),
            shape=(len(upt), len(live)),
        ).tocsr()
        W = np.asarray((A.T @ A).todense(), np.int64)
        np.fill_diagonal(W, 0)
        ii, jj = np.nonzero(np.triu(W) >= min_weight)
        return (live[ii].astype(np.int32), live[jj].astype(np.int32),
                W[ii, jj].astype(np.int32))

    def rescale_map(self, s: float, map_id: int | None = None):
        """Multiply the metric scale of one map by ``s``: keyframe
        translations, point landmarks and line endpoints (world positions
        scale; rotations are scale-free). Reference: the monocular-inertial
        map rescale in LocalMapping::InitializeIMU / ScaleRefinement
        (src/LocalMapping.cc:2164-2300, 2512-2544)."""
        with self.lock:
            if map_id is None:
                map_id = self.active_map
            kfs = self.kfs_of_map(map_id)
            self.kf_t[kfs] = (self.kf_t[kfs] * s).astype(np.float32)
            pts = np.nonzero(self.pt_mask)[0]
            pts = pts[self.kf_map[self.pt_ref_kf[pts]] == map_id]
            self.pt_xyz[pts] = (self.pt_xyz[pts] * s).astype(np.float32)
            self.pt_min_dist[pts] *= s
            self.pt_max_dist[pts] *= s
            lns = np.nonzero(self.ln_mask)[0]
            lns = lns[self.kf_map[self.ln_ref_kf[lns]] == map_id]
            self.ln_Xs[lns] = (self.ln_Xs[lns] * s).astype(np.float32)
            self.ln_Xe[lns] = (self.ln_Xe[lns] * s).astype(np.float32)
            self.version += 1

    # -- landmark maintenance ------------------------------------------------

    def update_point_maintenance(self, pt_ids: np.ndarray,
                                 scale: float = 1.2, n_levels: int = 8,
                                 max_obs: int = 12):
        """Distinctive-descriptor recompute + normal/scale-range update for
        the given landmarks (dispatch + immediate await; see
        dispatch_point_maintenance for the split used by the KF backend to
        share one device round trip with the local-BA fetch)."""
        ctx = self.dispatch_point_maintenance(pt_ids, scale, n_levels,
                                              max_obs)
        if ctx is None:
            return
        import jax as _jax

        self.apply_point_maintenance(ctx, _jax.device_get(ctx["out"]))

    def apply_point_maintenance(self, ctx, fetched):
        """Store the voted distinctive descriptors (host half)."""
        P = ctx["P"]
        uniq = ctx["uniq"]
        best = np.asarray(fetched)[:P]
        self.pt_desc[uniq] = ctx["desc"][np.arange(P), best]
        self.pt_angle[uniq] = ctx["angs"][np.arange(P), best]
        self.version += 1  # descriptors changed after the dispatch-half bump

    def dispatch_point_maintenance(self, pt_ids: np.ndarray,
                                   scale: float = 1.2, n_levels: int = 8,
                                   max_obs: int = 12):
        """Distinctive-descriptor recompute + normal/scale-range update for
        the given landmarks.

        Reference: MapPoint::ComputeDistinctiveDescriptors picks the
        observation descriptor with minimum median Hamming distance to the
        others, and MapPoint::UpdateNormalAndDepth sets the mean viewing
        direction and the scale-invariance distance range from the reference
        keyframe's observation octave (src/MapPoint.cc). Here both run as
        ONE batched pass over every requested landmark: observations are
        padded to ``max_obs`` slots, the median-Hamming vote is a [P, M, M]
        popcount reduction on the device. The cheap normal/scale updates
        apply immediately (numpy); the descriptor vote is returned as an
        in-flight ctx so the caller can batch its await with other device
        work (each await over the remote link costs a flat ~25 ms).
        """
        import jax.numpy as jnp
        from ..features.matching import hamming_pairs  # noqa: F401

        pt_ids = np.asarray(pt_ids)
        pt_ids = pt_ids[self.pt_mask[pt_ids]]
        if len(pt_ids) == 0:
            return None
        okf, opt, okp = self.live_obs()
        sel = np.isin(opt, pt_ids)
        o_kf, o_pt, o_kp = okf[sel], opt[sel], okp[sel]
        if len(o_pt) == 0:
            return None
        order = np.argsort(o_pt, kind="stable")
        o_kf, o_pt, o_kp = o_kf[order], o_pt[order], o_kp[order]
        uniq, start, counts = np.unique(o_pt, return_index=True,
                                        return_counts=True)
        slot = np.arange(len(o_pt)) - np.repeat(start, counts)
        keep = slot < max_obs
        P = len(uniq)
        row = np.searchsorted(uniq, o_pt)

        # --- normal & scale range (numpy; cheap) --------------------------
        Cw_all = -np.einsum("kji,kj->ki", self.kf_R[o_kf], self.kf_t[o_kf])
        dirs = self.pt_xyz[o_pt] - Cw_all
        dn = np.linalg.norm(dirs, axis=-1, keepdims=True)
        dirs = dirs / np.maximum(dn, 1e-9)
        nsum = np.zeros((P, 3), np.float32)
        np.add.at(nsum, row, dirs.astype(np.float32))
        nn = np.linalg.norm(nsum, axis=-1, keepdims=True)
        self.pt_normal[uniq] = nsum / np.maximum(nn, 1e-9)

        ref = self.pt_ref_kf[uniq]
        is_ref = o_kf == ref[row]
        # distance and octave at the reference observation (fallback: first)
        dist_ref = np.zeros((P,), np.float32)
        octv_ref = np.zeros((P,), np.int32)
        dist_ref[row[is_ref]] = dn[is_ref, 0]
        octv_ref[row[is_ref]] = self.kf_kp_octave[o_kf[is_ref], o_kp[is_ref]]
        no_ref = dist_ref == 0
        first = start  # first observation row per point
        dist_ref[no_ref] = dn[first, 0][no_ref]
        octv_ref[no_ref] = self.kf_kp_octave[o_kf[first], o_kp[first]][no_ref]
        max_d = dist_ref * (scale ** octv_ref)
        self.pt_max_dist[uniq] = max_d
        self.pt_min_dist[uniq] = max_d / (scale ** (n_levels - 1))
        self.version += 1

        # --- distinctive descriptor (device; batched median Hamming) ------
        desc = np.zeros((P, max_obs, 8), np.uint32)
        dmask = np.zeros((P, max_obs), bool)
        angs = np.zeros((P, max_obs), np.float32)
        desc[row[keep], slot[keep]] = self.kf_kp_desc[o_kf[keep], o_kp[keep]]
        angs[row[keep], slot[keep]] = self.kf_kp_angle[o_kf[keep], o_kp[keep]]
        dmask[row[keep], slot[keep]] = True

        Pb = 256
        while Pb < P:
            Pb *= 2
        desc_p = np.zeros((Pb, max_obs, 8), np.uint32)
        mask_p = np.zeros((Pb, max_obs), bool)
        desc_p[:P] = desc
        mask_p[:P] = dmask
        out = _distinctive_rows(jnp.asarray(desc_p), jnp.asarray(mask_p))
        return {"out": out, "P": P, "uniq": uniq, "desc": desc,
                "angs": angs}

    @property
    def num_keyframes(self):
        return int(self.kf_mask.sum())

    @property
    def num_points(self):
        return int(self.pt_mask.sum())
