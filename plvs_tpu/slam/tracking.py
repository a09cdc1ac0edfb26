"""Tracking front end: motion-model / local-map tracking + keyframe policy.

TPU-native re-derivation of the reference's Tracking thread
(reference: src/Tracking.cc — Track() at :2097, TrackWithMotionModel
:2282, TrackLocalMap :3761, NeedNewKeyFrame :3938). Device work (guided
matching + pose optimization) is jitted with fixed capacities; the state
machine and map bookkeeping live on the host in plain Python/numpy.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..features import matching, orb
from ..geometry import cameras as cam_mod
from ..geometry import lie
from ..solvers import pose_opt
from . import frame as frame_mod
from .map_store import MapStore

NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
OK = 2
LOST = 3


@functools.partial(jax.jit, static_argnames=("cam",))
def _match_and_optimize(
    cam,
    R_pred,
    t_pred,
    pts_xyz,      # [M, 3] candidate map points (padded)
    pts_desc,     # [M, 8]
    pts_octave,   # [M]
    pts_valid,    # [M]
    kp_xy, kp_desc, kp_octave, kp_mask, kp_uvr, kp_inv_sigma2,
    radius: float,
    scale: float = 1.2,
):
    """Project candidates into predicted pose, guided-match, pose-optimize.

    Returns (R, t, match_idx [M] (-1=none), n_inliers, kp_inlier [N]).
    """
    uv, z, vis = frame_mod.project_points(cam, R_pred, t_pred, pts_xyz)
    r = radius * (scale ** pts_octave.astype(jnp.float32))
    idx, dist = matching.search_by_projection(
        uv, vis & pts_valid, pts_desc, pts_octave,
        kp_xy, kp_desc, kp_octave, kp_mask,
        radius=r,
    )
    matched = idx >= 0
    # per-keypoint association: scatter map-point row index into keypoint
    # slots; unmatched rows target index n_kp, dropped by mode="drop"
    # (note: -1 would WRAP in jax indexing, so it must be mapped out of range)
    n_kp = kp_xy.shape[0]
    kp_pt = jnp.full((n_kp,), -1, jnp.int32)
    src = jnp.arange(idx.shape[0], dtype=jnp.int32)
    tgt = jnp.where(matched, idx, n_kp)
    kp_pt = kp_pt.at[tgt].set(src, mode="drop")

    obs_mask = kp_pt >= 0
    Xw = pts_xyz[jnp.clip(kp_pt, 0, pts_xyz.shape[0] - 1)]
    obs = pose_opt.make_pose_obs(
        Xw, kp_uvr, kp_inv_sigma2, obs_mask & kp_mask
    )
    R, t, inl, _, n_inl = pose_opt.pose_optimize(cam, R_pred, t_pred, obs)
    return R, t, idx, n_inl, inl & obs_mask, kp_pt


@dataclasses.dataclass
class TrackResult:
    state: int
    R: np.ndarray
    t: np.ndarray
    n_inliers: int
    kp_pt_id: np.ndarray  # [N] global map-point id per keypoint (-1 none)
    is_keyframe: bool = False
    kf_id: int = -1


class Tracker:
    """Host-side tracking state machine (RGB-D / stereo-from-depth v1)."""

    def __init__(self, cam: cam_mod.Camera, store: MapStore,
                 num_features: int = 1024, local_pts_cap: int = 4096,
                 min_kf_inliers: int = 30, kf_ratio: float = 0.75,
                 max_kf_interval: int = 10, max_depth_factor: float = 40.0):
        self.cam = cam
        self.store = store
        self.num_features = num_features
        self.local_pts_cap = local_pts_cap
        self.min_kf_inliers = min_kf_inliers
        self.kf_ratio = kf_ratio
        self.max_kf_interval = max_kf_interval
        # reference: ThDepth * baseline gate for close/far points
        self.max_depth = max_depth_factor * (cam.bf / float(cam.params[0]))
        self.state = NO_IMAGES_YET
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)  # motion model: T_curr_last
        self.vel_t = np.zeros(3, np.float32)
        self.last_frame = None
        self.last_kp_pt_id = None
        self.ref_kf = -1
        self.ref_kf_npts = 0
        self.frames_since_kf = 0
        self.frame_id = 0

    # ------------------------------------------------------------------
    def process_frame(self, fr: frame_mod.Frame, timestamp: float) -> TrackResult:
        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            res = self._initialize(fr, timestamp)
        else:
            res = self._track(fr, timestamp)
        self.last_frame = fr
        self.frame_id += 1
        return res

    # ------------------------------------------------------------------
    def _initialize(self, fr: frame_mod.Frame, timestamp: float) -> TrackResult:
        """RGB-D initialization: first frame with enough depth points becomes
        the map origin (reference: Tracking::StereoInitialization,
        src/Tracking.cc:2231, needs >= 500 features)."""
        n_depth = int(np.asarray((fr.depth > 0).sum()))
        if n_depth < 300:
            return TrackResult(self.state, self.R, self.t, 0, np.full((fr.kp.xy.shape[0],), -1))
        self.R = np.eye(3, dtype=np.float32)
        self.t = np.zeros(3, np.float32)
        kf_id, pt_ids = self._create_keyframe(fr, timestamp, np.full((fr.kp.xy.shape[0],), -1))
        self.state = OK
        self.ref_kf = kf_id
        self.ref_kf_npts = -1  # baselined on the first tracked frame
        self.frames_since_kf = 0
        kp_pt = np.asarray(self.store.kf_kp_pt[kf_id]).copy()
        self.last_kp_pt_id = kp_pt
        return TrackResult(self.state, self.R, self.t, len(pt_ids), kp_pt, True, kf_id)

    # ------------------------------------------------------------------
    def _track(self, fr: frame_mod.Frame, timestamp: float) -> TrackResult:
        st = self.store
        # motion-model pose prediction (reference: mVelocity * mLastFrame.mTcw)
        R_pred = self.vel_R @ self.R
        t_pred = self.vel_R @ self.t + self.vel_t

        # --- step 1: track last frame's map points by projection ----------
        last_ids = self.last_kp_pt_id
        cand = np.unique(last_ids[last_ids >= 0])
        R1, t1, n1, kp_pt1 = self._match_step(fr, R_pred, t_pred, cand, radius=15.0)

        if n1 < 20:
            # wider search fallback (reference doubles the window)
            R1, t1, n1, kp_pt1 = self._match_step(fr, R_pred, t_pred, cand, radius=30.0)

        # --- step 2: track local map --------------------------------------
        local_pts = self._local_points()
        R2, t2, n2, kp_pt2 = self._match_step(fr, R1, t1, local_pts, radius=4.0)
        if n2 < 10:
            self.state = LOST
            return TrackResult(self.state, self.R, self.t, int(n2), kp_pt2)

        # motion model update
        R_last, t_last = self.R, self.t
        self.R, self.t = R2, t2
        Rl_inv, tl_inv = np.asarray(R_last).T, -np.asarray(R_last).T @ t_last
        self.vel_R = (R2 @ Rl_inv).astype(np.float32)
        self.vel_t = (R2 @ tl_inv + t2).astype(np.float32)

        # update visibility counters (reference: IncreaseVisible/Found)
        seen = np.unique(kp_pt2[kp_pt2 >= 0])
        st.pt_found[seen] += 1
        vis_ids = local_pts
        st.pt_visible[vis_ids] += 1

        self.frames_since_kf += 1
        self.last_kp_pt_id = kp_pt2

        # reference tracked count = inliers on the first frame after the KF
        # (a newly created KF's own association count includes brand-new
        # points and would make the ratio test fire every frame)
        if self.ref_kf_npts < 0:
            self.ref_kf_npts = int(n2)

        # --- keyframe decision --------------------------------------------
        need_kf = (
            n2 < self.kf_ratio * max(self.ref_kf_npts, 1)
            or self.frames_since_kf >= self.max_kf_interval
        ) and n2 >= self.min_kf_inliers
        kf_id = -1
        if need_kf:
            kf_id, pt_ids = self._create_keyframe(fr, timestamp, kp_pt2)
            self.ref_kf = kf_id
            self.ref_kf_npts = -1  # re-baselined on the next tracked frame
            self.frames_since_kf = 0
            self.last_kp_pt_id = np.asarray(self.store.kf_kp_pt[kf_id]).copy()

        self.state = OK
        return TrackResult(self.state, self.R, self.t, int(n2), kp_pt2, need_kf, kf_id)

    # ------------------------------------------------------------------
    def _match_step(self, fr, R_pred, t_pred, cand_ids: np.ndarray, radius: float):
        st = self.store
        cap = self.local_pts_cap
        m = len(cand_ids)
        if m == 0:
            return (np.asarray(R_pred), np.asarray(t_pred), 0,
                    np.full((fr.kp.xy.shape[0],), -1, np.int64))
        if m > cap:
            cand_ids = cand_ids[:cap]
            m = cap
        xyz = np.zeros((cap, 3), np.float32)
        desc = np.zeros((cap, 8), np.uint32)
        octv = np.zeros((cap,), np.int32)
        valid = np.zeros((cap,), bool)
        xyz[:m] = st.pt_xyz[cand_ids]
        desc[:m] = st.pt_desc[cand_ids]
        valid[:m] = st.pt_mask[cand_ids]

        R, t, idx, n_inl, kp_inl, kp_pt_local = _match_and_optimize(
            self.cam, jnp.asarray(R_pred), jnp.asarray(t_pred),
            jnp.asarray(xyz), jnp.asarray(desc), jnp.asarray(octv), jnp.asarray(valid),
            fr.kp.xy, fr.kp.desc, fr.kp.octave, fr.kp.mask, fr.uvr, fr.inv_sigma2,
            radius,
        )
        kp_pt_local = np.asarray(kp_pt_local)
        kp_inl = np.asarray(kp_inl)
        kp_pt_id = np.full((fr.kp.xy.shape[0],), -1, np.int64)
        ok = (kp_pt_local >= 0) & (kp_pt_local < m) & kp_inl
        kp_pt_id[ok] = cand_ids[kp_pt_local[ok]]
        return np.asarray(R), np.asarray(t), int(n_inl), kp_pt_id

    # ------------------------------------------------------------------
    def _local_points(self) -> np.ndarray:
        """Map points of the covisible neighbourhood of the reference KF
        (reference: Tracking::UpdateLocalKeyFrames/UpdateLocalPoints)."""
        st = self.store
        if self.ref_kf < 0:
            return np.zeros((0,), np.int64)
        covis, _ = st.covisibility(self.ref_kf, min_weight=5)
        window = np.concatenate([[self.ref_kf], covis[:10]])
        pts = st.points_in_kfs(window)
        return pts[st.pt_mask[pts]]

    # ------------------------------------------------------------------
    def _create_keyframe(self, fr: frame_mod.Frame, timestamp: float,
                         kp_pt_id: np.ndarray):
        """Snapshot the frame as a keyframe; create new map points from depth
        for unmatched keypoints (reference: Tracking::CreateNewKeyFrame
        close-point creation, src/Tracking.cc:4182)."""
        st = self.store
        kf = st.alloc_kf()
        N = fr.kp.xy.shape[0]
        st.kf_R[kf] = self.R
        st.kf_t[kf] = self.t
        st.kf_mask[kf] = True
        st.kf_timestamp[kf] = timestamp
        st.kf_frame_id[kf] = self.frame_id
        st.kf_kp_xy[kf] = np.asarray(fr.kp.xy)
        st.kf_kp_uvr[kf] = np.asarray(fr.uvr)
        st.kf_kp_desc[kf] = np.asarray(fr.kp.desc)
        st.kf_kp_octave[kf] = np.asarray(fr.kp.octave)
        st.kf_kp_angle[kf] = np.asarray(fr.kp.angle)
        st.kf_kp_mask[kf] = np.asarray(fr.kp.mask)
        st.kf_kp_pt[kf] = -1

        # existing associations
        exist = np.nonzero(kp_pt_id >= 0)[0]
        if len(exist):
            st.add_observations(kf, kp_pt_id[exist], exist)

        # new map points from valid-depth unmatched keypoints
        depth = np.asarray(fr.depth)
        mask = np.asarray(fr.kp.mask)
        new_sel = np.nonzero(
            (kp_pt_id < 0) & mask & (depth > 0) & (depth < self.max_depth)
        )[0]
        pt_ids = np.zeros((0,), np.int64)
        if len(new_sel):
            Rwc = self.R.T
            twc = -Rwc @ self.t
            xyz_cam = np.asarray(fr.xyz_cam)[new_sel]
            xyz_w = xyz_cam @ Rwc.T + twc
            pt_ids = st.alloc_pts(len(new_sel))
            st.pt_xyz[pt_ids] = xyz_w
            st.pt_desc[pt_ids] = np.asarray(fr.kp.desc)[new_sel]
            st.pt_mask[pt_ids] = True
            st.pt_ref_kf[pt_ids] = kf
            st.pt_first_kf[pt_ids] = kf
            st.pt_n_obs[pt_ids] = 0
            st.pt_visible[pt_ids] = 1
            st.pt_found[pt_ids] = 1
            dirs = xyz_w - twc
            st.pt_normal[pt_ids] = dirs / (np.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-9)
            st.add_observations(kf, pt_ids, new_sel)
        return kf, pt_ids
