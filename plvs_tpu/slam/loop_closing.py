"""Loop closing: BoW place recognition + geometric verification + essential
graph correction.

TPU-native re-derivation of the reference's LoopClosing thread
(reference: src/LoopClosing.cc — NewDetectCommonRegions :377-459 (BoW
candidates, Sim3/SE3 RANSAC verification), CorrectLoop :1260 (correction
propagation over the covisible group, essential-graph optimization
:1631-1637)). Detection scoring is one dense BoW matvec over all keyframes;
verification is the batched Sim3 RANSAC; correction is the PCG pose-graph
solver. Runs synchronously per keyframe in v1 (the async actor pipeline is
the parallel-runtime milestone).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..features import matching
from ..geometry import lie
from ..solvers import pose_graph, sim3_solver
from ..vocab import bow
from .keyframe_database import KeyFrameDatabase
from .map_store import MapStore


def _pad_sim3(X1, X2, n: int, lo: int = 256):
    """Bucket-pad sim3_ransac inputs: an exact-length RANSAC program would
    compile once per distinct correspondence count (multi-second stalls
    inside loop verification through the tunnel backend). Returns
    (X1b, X2b, maskb) with padded rows masked out."""
    from .local_mapping import _bucket

    nb = _bucket(n, lo)
    m = np.zeros((nb,), bool)
    m[:n] = True
    if nb > n:
        X1 = np.concatenate([np.asarray(X1, np.float32),
                             np.zeros((nb - n, 3), np.float32)])
        X2 = np.concatenate([np.asarray(X2, np.float32),
                             np.zeros((nb - n, 3), np.float32)])
    return jnp.asarray(X1), jnp.asarray(X2), jnp.asarray(m)


@dataclasses.dataclass
class LoopCloser:
    store: MapStore
    kfdb: KeyFrameDatabase | None = None
    # camera model for the Sim3-guided PROJECTION expansion (reference:
    # SearchByProjection with the estimated Sim3); None falls back to the
    # 3D-proximity expansion
    cam: object | None = None
    min_score_ratio: float = 0.75
    # final acceptance support (reference: the Sim3 stage accepts at >= 20
    # inliers, src/LoopClosing.cc — the consecutive-coincidence streak is
    # the false-positive guard, not this count)
    min_inliers: int = 20
    min_kf_gap: int = 10          # don't close against recent KFs
    fix_scale: bool = True        # RGB-D / stereo
    # consecutive-coincidence gate (reference: NewDetectCommonRegions
    # requires mnLoopNumCoincidences successive keyframes confirming the
    # same region, src/LoopClosing.cc:377-459). Each detection here is a
    # full 3D-3D RANSAC with >= min_inliers; requiring 2 consecutive
    # agreeing detections adds the reference's multi-keyframe confirmation
    # against repeated-texture false positives.
    required_coincidences: int = 2
    # a detection whose EXPANDED support reaches this many inliers closes
    # after ONE confirming coincidence even if required_coincidences is
    # configured higher (the guided-projection stage already verified the
    # whole local map agrees; the reference similarly shortcuts on
    # overwhelming support in DetectCommonRegionsFromBoW)
    strong_inliers: int = 60
    # detection backoff after a successful closure: the corrected map
    # keeps matching the just-welded region for the next several
    # keyframes, and re-closing it repeatedly re-runs the pose graph +
    # global BA + dense rebuild for no information gain (measured: 4
    # closures of the same room loop, each stalling the tracker).
    # Reference: LoopClosing only considers keyframes sufficiently past
    # mLastLoopKFid (src/LoopClosing.cc, mnLoopNumCoincidences reset +
    # the CurrentKF id guard).
    closure_backoff_kfs: int = 10
    # drift-consistency tolerances for counting a later keyframe as a
    # coincidence of a pending detection (reference:
    # DetectAndReffineSim3FromLastKF re-verifies from the predicted Sim3)
    coincidence_rot_tol: float = 0.17   # rad (~10 deg)
    coincidence_trans_tol: float = 0.5  # meters
    # PLAUSIBILITY gate on the implied world drift of a verified loop
    # within ONE map: odometry drift of a continuously tracked map is small
    # — a verification implying a near-180-degree rotation is structural
    # aliasing (observed: self-similar panel corners on opposite walls fit
    # 25 RANSAC inliers), not a loop. Cross-map merges are exempt (a lost
    # + re-initialized map really can be arbitrarily misaligned).
    # 1.3 rad: measured separation on the room-orbit diagnostics — genuine
    # return-leg loops under the deferred pipeline imply ~1.0 rad of
    # accumulated heading drift (and closed fine), while structural-alias
    # verifications measure 1.6-3.0 rad with 4-7 m translation; 0.6 rad
    # rejected the TRUE loops of any run whose odometry drifted more than
    # the sync path's. (The reference has no drift gate at all — its guard
    # is the coincidence streak, which we also require.)
    max_drift_rot: float = 1.3    # rad (~75 deg)
    max_drift_trans: float = 2.0  # meters
    # world gravity vector once the IMU is initialized: switches the
    # essential-graph correction to the 4-DoF (yaw+translation) form so the
    # loop cannot bend the gravity-observable roll/pitch (reference:
    # OptimizeEssentialGraph4DoF dispatched for inertial maps,
    # src/LoopClosing.cc:1631-1637)
    gravity_w: np.ndarray | None = None
    # planar objects corrected with the map at loop closure (reference:
    # SearchAndFuse also updates MapObjects, src/LoopClosing.cc:1584)
    object_store: object | None = None
    stopwatch: object | None = None  # optional fine-grained stage timing
    # device mesh (SystemConfig.sharded_backend): the essential-graph solve
    # runs edge-sharded over it (plvs_tpu.parallel.sharded_pose_graph);
    # the 4-DoF inertial form stays single-device (no dof4 support there)
    mesh: object | None = None

    def _scope(self, name: str):
        if self.stopwatch is None:
            import contextlib

            return contextlib.nullcontext()
        return self.stopwatch.scope(name)

    def __post_init__(self):
        if self.kfdb is None:
            self.kfdb = KeyFrameDatabase(self.store)
        self.last_loop_kf = -1
        self._kfs_since_loop = 10 ** 9  # no closure yet: detection free
        self._ransac_key = jax.random.PRNGKey(0)
        # pending detection awaiting consecutive confirmations:
        # dict(cand, kf, count, G_R, G_t) where (G_R, G_t) is the implied
        # world-drift transform of the active map
        self._pending = None
        # optional diagnostics: when not None, process_keyframe appends one
        # dict per call (candidates, verification outcome, streak state) —
        # the bench loop scenario prints it to explain a silent 0-loop run
        self.trace: list | None = None

    def _trace(self, kf_id: int, **kw):
        if self.trace is not None:
            self.trace.append({"kf": int(kf_id), **kw})

    # ------------------------------------------------------------------
    def _drift_transform(self, kf_id: int, cand: int, R_rel, t_rel):
        """World-to-world drift G implied by a verified camera-frame
        relation X_cand_cam = R_rel X_kf_cam + t_rel: G maps the active
        (drifted) world into the candidate's world."""
        st = self.store
        Rc, tc = st.kf_R[cand], st.kf_t[cand]
        Rk, tk = st.kf_R[kf_id], st.kf_t[kf_id]
        G_R = (Rc.T @ R_rel @ Rk).astype(np.float32)
        G_t = (Rc.T @ (R_rel @ tk + t_rel - tc)).astype(np.float32)
        return G_R, G_t

    # ------------------------------------------------------------------
    def process_keyframe(self, kf_id: int, bow_fut=None) -> dict | None:
        """Detect + verify + (after enough consecutive coincidences)
        correct. Returns loop info dict if closed. ``bow_fut``: the
        keyframe's vocabulary descent pre-dispatched at backend entry (its
        await rides the local mapper's batched await)."""
        st = self.store
        with self._scope("lc.bow_add"):
            if not self.kfdb.add(kf_id, words_fut=bow_fut):
                return None
        # post-closure backoff: index the keyframe (above) but skip
        # detection — the region just welded keeps matching for several
        # keyframes and re-closing it repeats the whole correction
        self._kfs_since_loop += 1
        if self._kfs_since_loop <= self.closure_backoff_kfs:
            self._trace(kf_id, stage="backoff",
                        since=int(self._kfs_since_loop))
            return None

        with self._scope("lc.detect"):
            cands = self._detect(kf_id)
        # a PENDING hypothesis is re-verified first, whether or not the
        # database ranked its region this time (reference:
        # DetectAndReffineSim3FromLastKF re-checks the pending Sim3 before
        # fresh BoW candidates, src/LoopClosing.cc:377-459)
        if self._pending is not None:
            pc = int(self._pending["cand"])
            cands = [pc] + [c for c in cands if c != pc]
        if not cands:
            self._trace(kf_id, stage="detect", n_cands=0)
            self._pending_miss()
            return None
        # verify candidates in order, keeping the first that passes
        # geometric verification (reference: DetectNBestCandidates feeds
        # each candidate through Sim3 RANSAC until one sticks)
        ok = False
        with self._scope("lc.verify"):
            for cand in cands:
                ok, R_rel, t_rel, n_inl, pairs = self._verify(kf_id, cand)
                if ok:
                    break
        if not ok:
            self._trace(kf_id, stage="verify_fail", cands=list(map(int, cands)),
                        last_inl=int(n_inl))
            self._pending_miss()
            return None
        G_R, G_t = self._drift_transform(kf_id, cand, R_rel, t_rel)
        if st.kf_map[cand] == st.kf_map[kf_id]:
            ang = float(np.arccos(np.clip((np.trace(G_R) - 1) / 2,
                                          -1.0, 1.0)))
            if (ang > self.max_drift_rot
                    or np.linalg.norm(G_t) > self.max_drift_trans):
                self._trace(kf_id, stage="drift_gate", cand=int(cand),
                            inl=int(n_inl), ang=round(ang, 3),
                            trans=round(float(np.linalg.norm(G_t)), 3))
                self._pending_miss()
                return None

        pend = self._pending
        if pend is not None and self._consistent(pend, cand, G_R, G_t):
            count = pend["count"] + 1
        else:
            count = 1
        self._pending = dict(cand=cand, kf=kf_id, count=count,
                             G_R=G_R, G_t=G_t)
        # strong expanded support shortcuts a LONG streak requirement but
        # never closes on a single detection: one confirming coincidence is
        # always required (a single aliased 60-inlier match on repeated
        # texture inside the drift envelope must not close immediately)
        strong = int(n_inl) >= self.strong_inliers and count >= 2
        self._trace(kf_id, stage="coincidence", cand=int(cand),
                    inl=int(n_inl), count=count, strong=strong)
        if count < self.required_coincidences and not strong:
            return None
        self._pending = None

        if st.kf_map[cand] != st.kf_map[kf_id]:
            # place recognised in another atlas map -> weld the active
            # map into it (reference: MergeLocal, src/LoopClosing.cc:1684-)
            with st.lock:
                info = self._merge(kf_id, cand, R_rel, t_rel, pairs)
        else:
            # lock-light correction: the pose-graph solve runs OUTSIDE the
            # store lock (tracking keeps dispatching frames meanwhile); only
            # the snapshot and the final pose/landmark swap hold it
            # (reference: Tracking continues during CorrectLoop; the
            # reference stops LocalMapping, not the tracker,
            # src/LoopClosing.cc:1268)
            info = self._correct(kf_id, cand, R_rel, t_rel, pairs)
        info.update({"candidate": int(cand), "inliers": int(n_inl)})
        self.last_loop_kf = kf_id
        self._kfs_since_loop = 0
        return info

    # ------------------------------------------------------------------
    def _pending_miss(self):
        """A keyframe failed to re-confirm the pending region: tolerate ONE
        miss before resetting the coincidence streak (our keyframes are
        sparser than the reference's, so a revisit overlap can skip a KF;
        the reference resets immediately but confirms at full KF density,
        src/LoopClosing.cc:377-459)."""
        if self._pending is None:
            return
        self._pending["misses"] = self._pending.get("misses", 0) + 1
        if self._pending["misses"] > 1:
            self._pending = None

    # ------------------------------------------------------------------
    def _consistent(self, pend: dict, cand: int, G_R, G_t) -> bool:
        """A new detection extends a pending one if it names the same
        region (the candidate is the pending candidate or covisible with
        it) and implies the same world drift."""
        st = self.store
        if cand != pend["cand"]:
            covis, _ = st.covisibility(int(pend["cand"]), min_weight=5)
            if cand not in set(covis.tolist()):
                return False
        dR = pend["G_R"].T @ G_R
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1.0, 1.0))
        dt = np.linalg.norm(G_t - pend["G_t"])
        return bool(ang < self.coincidence_rot_tol
                    and dt < self.coincidence_trans_tol)

    # ------------------------------------------------------------------
    def _merge(self, kf_id: int, cand: int, R_rel, t_rel, pairs) -> dict:
        """Weld kf_id's map into cand's map (reference: LoopClosing::
        MergeLocal — Sim3 welding transform, duplicate-landmark fusion).

        The verified relation is X_cand_cam = R_rel X_kf_cam + t_rel, so the
        world-to-world weld G (kf-map world -> cand-map world) is
        T_cand^-1 ∘ (R_rel, t_rel) ∘ T_kf.
        """
        st = self.store
        src_map = int(st.kf_map[kf_id])
        dst_map = int(st.kf_map[cand])
        Rc, tc = st.kf_R[cand], st.kf_t[cand]
        Rk, tk = st.kf_R[kf_id], st.kf_t[kf_id]
        G_R = (Rc.T @ R_rel @ Rk).astype(np.float32)
        G_t = (Rc.T @ (R_rel @ tk + t_rel - tc)).astype(np.float32)
        st.merge_map_into(src_map, dst_map, G_R, G_t)
        # fuse the verified duplicate landmarks: keep the matched (older)
        # map's point (reference: SearchAndFuse during merge)
        n_fused = 0
        for p_src, p_dst in pairs:
            if st.pt_mask[p_src] and st.pt_mask[p_dst] and p_src != p_dst:
                st.replace_point(int(p_src), int(p_dst))
                n_fused += 1
        return {"merged_map": src_map, "into_map": dst_map,
                "n_fused": n_fused, "merge": True,
                "cost0": 0.0, "cost": 0.0,
                "n_kf": int(len(st.kfs_of_map(dst_map)))}

    # ------------------------------------------------------------------
    def _detect(self, kf_id: int):
        """Inverted-file candidate selection (reference: KeyFrameDatabase::
        DetectNBestCandidates — shared-word prefilter + L1 scoring, score
        gate from the minimum covisible-neighbour similarity)."""
        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=5)
        # minimum score among covisible keyframes defines the gate
        cov_scores = [self.kfdb.score_pair(kf_id, int(c))
                      for c in covis[:10]]
        min_score = min(cov_scores) if cov_scores else 0.05
        live = np.nonzero(st.kf_mask)[0]
        recent = set(
            live[np.abs(st.kf_frame_id[live] - st.kf_frame_id[kf_id]) <
                 self.min_kf_gap].tolist()
        )
        excluded = set(covis.tolist()) | {kf_id} | recent
        cands = self.kfdb.query_keyframe(
            kf_id, top_n=3, exclude=excluded,
            min_score=max(self.min_score_ratio * min_score, 0.015))
        return [c for c, _s in cands]

    # ------------------------------------------------------------------
    def _verify(self, kf_id: int, cand: int, coarse_min: int = 7):
        """Geometric verification (reference: the Sim3Solver RANSAC +
        Sim3-guided SearchByProjection + OptimizeSim3 cascade of
        NewDetectCommonRegions, src/LoopClosing.cc:377-459).

        Stage 1 matches STRICTLY (the reference's TH_LOW/0.75-ratio BoW
        matching — on repeated man-made structure a loose ratio yields
        mostly false pairs and the RANSAC starves); the coarse transform
        only needs ``coarse_min`` inliers. Stage 2 expands correspondences
        by projecting the whole local map through the coarse drift estimate
        and refits; the FINAL acceptance gate (min_inliers) applies to the
        expanded support."""
        st = self.store
        d1 = jnp.asarray(st.kf_kp_desc[kf_id])
        d2 = jnp.asarray(st.kf_kp_desc[cand])
        m1 = jnp.asarray(st.kf_kp_mask[kf_id] & (st.kf_kp_pt[kf_id] >= 0))
        m2 = jnp.asarray(st.kf_kp_mask[cand] & (st.kf_kp_pt[cand] >= 0))
        idx, dist = matching.match_nn_ratio(d1, d2, m1, m2, max_dist=50,
                                            ratio=0.75)
        idx = np.asarray(idx)
        sel = np.nonzero(idx >= 0)[0]
        if len(sel) < coarse_min:
            return False, None, None, 0, None
        p1_ids = st.kf_kp_pt[kf_id][sel]
        p2_ids = st.kf_kp_pt[cand][idx[sel]]
        pts1 = st.pt_xyz[p1_ids]
        pts2 = st.pt_xyz[p2_ids]
        # express both in their local camera frames (reference aligns
        # camera-frame points, making the estimate the relative pose)
        X1 = pts1 @ st.kf_R[kf_id].T + st.kf_t[kf_id]
        X2 = pts2 @ st.kf_R[cand].T + st.kf_t[cand]
        n = len(sel)
        self._ransac_key, sub = jax.random.split(self._ransac_key)
        # generous coarse threshold: the active side's landmark geometry is
        # drift-WARPED (drift varies across the local window), so even
        # correct correspondences misalign by the intra-window drift spread
        res = sim3_solver.sim3_ransac(
            *_pad_sim3(X1, X2, n), sub,
            with_scale=not self.fix_scale, inlier_thresh=0.20,
        )
        # ONE await for the whole result: separate int()/np.asarray() pulls
        # pay the link's flat ~25 ms round trip EACH (measured ~160 ms per
        # verification from exactly this pattern)
        res = sim3_solver.RansacResult(*jax.device_get(tuple(res)))
        n_coarse = int(res.n_inliers)
        if n_coarse < coarse_min:
            return False, None, None, n_coarse, None
        inl = np.asarray(res.inliers)[:n]
        pairs = list(zip(p1_ids[inl].tolist(), p2_ids[inl].tolist()))

        # guided match expansion + refit (reference: SearchByProjection
        # with the estimated Sim3 gathers the real support, OptimizeSim3
        # refines; the acceptance inlier count is measured THERE)
        R_rel, t_rel = np.asarray(res.R), np.asarray(res.t)
        G_R, G_t = self._drift_transform(kf_id, cand, R_rel, t_rel)
        pairs2 = self._expand_pairs(kf_id, cand, pairs, G_R, G_t)
        best = (R_rel, t_rel, n_coarse, pairs)
        if len(pairs2) > len(pairs):
            src = np.asarray([p for p, _ in pairs2])
            dst = np.asarray([q for _, q in pairs2])
            X1 = (st.pt_xyz[src] @ st.kf_R[kf_id].T + st.kf_t[kf_id])
            X2 = (st.pt_xyz[dst] @ st.kf_R[cand].T + st.kf_t[cand])
            self._ransac_key, sub = jax.random.split(self._ransac_key)
            # the refit gate tolerates the intra-window drift warp too —
            # the essential graph + global BA refine the relative pose; the
            # verification only has to be unambiguous, not tight
            res2 = sim3_solver.sim3_ransac(
                *_pad_sim3(X1, X2, len(src)), sub,
                with_scale=not self.fix_scale, inlier_thresh=0.25,
            )
            res2 = sim3_solver.RansacResult(*jax.device_get(tuple(res2)))
            if int(res2.n_inliers) >= n_coarse:
                inl2 = np.asarray(res2.inliers)[: len(src)]
                best = (np.asarray(res2.R), np.asarray(res2.t),
                        int(res2.n_inliers),
                        list(zip(src[inl2].tolist(), dst[inl2].tolist())))
        R_b, t_b, n_b, pairs_b = best
        if n_b < self.min_inliers:
            return False, None, None, n_b, None
        return True, R_b, t_b, n_b, pairs_b

    # ------------------------------------------------------------------
    def _expand_pairs_projective(self, kf_id: int, cand: int, pairs,
                                 G_R, G_t, radius_px: float = 25.0,
                                 max_hamming: int = 55,
                                 cap_dst: int = 4096):
        """Sim3-guided PROJECTION expansion (the reference's
        SearchByProjection with the estimated Sim3, src/LoopClosing.cc
        NewDetectCommonRegions second stage): the loop side's landmarks are
        mapped into the ACTIVE world through G^-1, projected into the
        current keyframe and matched against its keypoints in a pixel
        window — far more forgiving of a marginal coarse transform than
        3-D point proximity."""
        st = self.store
        covis, _ = st.covisibility(cand, min_weight=5)
        window = np.concatenate([[cand], covis[:5]]).astype(np.int64)
        dst_ids = st.points_in_kfs(window)
        dst_ids = dst_ids[st.pt_mask[dst_ids]][:cap_dst]
        if len(dst_ids) < 10:
            return pairs
        n_dst = len(dst_ids)
        # pad the landmark set to a bucketed capacity: an exact-length
        # program here compiles once per distinct candidate-map size (a
        # multi-second stall inside loop verification on the tunnel)
        from .local_mapping import _bucket

        # high floor = few buckets (2048, 4096): the programs are
        # latency-bound, so padding is near-free while every extra bucket
        # is a fresh multi-second compile
        db = min(_bucket(n_dst, 2048), cap_dst)
        if db > n_dst:
            dst_ids = np.concatenate(
                [dst_ids, np.full((db - n_dst,), int(dst_ids[0]),
                                  dst_ids.dtype)])
        # loop-side world -> active (drifted) world: X_act = G^-1 X
        X_act = (st.pt_xyz[dst_ids] - G_t) @ G_R
        # padded entries project far behind the camera so `vis` masks them
        X_act[n_dst:] = np.array([0.0, 0.0, -1e6], np.float32)
        from ..geometry import cameras as _cm
        from .frame import project_points

        uv, z, vis = project_points(
            self.cam, jnp.asarray(st.kf_R[kf_id]),
            jnp.asarray(st.kf_t[kf_id]), jnp.asarray(X_act, jnp.float32))
        kp_pt = st.kf_kp_pt[kf_id]
        idx, dist = matching.search_by_projection(
            uv, vis, jnp.asarray(st.pt_desc[dst_ids]),
            jnp.zeros((len(dst_ids),), jnp.int32),
            jnp.asarray(st.kf_kp_xy[kf_id]),
            jnp.asarray(st.kf_kp_desc[kf_id]),
            jnp.zeros((st.kf_kp_xy[kf_id].shape[0],), jnp.int32),
            jnp.asarray(st.kf_kp_mask[kf_id] & (kp_pt >= 0)),
            radius=radius_px, max_dist=max_hamming, octave_tol=8,
        )
        idx = np.asarray(idx)
        hit = np.nonzero(idx >= 0)[0]
        have = set(pairs)
        out = list(pairs)
        for d_i, kp_i in zip(hit.tolist(), idx[hit].tolist()):
            src = int(kp_pt[kp_i])
            if src < 0 or not st.pt_mask[src]:
                continue
            pr = (src, int(dst_ids[d_i]))
            if pr not in have:
                have.add(pr)
                out.append(pr)
        self._last_expand = len(out)  # diagnostics
        return out

    def _expand_pairs(self, kf_id: int, cand: int, pairs, G_R, G_t,
                      radius: float = 0.4, max_hamming: int = 55,
                      cap_src: int = 1024, cap_dst: int = 4096):
        """More landmark correspondences by projecting the active map's
        points into the candidate's neighbourhood through the drift
        estimate G (3-D proximity fallback when no camera model is wired;
        reference: the Sim3-guided SearchByProjection stage).
        Returns the union of ``pairs`` and the new (src, dst) id pairs."""
        if self.cam is not None:
            return self._expand_pairs_projective(
                kf_id, cand, pairs, G_R, G_t, max_hamming=max_hamming,
                cap_dst=cap_dst)
        st = self.store
        covis, _ = st.covisibility(cand, min_weight=5)
        window = np.concatenate([[cand], covis[:5]]).astype(np.int64)
        dst_ids = st.points_in_kfs(window)
        dst_ids = dst_ids[st.pt_mask[dst_ids]][:cap_dst]
        src_ids = st.kf_kp_pt[kf_id]
        src_ids = np.unique(src_ids[src_ids >= 0])
        src_ids = src_ids[st.pt_mask[src_ids]][:cap_src]
        if len(dst_ids) < 10 or len(src_ids) < 10:
            return pairs
        have = set(pairs)
        dst_ids = dst_ids[~np.isin(dst_ids, src_ids)]
        if len(dst_ids) < 10:
            return pairs
        Xs = st.pt_xyz[src_ids] @ G_R.T + G_t   # src mapped into cand world
        Xd = st.pt_xyz[dst_ids]
        d2 = ((Xs[:, None, :] - Xd[None, :, :]) ** 2).sum(-1)
        ham = np.asarray(matching.hamming(
            jnp.asarray(st.pt_desc[src_ids]), jnp.asarray(st.pt_desc[dst_ids])))
        cost = np.where((d2 < radius * radius) & (ham <= max_hamming),
                        ham.astype(np.float32), np.inf)
        best = cost.argmin(axis=1)
        ok = np.isfinite(cost[np.arange(len(src_ids)), best])
        out = list(pairs)
        for s, b in zip(src_ids[ok].tolist(), best[ok].tolist()):
            pr = (int(s), int(dst_ids[b]))
            if pr not in have:
                have.add(pr)
                out.append(pr)
        return out

    # ------------------------------------------------------------------
    def _correct(self, kf_id: int, cand: int, R_rel, t_rel,
                 fuse_pairs=None):
        """Essential-graph correction (reference: CorrectLoop +
        OptimizeEssentialGraph). The loop edge pins T_cand_w ∘ T_w_kf to the
        verified relative pose; the chain edges come from current estimates.
        Verified duplicate landmarks are fused afterwards (reference:
        SearchAndFuse, src/LoopClosing.cc:1584).

        Lock discipline: a short-lock SNAPSHOT (poses + one covisibility-
        graph pass), the pose-graph SOLVE outside the lock (tracking keeps
        running), then a short-lock APPLY that rewrites poses/landmarks
        through each keyframe's pose delta. Keyframes and landmarks created
        while the solve ran are corrected with the chain-end delta — they
        were tracked in the drifted world."""
        st = self.store

        # -- snapshot (short lock) ------------------------------------------
        with st.lock:
            live = np.sort(st.kfs_of_map(int(st.kf_map[kf_id])))
            K = len(live)
            loc = {int(k): i for i, k in enumerate(live)}
            R_before = st.kf_R[live].copy()
            t_before = st.kf_t[live].copy()
            kf_fixed = st.kf_fixed[live].copy()
            # ONE pass over the observation table for the whole covisibility
            # graph (reference: the per-KF UpdateConnections maps; K
            # separate covisibility() scans are O(K*M) and were the resolve
            # latency spike during loop keyframes)
            g_ei, g_ej, g_w = st.covis_graph_full(min_weight=20)

        # -- build edges + solve (NO lock) ----------------------------------
        # edges: temporal chain + covisibility + spanning tree (reference:
        # OptimizeEssentialGraph includes spanning-tree, covisibility and
        # loop edges, src/Optimizer.cc:4487)
        pairs = [(i, i - 1) for i in range(1, K)]
        weights = [1.0] * len(pairs)
        have = {tuple(sorted(p)) for p in pairs}
        lut = np.full(self.store.max_kf, -1, np.int64)
        lut[live] = np.arange(K)
        sel = ((lut[g_ei] >= 0) & (lut[g_ej] >= 0)) \
            if len(g_ei) else np.zeros((0,), bool)
        cov_i = lut[g_ei[sel]].astype(np.int32)
        cov_j = lut[g_ej[sel]].astype(np.int32)
        cov_w = np.asarray(g_w[sel], np.int32)
        for a, b in zip(cov_i.tolist(), cov_j.tolist()):
            key = tuple(sorted((a, b)))
            if key not in have:
                have.add(key)
                pairs.append((a, b))
                weights.append(1.0)
        if len(cov_i):
            from .. import native as native_mod

            if native_mod.available():
                # symmetric COO for the parent scan (edge direction must not
                # hide earlier-id parents)
                parent = native_mod.spanning_tree(
                    np.concatenate([cov_i, cov_j]),
                    np.concatenate([cov_j, cov_i]),
                    np.concatenate([cov_w, cov_w]), K)
                for child in range(K):
                    p = int(parent[child])
                    if p >= 0 and tuple(sorted((child, p))) not in have:
                        have.add(tuple(sorted((child, p))))
                        pairs.append((child, p))
                        weights.append(1.0)
        pairs = np.asarray(pairs, np.int32)
        R = jnp.asarray(R_before)
        t = jnp.asarray(t_before)
        s = jnp.ones((K,), jnp.float32)
        eR, et, es = pose_graph.make_edges_from_poses(R, t, s, jnp.asarray(pairs))

        # loop edge: measured relative transform X_kf = R_rel^-1 (X_cand - t_rel)
        # sim3_ransac gave X2 = R X1 + t with X1 in kf frame, X2 in cand frame
        # => T_cand_kf = (R_rel, t_rel); edge S_ij with i=kf, j=cand:
        # S_kf_cand = T_kf_cand = (R_rel^T, -R_rel^T t_rel)
        Rlc = R_rel.T
        tlc = -R_rel.T @ t_rel
        edge_i = jnp.asarray(
            np.concatenate([pairs[:, 0], [loc[kf_id]]]), jnp.int32)
        edge_j = jnp.asarray(
            np.concatenate([pairs[:, 1], [loc[cand]]]), jnp.int32)
        edge_R = jnp.concatenate([eR, jnp.asarray(Rlc)[None]])
        edge_t = jnp.concatenate([et, jnp.asarray(tlc)[None]])
        edge_s = jnp.concatenate([es, jnp.ones((1,), jnp.float32)])
        E = edge_i.shape[0]
        ew = jnp.concatenate(
            [jnp.asarray(weights, jnp.float32), jnp.asarray([float(E)])]
        )
        fixed = np.zeros((K,), bool)
        fixed[loc[cand]] = True
        # frozen loaded-map keyframes are never moved (reference: mbFixed)
        fixed |= kf_fixed

        # fixed-shape buckets: pad vertices (identity, FIXED) and edges
        # (masked) to power-of-two capacities so closures at different map
        # sizes share ONE compiled pose-graph program — an unbucketed
        # solve recompiles per (K, E), a multi-second XLA compile inside
        # the loop-closing stage (measured up to ~60 s of tracker stall
        # through the tunnel backend)
        from .local_mapping import _bucket

        Kb = _bucket(K, 32)
        Eb = _bucket(E, 256)
        if Kb > K:
            pk = Kb - K
            R = jnp.concatenate(
                [R, jnp.tile(jnp.eye(3, dtype=R.dtype)[None], (pk, 1, 1))])
            t = jnp.concatenate([t, jnp.zeros((pk, 3), t.dtype)])
            s = jnp.concatenate([s, jnp.ones((pk,), s.dtype)])
            fixed = np.concatenate([fixed, np.ones((pk,), bool)])
        edge_mask = jnp.arange(Eb) < E
        if Eb > E:
            pe = Eb - E
            edge_i = jnp.concatenate([edge_i, jnp.zeros((pe,), jnp.int32)])
            edge_j = jnp.concatenate([edge_j, jnp.zeros((pe,), jnp.int32)])
            edge_R = jnp.concatenate(
                [edge_R,
                 jnp.tile(jnp.eye(3, dtype=edge_R.dtype)[None], (pe, 1, 1))])
            edge_t = jnp.concatenate([edge_t, jnp.zeros((pe, 3),
                                                        edge_t.dtype)])
            edge_s = jnp.concatenate([edge_s, jnp.ones((pe,), edge_s.dtype)])
            ew = jnp.concatenate([ew, jnp.zeros((pe,), ew.dtype)])

        prob = pose_graph.PoseGraphProblem(
            R, t, s, jnp.asarray(fixed), edge_i, edge_j, edge_R, edge_t,
            edge_s, ew, edge_mask,
        )
        dof4_axis = None
        if self.gravity_w is not None:
            g = np.asarray(self.gravity_w, np.float32)
            g = g / max(np.linalg.norm(g), 1e-9)
            # camera-frame gravity axis per vertex: a_k = R_k g_w
            # (padded vertices get an arbitrary unit axis — they're fixed)
            ax = np.einsum("kij,j->ki", R_before, g)
            if Kb > K:
                ax = np.concatenate(
                    [ax, np.tile(np.array([[0.0, 0.0, 1.0]], np.float32),
                                 (Kb - K, 1))])
            dof4_axis = jnp.asarray(ax)
        if self.mesh is not None and dof4_axis is None:
            from ..parallel import sharded_pose_graph

            nd = int(np.prod(self.mesh.devices.shape))
            pad = (-int(prob.edge_i.shape[0])) % nd
            if pad:
                prob = prob._replace(
                    edge_i=jnp.pad(prob.edge_i, (0, pad)),
                    edge_j=jnp.pad(prob.edge_j, (0, pad)),
                    edge_R=jnp.pad(prob.edge_R, ((0, pad), (0, 0), (0, 0))),
                    edge_t=jnp.pad(prob.edge_t, ((0, pad), (0, 0))),
                    edge_s=jnp.pad(prob.edge_s, (0, pad),
                                   constant_values=1.0),
                    edge_weight=jnp.pad(prob.edge_weight, (0, pad)),
                    edge_mask=jnp.pad(prob.edge_mask, (0, pad)),
                )
            Rn, tn, sn, info = sharded_pose_graph.optimize_sharded(
                prob, self.mesh, num_iters=12, fix_scale=self.fix_scale)
        else:
            Rn, tn, sn, info = pose_graph.optimize_jit(
                prob, num_iters=12, fix_scale=self.fix_scale,
                dof4_axis=dof4_axis,
            )
        Rn, tn = np.asarray(Rn)[:K], np.asarray(tn)[:K]

        # -- apply (short lock) ---------------------------------------------
        i_end = loc[kf_id]  # chain-end delta for everything born mid-solve
        map_id = int(st.kf_map[kf_id])
        with st.lock:
            # correct map points through their reference keyframe's pose
            # change: X' = T_new^-1 ∘ T_old ∘ X (reference: CorrectLoop).
            # Only landmarks whose reference KF belongs to the CORRECTED map
            # move — landmarks of other atlas maps (spawned on tracking loss,
            # or a frozen loaded atlas) must not be warped by a within-map
            # correction. Refs born/culled mid-solve within this map get the
            # chain-end delta (they were tracked in the drifted world).
            pts = np.nonzero(st.pt_mask)[0]
            ref = st.pt_ref_kf[pts]
            in_map = st.kf_map[ref] == map_id
            pts = pts[in_map]
            ref = ref[in_map]
            ref_loc = np.asarray([loc.get(int(r), i_end) for r in ref],
                                 dtype=np.int64)
            if len(pts):
                R_old = R_before[ref_loc]
                t_old = t_before[ref_loc]
                R_new = Rn[ref_loc]
                t_new = tn[ref_loc]
                X = st.pt_xyz[pts]
                Xc = np.einsum("nij,nj->ni", R_old, X) + t_old
                st.pt_xyz[pts] = np.einsum("nji,nj->ni", R_new, Xc - t_new)
            st.version += 1

            # line landmarks move with their reference keyframe exactly like
            # points (reference: CorrectLoop transforms MapLines' endpoints,
            # src/LoopClosing.cc:1260-1584)
            lns = np.nonzero(st.ln_mask)[0]
            if len(lns):
                lns = lns[st.kf_map[st.ln_ref_kf[lns]] == map_id]
            if len(lns):
                lref_loc = np.asarray(
                    [loc.get(int(r), i_end) for r in st.ln_ref_kf[lns]],
                    dtype=np.int64)
                R_o, t_o = R_before[lref_loc], t_before[lref_loc]
                R_n2, t_n2 = Rn[lref_loc], tn[lref_loc]
                for arr in (st.ln_Xs, st.ln_Xe):
                    Xc2 = np.einsum("nij,nj->ni", R_o, arr[lns]) + t_o
                    arr[lns] = np.einsum("nji,nj->ni", R_n2, Xc2 - t_n2)

            st.kf_R[live] = Rn
            st.kf_t[live] = tn
            # keyframes created while the solve ran: chain-end delta
            # T' = T ∘ T_end_old^-1 ∘ T_end_new
            now_live = st.kfs_of_map(int(st.kf_map[kf_id]))
            born = np.setdiff1d(now_live, live)
            if len(born):
                dR = R_before[i_end].T @ Rn[i_end]
                dt = R_before[i_end].T @ (tn[i_end] - t_before[i_end])
                for k in born:
                    R_k = st.kf_R[k].copy()
                    st.kf_R[k] = (R_k @ dR).astype(np.float32)
                    st.kf_t[k] = (R_k @ dt + st.kf_t[k]).astype(np.float32)

            # map objects move with their best-observing keyframe
            # (reference: object update in CorrectLoop/SearchAndFuse)
            if self.object_store is not None:
                for rec in self.object_store.objects:
                    if not rec.detected or not rec.obs:
                        continue
                    anchor = max((k for k in rec.obs if k in loc),
                                 default=None)
                    if anchor is None:
                        continue
                    i = loc[anchor]
                    # T_wo' = T_new^-1 T_old T_wo (same update as landmarks)
                    R_rel2 = Rn[i].T @ R_before[i]
                    t_rel2 = Rn[i].T @ (t_before[i] - tn[i])
                    rec.R_wo = (R_rel2 @ rec.R_wo).astype(np.float32)
                    rec.t_wo = (R_rel2 @ rec.t_wo + t_rel2).astype(np.float32)

            # fuse duplicate LINE landmarks across the weld: corrected lines
            # of the current side that now coincide with loop-side lines
            # (endpoint proximity + LBD distance) are replaced (reference:
            # the line part of SearchAndFuse, src/LoopClosing.cc:1584)
            n_lines_fused = self._fuse_loop_lines(kf_id, cand)

            # fuse the verified duplicate landmarks: the loop (older) side
            # wins (reference: SearchAndFuse replaces current-side points
            # with the loop-side ones after correction)
            n_fused = 0
            if fuse_pairs is not None and len(fuse_pairs):
                for p_src, p_dst in fuse_pairs:
                    if (p_src != p_dst and st.pt_mask[p_src]
                            and st.pt_mask[p_dst]):
                        st.replace_point(int(p_src), int(p_dst))
                        n_fused += 1
        return {"cost0": float(info["cost0"]), "cost": float(info["cost"]),
                "n_kf": K, "n_fused": n_fused,
                "n_lines_fused": n_lines_fused}

    # ------------------------------------------------------------------
    def _fuse_loop_lines(self, kf_id: int, cand: int,
                         endpoint_tol: float = 0.15,
                         max_hamming: int = 80) -> int:
        """Merge line-landmark duplicates between the current KF's window
        and the loop candidate's window after correction."""
        st = self.store
        if st.num_lines == 0:
            return 0
        covis_c, _ = st.covisibility(cand, min_weight=5)
        win_c = np.concatenate([[cand], covis_c[:5]]).astype(np.int64)
        covis_k, _ = st.covisibility(kf_id, min_weight=5)
        win_k = np.concatenate([[kf_id], covis_k[:5]]).astype(np.int64)
        src = st.lines_in_kfs(win_k)
        src = src[st.ln_mask[src]]
        dst = st.lines_in_kfs(win_c)
        dst = dst[st.ln_mask[dst]]
        dst = dst[~np.isin(dst, src)]
        if len(src) == 0 or len(dst) == 0:
            return 0
        d2s = ((st.ln_Xs[src][:, None] - st.ln_Xs[dst][None]) ** 2).sum(-1)
        d2e = ((st.ln_Xe[src][:, None] - st.ln_Xe[dst][None]) ** 2).sum(-1)
        # endpoint order of independent detections can flip
        d2s_f = ((st.ln_Xs[src][:, None] - st.ln_Xe[dst][None]) ** 2).sum(-1)
        d2e_f = ((st.ln_Xe[src][:, None] - st.ln_Xs[dst][None]) ** 2).sum(-1)
        close = np.minimum(np.maximum(d2s, d2e), np.maximum(d2s_f, d2e_f))
        ham = np.asarray(matching.hamming(
            jnp.asarray(st.ln_desc[src]), jnp.asarray(st.ln_desc[dst])))
        cost = np.where((close < endpoint_tol ** 2) & (ham <= max_hamming),
                        ham.astype(np.float32), np.inf)
        best = cost.argmin(axis=1)
        ok = np.isfinite(cost[np.arange(len(src)), best])
        n = 0
        for s, b in zip(src[ok].tolist(), best[ok].tolist()):
            d = int(dst[b])
            if st.ln_mask[s] and st.ln_mask[d]:
                st.replace_line(int(s), d)
                n += 1
        return n
