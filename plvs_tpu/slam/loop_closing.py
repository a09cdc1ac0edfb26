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


@dataclasses.dataclass
class LoopCloser:
    store: MapStore
    kfdb: KeyFrameDatabase | None = None
    min_score_ratio: float = 0.75
    min_inliers: int = 25
    min_kf_gap: int = 10          # don't close against recent KFs
    fix_scale: bool = True        # RGB-D / stereo

    def __post_init__(self):
        if self.kfdb is None:
            self.kfdb = KeyFrameDatabase(self.store)
        self.last_loop_kf = -1
        self._ransac_key = jax.random.PRNGKey(0)

    @property
    def kf_bow(self):
        return self.kfdb.kf_bow

    # ------------------------------------------------------------------
    def process_keyframe(self, kf_id: int) -> dict | None:
        """Detect + verify + correct. Returns loop info dict if closed."""
        st = self.store
        if not self.kfdb.add(kf_id):
            return None

        cand = self._detect(kf_id)
        if cand is None:
            return None
        ok, R_rel, t_rel, n_inl, pairs = self._verify(kf_id, cand)
        if not ok:
            return None
        if st.kf_map[cand] != st.kf_map[kf_id]:
            # place recognised in another atlas map -> weld the active map
            # into it (reference: MergeLocal, src/LoopClosing.cc:1684-)
            info = self._merge(kf_id, cand, R_rel, t_rel, pairs)
        else:
            info = self._correct(kf_id, cand, R_rel, t_rel)
        info.update({"candidate": int(cand), "inliers": int(n_inl)})
        self.last_loop_kf = kf_id
        return info

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
        """BoW candidate selection (reference: KeyFrameDatabase::
        DetectNBestCandidates — score gate from the covisible neighbours)."""
        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=5)
        live = np.nonzero(st.kf_mask)[0]
        scores = 1.0 - 0.5 * np.abs(
            self.kf_bow[live] - self.kf_bow[kf_id][None]
        ).sum(-1)
        by_id = dict(zip(live.tolist(), scores.tolist()))
        # minimum score among covisible keyframes defines the gate
        cov_scores = [by_id[c] for c in covis.tolist() if c in by_id]
        min_score = min(cov_scores) if cov_scores else 0.05
        excluded = set(covis.tolist()) | {kf_id}
        # temporal exclusion window
        recent = set(
            live[np.abs(st.kf_frame_id[live] - st.kf_frame_id[kf_id]) <
                 self.min_kf_gap].tolist()
        )
        best, best_score = None, max(self.min_score_ratio * min_score, 0.015)
        for k, s in zip(live.tolist(), scores.tolist()):
            if k in excluded or k in recent:
                continue
            if s > best_score:
                best, best_score = k, s
        return best

    # ------------------------------------------------------------------
    def _verify(self, kf_id: int, cand: int):
        """Descriptor match + 3D-3D SE3/Sim3 RANSAC between the two KFs
        (reference: Sim3Solver RANSAC stage of NewDetectCommonRegions)."""
        st = self.store
        d1 = jnp.asarray(st.kf_kp_desc[kf_id])
        d2 = jnp.asarray(st.kf_kp_desc[cand])
        m1 = jnp.asarray(st.kf_kp_mask[kf_id] & (st.kf_kp_pt[kf_id] >= 0))
        m2 = jnp.asarray(st.kf_kp_mask[cand] & (st.kf_kp_pt[cand] >= 0))
        idx, dist = matching.match_nn_ratio(d1, d2, m1, m2, max_dist=64, ratio=0.85)
        idx = np.asarray(idx)
        sel = np.nonzero(idx >= 0)[0]
        if len(sel) < self.min_inliers:
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
        res = sim3_solver.sim3_ransac(
            jnp.asarray(X1), jnp.asarray(X2), jnp.ones((n,), bool), sub,
            with_scale=not self.fix_scale, inlier_thresh=0.10,
        )
        if int(res.n_inliers) < self.min_inliers:
            return False, None, None, int(res.n_inliers), None
        inl = np.asarray(res.inliers)
        pairs = list(zip(p1_ids[inl].tolist(), p2_ids[inl].tolist()))
        return (True, np.asarray(res.R), np.asarray(res.t),
                int(res.n_inliers), pairs)

    # ------------------------------------------------------------------
    def _correct(self, kf_id: int, cand: int, R_rel, t_rel):
        """Essential-graph correction (reference: CorrectLoop +
        OptimizeEssentialGraph). The loop edge pins T_cand_w ∘ T_w_kf to the
        verified relative pose; the chain edges come from current estimates."""
        st = self.store
        live = np.sort(st.kfs_of_map(int(st.kf_map[kf_id])))
        K = len(live)
        loc = {int(k): i for i, k in enumerate(live)}
        R = jnp.asarray(st.kf_R[live])
        t = jnp.asarray(st.kf_t[live])
        s = jnp.ones((K,), jnp.float32)

        # edges: temporal chain + covisibility (weight by shared points)
        pairs = [(i, i - 1) for i in range(1, K)]
        weights = [1.0] * len(pairs)
        okf, opt, _ = st.live_obs()
        for i, k in enumerate(live):
            covis, w = st.covisibility(int(k), min_weight=20)
            for c, wt in zip(covis.tolist()[:5], w.tolist()[:5]):
                if c in loc and loc[c] < i - 1:
                    pairs.append((i, loc[c]))
                    weights.append(1.0)
        pairs = np.asarray(pairs, np.int32)
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

        prob = pose_graph.PoseGraphProblem(
            R, t, s, jnp.asarray(fixed), edge_i, edge_j, edge_R, edge_t,
            edge_s, ew, jnp.ones((E,), bool),
        )
        Rn, tn, sn, info = pose_graph.optimize(
            prob, num_iters=12, fix_scale=self.fix_scale
        )
        Rn, tn = np.asarray(Rn), np.asarray(tn)

        # correct map points through their reference keyframe's pose change:
        # X' = T_new^-1 ∘ T_old ∘ X (reference: CorrectLoop point update)
        pts = np.nonzero(st.pt_mask)[0]
        ref = st.pt_ref_kf[pts]
        ref_loc = np.asarray([loc.get(int(r), -1) for r in ref])
        ok = ref_loc >= 0
        p_sel = pts[ok]
        rl = ref_loc[ok]
        R_old = st.kf_R[live[rl]]
        t_old = st.kf_t[live[rl]]
        R_new = Rn[rl]
        t_new = tn[rl]
        X = st.pt_xyz[p_sel]
        Xc = np.einsum("nij,nj->ni", R_old, X) + t_old
        Xw = np.einsum("nji,nj->ni", R_new, Xc - t_new)
        st.pt_xyz[p_sel] = Xw

        st.kf_R[live] = Rn
        st.kf_t[live] = tn
        return {"cost0": float(info["cost0"]), "cost": float(info["cost"]),
                "n_kf": K}
