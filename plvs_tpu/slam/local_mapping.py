"""Local mapping: point culling + windowed local bundle adjustment.

TPU-native re-derivation of the reference's LocalMapping thread
(reference: src/LocalMapping.cc:96-145 — ProcessNewKeyFrame,
MapPointCulling, SearchInNeighbors, Optimizer::LocalBundleAdjustment at
src/Optimizer.cc:3198). The covisibility window is assembled on the host
from the observation table, padded to bucketed capacities (so jit compiles a
handful of problem shapes), and solved by the batched LM core.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..geometry import cameras as cam_mod
from ..solvers import ba
from .map_store import MapStore


def _bucket(n: int, lo: int = 256) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


import functools as _functools  # noqa: E402


class _LazyFuture:
    """future-compatible wrapper that fetches on .result() (sync mode —
    preserves the await's timing attribution)."""

    def __init__(self, outs):
        self._outs = outs

    def result(self):
        return _jax.device_get(self._outs)

    def done(self):
        return True


class _SyncFetch:
    """submit-compatible inline fetcher for the non-interleaved path."""

    def __call__(self, outs):
        return _LazyFuture(outs)

import jax as _jax  # noqa: E402


@_functools.partial(_jax.jit, static_argnames=("cam", "reproj_thresh"))
def _triangulate_lines_pair(cam, R1, t1, R2, t2, sp1, ep1, sp2, ep2, valid,
                            reproj_thresh: float = 3.0):
    """Plane-plane triangulation + verification for matched keyline pairs
    of two keyframes, fixed [n_kl] shapes, ONE dispatch (reference:
    LocalMapping line triangulation src/LocalMapping.cc:957-1288)."""
    from ..features import lines as lines_mod
    from ..geometry import cameras as _cm
    from ..geometry import lie as _lie
    from ..geometry import triangulation as _tri

    n = sp1.shape[0]
    rays_s1 = _cm.unproject(cam, sp1)
    rays_e1 = _cm.unproject(cam, ep1)
    rays_s2 = _cm.unproject(cam, sp2)
    rays_e2 = _cm.unproject(cam, ep2)
    tile = lambda x: jnp.broadcast_to(x, (n,) + x.shape)
    Xs, Xe, ok_tri, deg = _tri.triangulate_line_planes(
        tile(R1), tile(t1), tile(R2), tile(t2),
        rays_s1, rays_e1, rays_s2, rays_e2)
    nld2 = lines_mod.line_nld(sp2, ep2)
    Xc2s = _lie.se3_apply(R2, t2, Xs)
    Xc2e = _lie.se3_apply(R2, t2, Xe)
    uv2s = _cm.project(cam, Xc2s)
    uv2e = _cm.project(cam, Xc2e)
    r2s = jnp.abs(jnp.sum(nld2[:, :2] * uv2s, -1) + nld2[:, 2])
    r2e = jnp.abs(jnp.sum(nld2[:, :2] * uv2e, -1) + nld2[:, 2])
    seg_len = jnp.linalg.norm(Xe - Xs, axis=-1)
    z1s = _lie.se3_apply(R1, t1, Xs)[..., 2]
    ok = (valid & ok_tri & (deg < 0.995)
          & (r2s < reproj_thresh) & (r2e < reproj_thresh)
          & (seg_len > 0.02) & (seg_len < 10.0 * jnp.maximum(z1s, 0.1)))
    return Xs, Xe, ok


@_functools.partial(_jax.jit, static_argnames=("cam", "reproj_thresh"))
def _triangulate_lines_multi(cam, R1, t1, d1, m1, sp1, ep1,
                             R2b, t2b, d2b, m2b, sp2b, ep2b,
                             reproj_thresh: float = 3.0):
    """Line matching + plane-plane triangulation against B neighbour
    keyframes in ONE dispatch (the per-neighbour loop cost B x 2 round trips
    over a remote tunnel). Returns per-neighbour (idx [B,n], Xs, Xe, ok)."""
    from ..features.matching import match_nn_ratio

    def one(R2, t2, d2, m2, sp2, ep2):
        idx = match_nn_ratio(d1, d2, m1, m2, max_dist=90, ratio=0.85)[0]
        idx_c = jnp.maximum(idx, 0)
        Xs, Xe, ok = _triangulate_lines_pair(
            cam, R1, t1, R2, t2, sp1, ep1, sp2[idx_c], ep2[idx_c],
            idx >= 0, reproj_thresh=reproj_thresh)
        return idx, Xs, Xe, ok

    return _jax.vmap(one)(R2b, t2b, d2b, m2b, sp2b, ep2b)


@_functools.partial(_jax.jit, static_argnames=("cam",))
def _fuse_match_batch(cam, R_nb, t_nb, pts_xyz, pts_desc,
                      kp_xy, kp_desc, kp_octave, kp_mask):
    """Projection-guided fuse matching of one point set against B
    neighbour keyframes at once: [B] vmapped search_by_projection."""
    from ..features import matching as matching_mod
    from .frame import project_points

    zero_oct = jnp.zeros((pts_xyz.shape[0],), jnp.int32)

    def one(R, t, kxy, kdesc, koct, kmask):
        uv, z, vis = project_points(cam, R, t, pts_xyz)
        idx, dist = matching_mod.search_by_projection(
            uv, vis, pts_desc, zero_oct, kxy, kdesc, koct, kmask,
            radius=3.0, max_dist=50, octave_tol=8,
        )
        return idx

    return _jax.vmap(one)(R_nb, t_nb, kp_xy, kp_desc, kp_octave, kp_mask)


@dataclasses.dataclass
class LocalMapper:
    cam: cam_mod.Camera
    store: MapStore
    window_size: int = 8
    fixed_cap: int = 8
    scale: float = 1.2
    n_levels: int = 8

    use_lines: bool = False
    kf_culling: bool = True
    triangulate_new_points: bool = False  # mono map growth (and far points)
    kfdb: object | None = None  # keyframe database to notify on culls
    # async runtime: polled between local-BA chunks; True aborts the solve
    # (reference: mbAbortBA / LocalMapping::InterruptBA,
    # src/LocalMapping.cc:139)
    abort_check: object | None = None
    ba_chunk_iters: int = 3
    # inertial runtime (None for visual-only): keyframe culling on inertial
    # maps must preserve the temporal IMU chain — a cull is allowed only
    # when the merged preintegration span stays short, and the runtime
    # re-chains the preintegrations of the culled keyframe (reference:
    # the inertial branch of LocalMapping::KeyFrameCulling)
    inertial: object | None = None
    inertial_max_gap: float = 3.0  # s, reference's temporal-neighbour bound
    stopwatch: object | None = None  # optional fine-grained stage timing
    # device mesh for the sharded global-BA backend (SystemConfig.
    # sharded_backend); windowed local BA stays single-device — its
    # problem is too small to amortize collectives
    mesh: object | None = None
    # raise the problem-shape bucket FLOORS so every realistic local-BA
    # problem lands in ONE precompiled shape (steady-state runtimes: a
    # fresh bucket mid-sequence pays a multi-second XLA compile in the
    # tracking loop; the solves are latency-bound, so padding is nearly
    # free device-side). Growth beyond a floor still buckets by 2x.
    fixed_shapes: bool = False

    def _scope(self, name: str):
        if self.stopwatch is None:
            import contextlib

            return contextlib.nullcontext()
        return self.stopwatch.scope(name)

    def process_keyframe(self, kf_id: int, extra_fetch=None):
        """Per-keyframe backend pass (synchronous drain of
        :meth:`process_keyframe_stages`). ``extra_fetch``: an unrelated
        in-flight device output (e.g. the BoW quantize) fetched in the same
        first await; its value is returned."""
        gen = self.process_keyframe_stages(kf_id, extra_fetch=extra_fetch)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value

    def process_keyframe_stages(self, kf_id: int, extra_fetch=None,
                                submit=None):
        """Staged per-keyframe backend pass (generator; ``yield`` marks a
        point where the tracking loop may interleave frames).

        The independent device programs (line triangulation, neighbour fuse
        matching) are DISPATCHED first and awaited in ONE device_get —
        through a remote tunnel each await costs a flat ~25 ms regardless
        of compute, so the per-KF await count, not kernel time, is the
        backend budget. ``submit`` (fn(outs) -> future) offloads the
        blocking fetches to a helper thread so a stage resumed one frame
        later finds its data already host-side; None = fetch inline
        (synchronous mode). The generator's return value is the fetched
        ``extra_fetch``."""
        import jax as _jax

        fetch = submit if submit is not None else _SyncFetch()
        lock = self.store.lock
        with self._scope("lm.cull"), lock:
            self.cull_points(kf_id)
            if self.use_lines:
                self.cull_lines(kf_id)
        if self.triangulate_new_points:
            with self._scope("lm.tri_pts"), lock:
                self.create_new_points(kf_id)
        # dispatch phase: queue all independent device work, zero awaits
        with lock:
            tri_ctx = (self._dispatch_new_lines(kf_id)
                       if self.use_lines else None)
            fuse_ctx = self._dispatch_fuse(kf_id)
        outs = [c["out"] for c in (tri_ctx, fuse_ctx) if c is not None]
        fut = (fetch((tuple(outs), extra_fetch))
               if outs or extra_fetch is not None else None)
        # yield the in-flight future: the interleaved driver only resumes
        # this generator once it completes (a stage resumed too early just
        # blocks the tracking thread on .result())
        yield fut
        extra_out = None
        with self._scope("lm.await"):
            if fut is not None:
                fetched = list(fut.result())
                extra_out = fetched[1]
                fetched = list(fetched[0])
            else:
                fetched = []
        if tri_ctx is not None:
            with self._scope("lm.tri_lines"), lock:
                self._apply_new_lines(kf_id, tri_ctx, fetched.pop(0))
        if fuse_ctx is not None:
            with self._scope("lm.fuse"), lock:
                self._apply_fuse(kf_id, fuse_ctx, fetched.pop(0))
        with self._scope("lm.maint"), lock:
            # landmark maintenance after the observation set settled
            # (reference: ProcessNewKeyFrame + SearchInNeighbors both re-run
            # ComputeDistinctiveDescriptors / UpdateNormalAndDepth). The
            # normal/scale half applies immediately; the device-side
            # descriptor vote rides the local-BA fetch below (one round
            # trip for both instead of two flat link latencies)
            pts = self.store.kf_kp_pt[kf_id]
            maint_ctx = self.store.dispatch_point_maintenance(
                np.unique(pts[pts >= 0]), scale=self.scale,
                n_levels=self.n_levels)
        with self._scope("lm.ba"):
            ba_ctx = self._ba_dispatch_local(kf_id)
        extra2 = None if maint_ctx is None else maint_ctx["out"]
        if ba_ctx is not None:
            ba_fut = fetch((ba_ctx["outs"], extra2))
        elif extra2 is not None:
            ba_fut = fetch(((), extra2))
        else:
            ba_fut = None
        yield ba_fut
        maint_fetched = None
        if ba_fut is not None:
            with self._scope("lm.ba" if ba_ctx is not None else "lm.await"):
                solved, maint_fetched = ba_fut.result()
            if ba_ctx is not None:
                with self.store.lock:
                    self._ba_apply(ba_ctx, solved)
        if maint_ctx is not None:
            with self._scope("lm.maint"), lock:
                if maint_fetched is not None:
                    self.store.apply_point_maintenance(maint_ctx,
                                                       maint_fetched)
                else:
                    self.store.apply_point_maintenance(
                        maint_ctx, _jax.device_get(maint_ctx["out"]))
        if self.kf_culling:
            with self._scope("lm.cull_kf"), lock:
                self.cull_keyframes(kf_id)
        return extra_out

    # ------------------------------------------------------------------
    def _dispatch_new_lines(self, kf_id: int, max_neighbors: int = 4,
                            reproj_thresh: float = 3.0):
        """Dispatch half of create_new_lines: host-side neighbour
        preselection + ONE vmapped match+triangulate program; returns a ctx
        holding the in-flight device output, or None."""
        import jax.numpy as _j

        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=10)
        if len(covis) == 0:
            return None
        m1 = st.kf_kl_mask[kf_id] & (st.kf_kl_line[kf_id] < 0)
        if m1.sum() < 2:
            return None
        R1, t1 = st.kf_R[kf_id], st.kf_t[kf_id]
        C1 = -R1.T @ t1
        # baseline + free-keyline gates (reference's baseline/median-depth
        # degeneracy gate)
        nbs = []
        for nb in covis[:max_neighbors]:
            nb = int(nb)
            C2 = -st.kf_R[nb].T @ st.kf_t[nb]
            if np.linalg.norm(C1 - C2) < 0.01:
                continue
            if (st.kf_kl_mask[nb] & (st.kf_kl_line[nb] < 0)).sum() >= 2:
                nbs.append(nb)
        if not nbs:
            return None
        nbs = np.asarray(nbs, np.int64)
        # FIXED neighbour count: the baseline/free-keyline gates leave a
        # variable 1..max_neighbors survivors, and each distinct count is a
        # separate compile of the vmapped program (~10 s through the tunnel
        # — measured landing mid-timed-pass when a late keyframe hit a
        # fresh count). Pad with masked duplicate rows instead.
        n_real = len(nbs)
        nbs_p = (np.concatenate([nbs, np.full(max_neighbors - n_real,
                                              nbs[0], np.int64)])
                 if n_real < max_neighbors else nbs)
        m2b = st.kf_kl_mask[nbs_p] & (st.kf_kl_line[nbs_p] < 0)
        m2b[n_real:] = False
        out = _triangulate_lines_multi(
            self.cam, _j.asarray(R1), _j.asarray(t1),
            _j.asarray(st.kf_kl_desc[kf_id]), _j.asarray(m1),
            _j.asarray(st.kf_kl_sp[kf_id]), _j.asarray(st.kf_kl_ep[kf_id]),
            _j.asarray(st.kf_R[nbs_p]), _j.asarray(st.kf_t[nbs_p]),
            _j.asarray(st.kf_kl_desc[nbs_p]), _j.asarray(m2b),
            _j.asarray(st.kf_kl_sp[nbs_p]), _j.asarray(st.kf_kl_ep[nbs_p]),
            reproj_thresh=reproj_thresh)
        return {"out": out, "nbs": nbs, "m1": m1}

    def _apply_new_lines(self, kf_id: int, ctx, fetched):
        """Apply half of create_new_lines (store mutation from fetched
        triangulation results)."""
        st = self.store
        nbs, m1 = ctx["nbs"], ctx["m1"]
        idx_b, Xs_b, Xe_b, ok_b = fetched
        taken = ~m1  # keylines already bound to a landmark
        for bi, nb in enumerate(nbs):
            idx, Xs, Xe, ok = idx_b[bi], Xs_b[bi], Xe_b[bi], ok_b[bi]
            good = np.nonzero(ok & ~taken)[0]
            if len(good) == 0:
                continue
            ln_ids = st.alloc_lines(len(good))
            st.version += 1
            st.ln_Xs[ln_ids] = Xs[good]
            st.ln_Xe[ln_ids] = Xe[good]
            st.ln_desc[ln_ids] = st.kf_kl_desc[kf_id][good]
            st.ln_mask[ln_ids] = True
            st.ln_ref_kf[ln_ids] = kf_id
            st.ln_first_kf[ln_ids] = kf_id
            st.ln_n_obs[ln_ids] = 0
            st.ln_visible[ln_ids] = 1
            st.ln_found[ln_ids] = 1
            st.add_line_observations(kf_id, ln_ids, good)
            st.add_line_observations(int(nb), ln_ids, idx[good])
            taken[good] = True

    def create_new_lines(self, kf_id: int, max_neighbors: int = 4,
                         reproj_thresh: float = 3.0):
        """Triangulate new line landmarks between the new KF and covisible
        neighbours by plane-plane intersection (reference:
        LocalMapping::CreateNewMapFeatures line path,
        src/LocalMapping.cc:957-1288 — LineMatcher::SearchForTriangulation,
        back-projected plane intersection, parallel-normal degeneracy check,
        endpoint reprojection + positive-depth verification)."""
        import jax as _jax

        ctx = self._dispatch_new_lines(kf_id, max_neighbors, reproj_thresh)
        if ctx is None:
            return
        self._apply_new_lines(kf_id, ctx, _jax.device_get(ctx["out"]))

    # ------------------------------------------------------------------
    def create_new_points(self, kf_id: int, max_neighbors: int = 5):
        """Triangulate new landmarks between the new KF and covisible
        neighbours from epipolar-gated descriptor matches (reference:
        LocalMapping::CreateNewMapFeatures src/LocalMapping.cc:513-657 —
        SearchForTriangulation + two-view triangulation with parallax,
        cheirality and reprojection checks)."""
        import jax.numpy as _j

        from ..features.matching import search_for_triangulation
        from ..geometry import cameras as _cm
        from ..geometry import lie as _lie
        from ..geometry import triangulation as _tri

        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=10)
        if len(covis) == 0:
            return
        m1 = st.kf_kp_mask[kf_id] & (st.kf_kp_pt[kf_id] < 0)
        if m1.sum() < 10:
            return
        rays1_full = _cm.unproject(self.cam, _j.asarray(st.kf_kp_xy[kf_id]))
        R1 = st.kf_R[kf_id]
        t1 = st.kf_t[kf_id]
        for nb in covis[:max_neighbors]:
            nb = int(nb)
            # baseline check (reference: skip if baseline too small
            # vs scene depth)
            C1 = -R1.T @ t1
            C2 = -st.kf_R[nb].T @ st.kf_t[nb]
            if np.linalg.norm(C1 - C2) < 1e-3:
                continue
            m2 = st.kf_kp_mask[nb] & (st.kf_kp_pt[nb] < 0)
            rays2_full = _cm.unproject(self.cam, _j.asarray(st.kf_kp_xy[nb]))
            # relative pose x1 = R12 x2 + t12
            R12 = R1 @ st.kf_R[nb].T
            t12 = t1 - R12 @ st.kf_t[nb]
            idx, _d = search_for_triangulation(
                _j.asarray(st.kf_kp_desc[kf_id]), _j.asarray(m1), rays1_full,
                _j.asarray(st.kf_kp_desc[nb]), _j.asarray(m2), rays2_full,
                _j.asarray(R12), _j.asarray(t12),
                epi_thresh=2.0 / float(self.cam.fx),
            )
            idx = np.asarray(idx)
            sel = np.nonzero(idx >= 0)[0]
            if len(sel) == 0:
                continue
            n = len(sel)
            Xw, valid = _tri.triangulate_points_world(
                _j.asarray(np.tile(R1, (n, 1, 1))), _j.asarray(np.tile(t1, (n, 1))),
                _j.asarray(np.tile(st.kf_R[nb], (n, 1, 1))),
                _j.asarray(np.tile(st.kf_t[nb], (n, 1))),
                rays1_full[sel], rays2_full[idx[sel]],
            )
            cosp = _tri.parallax_cos(
                rays1_full[sel], rays2_full[idx[sel]],
                _j.asarray(np.tile(R12, (n, 1, 1))))
            # reprojection checks in both views
            Xc1 = _lie.se3_apply(_j.asarray(R1), _j.asarray(t1), Xw)
            Xc2 = _lie.se3_apply(_j.asarray(st.kf_R[nb]),
                                 _j.asarray(st.kf_t[nb]), Xw)
            uv1_d = _cm.project(self.cam, Xc1)
            uv2_d = _cm.project(self.cam, Xc2)
            # one batched fetch for the whole verification set
            uv1, uv2, valid, cosp, z1, z2, Xw = _jax.device_get(
                (uv1_d, uv2_d, valid, cosp, Xc1[:, 2], Xc2[:, 2], Xw))
            e1 = np.sum((uv1 - st.kf_kp_xy[kf_id][sel]) ** 2, -1)
            e2 = np.sum((uv2 - st.kf_kp_xy[nb][idx[sel]]) ** 2, -1)
            ok = (
                valid & (cosp < 0.9998) & (z1 > 0.05) & (z2 > 0.05)
                & (e1 < 5.991) & (e2 < 5.991)
            )
            good = np.nonzero(ok)[0]
            if len(good) == 0:
                continue
            pt_ids = st.alloc_pts(len(good))
            st.version += 1
            st.pt_xyz[pt_ids] = np.asarray(Xw)[good]
            st.pt_desc[pt_ids] = st.kf_kp_desc[kf_id][sel[good]]
            st.pt_mask[pt_ids] = True
            st.pt_ref_kf[pt_ids] = kf_id
            st.pt_first_kf[pt_ids] = kf_id
            st.pt_visible[pt_ids] = 1
            st.pt_found[pt_ids] = 1
            st.add_observations(kf_id, pt_ids, sel[good])
            st.add_observations(nb, pt_ids, idx[sel[good]])
            m1 = st.kf_kp_mask[kf_id] & (st.kf_kp_pt[kf_id] < 0)

    # ------------------------------------------------------------------
    def _dispatch_fuse(self, kf_id: int, max_neighbors: int = 5):
        """Dispatch half of fuse_neighbors: all neighbours matched in ONE
        vmapped device program; returns a ctx or None."""
        import jax.numpy as _j

        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=10)
        if len(covis) == 0:
            return None
        my_pts = st.kf_kp_pt[kf_id]
        my_sel = np.nonzero(my_pts >= 0)[0]
        if len(my_sel) == 0:
            return None
        pts = my_pts[my_sel]
        nbs = covis[:max_neighbors].astype(np.int64)
        # bucketed padding keeps the jitted program's shapes stable:
        # zero-padded points project behind the camera (z <= 0.05 gate),
        # padded neighbour rows carry an all-false keypoint mask. ONE
        # bucket (the per-KF keypoint capacity bounds len(pts)) — a mid-run
        # bucket growth would recompile for seconds over the tunnel
        B = max_neighbors
        Pb = _bucket(len(pts), max(1024, self.store.n_kp))
        xyz = np.zeros((Pb, 3), np.float32)
        desc = np.zeros((Pb, 8), np.uint32)
        xyz[: len(pts)] = st.pt_xyz[pts]
        desc[: len(pts)] = st.pt_desc[pts]
        nb_pad = np.concatenate([nbs, np.zeros(B - len(nbs), np.int64)])
        kp_mask = st.kf_kp_mask[nb_pad].copy()
        kp_mask[len(nbs):] = False
        out = _fuse_match_batch(
            self.cam,
            _j.asarray(st.kf_R[nb_pad]), _j.asarray(st.kf_t[nb_pad]),
            _j.asarray(xyz), _j.asarray(desc),
            _j.asarray(st.kf_kp_xy[nb_pad]), _j.asarray(st.kf_kp_desc[nb_pad]),
            _j.asarray(st.kf_kp_octave[nb_pad]), _j.asarray(kp_mask),
        )
        return {"out": out, "nbs": nbs, "pts": pts}

    def _apply_fuse(self, kf_id: int, ctx, fetched):
        """Apply half of fuse_neighbors (store mutation)."""
        st = self.store
        nbs, pts = ctx["nbs"], ctx["pts"]
        idx_all = np.asarray(fetched)[:, : len(pts)]
        for bi, nb in enumerate(nbs):
            idx = idx_all[bi]
            hit = np.nonzero(idx >= 0)[0]
            for h in hit:
                p = int(pts[h])
                other = int(st.kf_kp_pt[nb, idx[h]])
                if other < 0:
                    # new observation of p in the neighbour
                    if st.pt_mask[p]:
                        st.add_observations(nb, np.asarray([p]),
                                            np.asarray([idx[h]]))
                elif other != p and st.pt_mask[p] and st.pt_mask[other]:
                    if st.pt_n_obs[p] >= st.pt_n_obs[other]:
                        st.replace_point(other, p)
                    else:
                        st.replace_point(p, other)

    def fuse_neighbors(self, kf_id: int, max_neighbors: int = 5):
        """Merge duplicate landmarks between the new KF and its covisible
        neighbours (reference: LocalMapping::SearchInNeighbors + Fuse,
        src/LocalMapping.cc:144 / ORBmatcher::Fuse)."""
        import jax as _jax

        ctx = self._dispatch_fuse(kf_id, max_neighbors)
        if ctx is None:
            return
        self._apply_fuse(kf_id, ctx, _jax.device_get(ctx["out"]))

    # ------------------------------------------------------------------
    def cull_keyframes(self, kf_id: int):
        """Remove redundant keyframes: >=90%% of their landmarks observed by
        >=3 other keyframes (reference: LocalMapping::KeyFrameCulling)."""
        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=10)
        okf, opt, _ = st.live_obs()
        iner = self.inertial
        iner_active = iner is not None and len(
            getattr(iner, "kf_chain", ())) > 0
        for kc in covis:
            kc = int(kc)
            if kc == 0 or kc == kf_id or st.kf_fixed[kc]:
                continue
            pts = opt[okf == kc]
            if len(pts) < 20:
                continue
            redundant = (st.pt_n_obs[pts] >= 4).mean()
            if redundant > 0.9:
                if iner_active:
                    # inertial map: only interior chain nodes whose merged
                    # preintegration span stays below the temporal bound
                    # may go (reference: KeyFrameCulling inertial branch)
                    gap = iner.max_cull_gap(kc)
                    if gap is None or gap > self.inertial_max_gap:
                        continue
                st.remove_keyframe(kc)
                if iner_active:
                    iner.remove_keyframe(kc)
                if self.kfdb is not None:
                    self.kfdb.remove(kc)

    # ------------------------------------------------------------------
    def cull_lines(self, kf_id: int):
        """Line-landmark culling mirroring MapLineCulling (reference:
        src/LocalMapping.cc MapLineCulling)."""
        st = self.store
        lns = np.nonzero(st.ln_mask)[0]
        if len(lns) == 0:
            return
        ratio = st.ln_found[lns] / np.maximum(st.ln_visible[lns], 1)
        age = kf_id - st.ln_first_kf[lns]
        bad = (ratio < 0.25) & (st.ln_visible[lns] >= 8)
        # age >= 4 (not 3): under the interleaved backend the fuse stage
        # that attaches a second observation can land up to 3 frames after
        # the keyframe (frame-count stage deadline) — culling at 3 raced
        # it and the live-line count wobbled under the 100-line bar
        bad |= (age >= 4) & (st.ln_n_obs[lns] <= 1) & (st.ln_visible[lns] >= 6)
        st.remove_lines(lns[bad])

    # ------------------------------------------------------------------
    def cull_points(self, kf_id: int):
        """Remove unreliable recent points (reference:
        LocalMapping::MapPointCulling — found/visible ratio < 0.25, or too
        few observations a few KFs after creation)."""
        st = self.store
        pts = np.nonzero(st.pt_mask)[0]
        if len(pts) == 0:
            return
        ratio = st.pt_found[pts] / np.maximum(st.pt_visible[pts], 1)
        age = kf_id - st.pt_first_kf[pts]  # in KF ids (approximate KF count)
        bad = (ratio < 0.25) & (st.pt_visible[pts] >= 8)
        bad |= (age >= 3) & (st.pt_n_obs[pts] <= 1) & (st.pt_visible[pts] >= 6)
        # never cull landmarks of a frozen loaded map (their counters are
        # historical; the reference likewise leaves loaded maps untouched)
        ref = np.clip(st.pt_ref_kf[pts], 0, st.max_kf - 1)
        bad &= ~st.kf_fixed[ref]
        st.remove_points(pts[bad])

    # ------------------------------------------------------------------
    def local_ba(self, kf_id: int, extra_fetch=None):
        ctx = self._ba_dispatch_local(kf_id)
        if ctx is None:
            return None
        solved, extra = _jax.device_get((ctx["outs"], extra_fetch))
        with self.store.lock:
            self._ba_apply(ctx, solved)
        return extra

    def _ba_dispatch_local(self, kf_id: int):
        st = self.store
        covis, _ = st.covisibility(kf_id, min_weight=10)
        window = np.concatenate(
            [[kf_id], covis[: self.window_size]]).astype(np.int64)
        # 5 LM x 14 CG: the windowed solve re-runs every keyframe, so its
        # marginal accuracy past this budget is noise while its device time
        # is the largest backend kernel (the reference's local BA likewise
        # runs a short 5-iteration schedule, src/Optimizer.cc:3198).
        # NOTE: the schur_direct mode (explicit reduced-camera system,
        # ba.bundle_adjust) converges in fewer inner iterations but its
        # exact-assembly scans + dense coupling build measured 38 ms/LM on
        # the chip vs ~6 ms for this matrix-free path — block-Jacobi CG
        # stays the product path; schur=True remains available
        return self._ba_dispatch(window, num_iters=5, cg_iters=14)

    def warm_ba_buckets(self, kf_id: int | None = None):
        """Precompile the windowed-BA executable at the NEXT capacity
        buckets above the current map's problem shape. A growing map can
        cross an observation/point bucket boundary mid-sequence, and the
        resulting XLA compile (~10 s through the tunnel backend) lands in
        the tracking loop; warming the ladder here (prepass / startup)
        moves that cost out of the realtime path. Iteration counts are
        dynamic (ba.bundle_adjust_jit), so one compile per shape covers
        every LM/CG budget."""
        import jax as _jax

        st = self.store
        if kf_id is None:
            live = np.nonzero(st.kf_mask)[0]
            if len(live) == 0:
                return
            kf_id = int(live[-1])
        with st.lock:
            packed = self._gather_ba(np.sort(st.kfs_of_map(
                st.active_map)).astype(np.int64))
        if packed is None:
            return
        prob = packed[0]

        def pad(arr, mult, fill=0):
            n = arr.shape[0]
            extra = jnp.full((n * (mult - 1),) + arr.shape[1:], fill,
                             arr.dtype)
            return jnp.concatenate([arr, extra], 0)

        # the realistic crossings: observations double first (each new KF
        # adds ~n_kp rows), then points; the line blocks sit at floors a
        # 128-line capacity can never cross (Lb>=512, Mlb>=2048), so their
        # shapes are left exactly as the runtime produces them
        for pm, mm in ((1, 2), (2, 2)):
            prob2 = prob._replace(
                points=pad(prob.points, pm),
                point_mask=pad(prob.point_mask, pm),
                obs_cam=pad(prob.obs_cam, mm),
                obs_pt=pad(prob.obs_pt, mm),
                obs_uvr=pad(prob.obs_uvr, mm, -1.0),
                obs_inv_sigma2=pad(prob.obs_inv_sigma2, mm, 1.0),
                obs_mask=pad(prob.obs_mask, mm),
            )
            out = ba.bundle_adjust_jit(self.cam, prob2, num_iters=1,
                                       cg_iters=1, scatter_free=True)
            _jax.block_until_ready(out[0])

    def global_ba_dispatch(self, map_id: int | None = None,
                           num_iters: int = 10):
        """Dispatch-only global BA (reference: RunGlobalBundleAdjustment
        runs in a DETACHED thread after CorrectLoop, src/LoopClosing.cc:
        1652-1663 — tracking is never blocked on it). The staged backend
        yields on the returned ctx's fetch and applies it a few frames
        later via :meth:`_ba_apply`; the stale-slot guard in _apply_ba
        protects against keyframes culled/reallocated in between."""
        st = self.store
        if map_id is None:
            map_id = st.active_map
        window = np.sort(st.kfs_of_map(map_id)).astype(np.int64)
        return self._ba_dispatch(window, num_iters=num_iters, cg_iters=30,
                                 use_mesh=self.mesh is not None)

    def global_ba(self, map_id: int | None = None, num_iters: int = 10):
        """Full bundle adjustment over every live keyframe of a map
        (reference: Optimizer::GlobalBundleAdjustemnt src/Optimizer.cc:459,
        dispatched by LoopClosing::RunGlobalBundleAdjustment after a loop
        closure). With a ``mesh`` (SystemConfig.sharded_backend) the solve
        runs on the observation-sharded SPMD backend."""
        st = self.store
        if map_id is None:
            map_id = st.active_map
        window = np.sort(st.kfs_of_map(map_id)).astype(np.int64)
        # all KFs free; the gauge anchor falls out below (oldest KF fixed
        # when no out-of-window observer exists)
        return self._window_ba(window, num_iters=num_iters,
                               use_mesh=self.mesh is not None)

    def _window_ba(self, window: np.ndarray, num_iters: int = 6,
                   cg_iters: int = 30, use_mesh: bool = False,
                   extra_fetch=None):
        """Windowed LM solve. ``extra_fetch``: an unrelated in-flight device
        output to fetch in the SAME device_get as the solve results (round
        trips, not kernel time, are the backend budget); returned fetched,
        or None when the solve was skipped."""
        ctx = self._ba_dispatch(window, num_iters=num_iters,
                                cg_iters=cg_iters, use_mesh=use_mesh)
        if ctx is None:
            return None
        # ONE await for the whole solve: cost + every solved block (+ any
        # piggybacked unrelated output) in a single device_get (each extra
        # await pays the link's ~25 ms flat)
        solved, extra = _jax.device_get((ctx["outs"], extra_fetch))
        with self.store.lock:
            self._ba_apply(ctx, solved)
        return extra

    def _ba_dispatch(self, window: np.ndarray, num_iters: int = 6,
                     cg_iters: int = 30, use_mesh: bool = False,
                     schur: bool = False):
        """Dispatch half of the windowed LM solve: snapshot, queue EVERY
        LM iteration on the device, return a ctx whose ``outs`` await to
        the solved blocks (staged/interleaved callers fetch them on a
        helper thread and call :meth:`_ba_apply` a stage later)."""
        with self.store.lock:
            packed = self._gather_ba(window)
        if packed is None:
            return None
        prob, cams, pts, lns, fixed_mask, K = packed

        # chunked LM with abort polling between chunks: a freshly queued
        # keyframe interrupts the solve after the current chunk (reference:
        # mbAbortBA checked between g2o iterations)
        done = 0
        info = {"cost": np.inf}
        while done < num_iters:
            # without an abort hook (synchronous runtime) run every LM
            # iteration in one dispatch — chunking exists only so the async
            # mapper can honor an interrupt between chunks (reference:
            # mbAbortBA), and each chunk boundary costs a device round trip
            it = (num_iters - done if self.abort_check is None
                  else min(self.ba_chunk_iters, num_iters - done))
            if use_mesh:
                from ..parallel import sharded_ba

                Rn, tn, pn, lXsn, lXen, info = \
                    sharded_ba.bundle_adjust_sharded(
                        self.cam, prob, self.mesh, num_iters=it,
                        cg_iters=cg_iters)
            else:
                Rn, tn, pn, lXsn, lXen, info = ba.bundle_adjust_jit(
                    self.cam, prob, num_iters=it, cg_iters=cg_iters,
                    scatter_free=True, schur_direct=schur)
            prob = prob._replace(R=Rn, t=tn, points=pn,
                                 lines_Xs=lXsn, lines_Xe=lXen)
            done += it
            if self.abort_check is not None and self.abort_check():
                break
        return {"outs": (prob.R, prob.t, prob.points, prob.lines_Xs,
                         prob.lines_Xe, info["cost"]),
                "cams": cams, "pts": pts, "lns": lns,
                "fixed": fixed_mask, "K": K,
                # slot-identity snapshot: a deferred apply (interleaved /
                # detached global BA) must not write a slot that was culled
                # and REUSED by a different keyframe in the meantime
                "cam_fid": self.store.kf_frame_id[cams].copy()}

    def _ba_apply(self, ctx, solved):
        """Apply half: write the solved blocks back (caller holds the store
        lock). A non-finite cost (diverged/degenerate solve) applies
        nothing, like the reference discarding a failed g2o solve."""
        Rn, tn, pn, lXs, lXe, cost = solved
        if not np.isfinite(float(cost)):
            return
        fixed = ctx["fixed"]
        fid = ctx.get("cam_fid")
        if fid is not None:
            st = self.store
            cams = ctx["cams"]
            # freeze (skip) any slot whose keyframe identity changed since
            # dispatch: culled + reallocated slots belong to a DIFFERENT
            # keyframe now and must not receive this solve's pose
            stale = (~st.kf_mask[cams]) | (st.kf_frame_id[cams] != fid)
            if stale.any():
                fixed = fixed | stale
                if fixed.all():
                    return
        self._apply_ba((Rn, tn, pn, lXs, lXe), ctx["cams"], ctx["pts"],
                       ctx["lns"], fixed, ctx["K"])

    def _apply_ba(self, fetched, cams, pts, lns, fixed_mask, K):
        st = self.store
        Rn, tn, pn, lXs, lXe = fetched
        free = ~fixed_mask
        st.kf_R[cams[free]] = Rn[:K][free]
        st.kf_t[cams[free]] = tn[:K][free]
        alive = st.pt_mask[pts]
        st.version += 1
        st.pt_xyz[pts[alive]] = pn[: len(pts)][alive]
        if len(lns):
            lalive = st.ln_mask[lns]
            st.ln_Xs[lns[lalive]] = lXs[: len(lns)][lalive]
            st.ln_Xe[lns[lalive]] = lXe[: len(lns)][lalive]

    def _gather_ba(self, window: np.ndarray):
        """Snapshot the window problem (held lock); returns
        (prob, cams, pts, lns, fixed_mask, K) or None."""
        st = self.store
        if len(window) < 2:
            return None
        pts = st.points_in_kfs(window)
        pts = pts[st.pt_mask[pts]]
        if len(pts) < 20:
            return

        okf, opt, okp = st.live_obs()
        in_pts = np.isin(opt, pts)
        obs_kfs_of_pts = np.unique(okf[in_pts])
        fixed = np.setdiff1d(obs_kfs_of_pts, window)[: self.fixed_cap]
        cams = np.concatenate([window, fixed])
        K = len(cams)
        kf_local = np.full(st.max_kf, -1, np.int64)
        kf_local[cams] = np.arange(K)
        pt_local = np.full(st.max_pts, -1, np.int64)
        pt_local[pts] = np.arange(len(pts))

        sel = in_pts & np.isin(okf, cams)
        o_kf, o_pt, o_kp = okf[sel], opt[sel], okp[sel]
        M = len(o_kf)
        if M < 40:
            return

        # fixed mask: out-of-window observers + the oldest window KF when no
        # external anchor exists (gauge freedom) + frozen loaded-map KFs
        # (reference: mbFixed keyframes stay fixed vertices,
        # src/System.cc:212-216)
        fixed_mask = np.zeros((K,), bool)
        fixed_mask[len(window):] = True
        fixed_mask |= st.kf_fixed[cams]
        if len(fixed) == 0 and not fixed_mask.any():
            fixed_mask[np.argmin(st.kf_frame_id[window])] = True
        if fixed_mask.all():
            return  # nothing free to optimize (fully frozen window)

        if self.fixed_shapes:
            Kb = _bucket(K, 32)
            Pb = _bucket(len(pts), 4096)
            Mb = _bucket(M, 16384)
        else:
            Kb = _bucket(K, 16)
            Pb = _bucket(len(pts), 256)
            Mb = _bucket(M, 1024)

        R = np.tile(np.eye(3, dtype=np.float32), (Kb, 1, 1))
        t = np.zeros((Kb, 3), np.float32)
        R[:K] = st.kf_R[cams]
        t[:K] = st.kf_t[cams]
        fixed_pad = np.ones((Kb,), bool)
        fixed_pad[:K] = fixed_mask
        cam_mask = np.zeros((Kb,), bool)
        cam_mask[:K] = True

        points = np.zeros((Pb, 3), np.float32)
        points[: len(pts)] = st.pt_xyz[pts]
        pt_mask = np.zeros((Pb,), bool)
        pt_mask[: len(pts)] = True

        obs_cam = np.zeros((Mb,), np.int32)
        obs_pt = np.zeros((Mb,), np.int32)
        obs_uvr = np.full((Mb, 3), -1.0, np.float32)
        obs_is2 = np.ones((Mb,), np.float32)
        obs_mask = np.zeros((Mb,), bool)
        obs_cam[:M] = kf_local[o_kf]
        obs_pt[:M] = pt_local[o_pt]
        obs_uvr[:M] = st.kf_kp_uvr[o_kf, o_kp]
        octv = st.kf_kp_octave[o_kf, o_kp].astype(np.float32)
        obs_is2[:M] = self.scale ** (-2.0 * octv)
        obs_mask[:M] = True

        line_kw = {}
        lns = np.zeros((0,), np.int64)
        if self.use_lines and (st.num_lines > 0 or self.fixed_shapes):
            from ..features import lines as lines_mod

            lns = st.lines_in_kfs(window)
            lns = lns[st.ln_mask[lns]]
            # single-observation lines stay at their creation geometry: BA
            # rows from one view cannot determine 6 endpoint dofs and would
            # only let them drift (the reference likewise optimizes lines
            # with >= 2 observations)
            lns = lns[st.ln_n_obs[lns] >= 2]
            lkf, lln, lkl = st.live_line_obs()
            lsel = np.isin(lln, lns) & np.isin(lkf, cams)
            lo_kf, lo_ln, lo_kl = lkf[lsel], lln[lsel], lkl[lsel]
            Ml = len(lo_kf)
            # under fixed_shapes the line blocks are ALWAYS present (masked
            # empty when the window has no usable lines): a with-lines and a
            # points-only variant would be two multi-second XLA compiles,
            # and which one a keyframe needs is content-dependent
            if (len(lns) >= 4 and Ml >= 8) or self.fixed_shapes:
                ln_local = np.full(st.max_lines, -1, np.int64)
                ln_local[lns] = np.arange(len(lns))
                # floors sized to the window's worst case (window_size+1
                # KFs x max keylines): a mid-run bucket crossing costs a
                # multi-second compile inside the tracking loop
                Lb = _bucket(len(lns), 512 if self.fixed_shapes else 64)
                Mlb = _bucket(Ml, 2048 if self.fixed_shapes else 256)
                lXs = np.zeros((Lb, 3), np.float32)
                lXe = np.zeros((Lb, 3), np.float32)
                lXs[: len(lns)] = st.ln_Xs[lns]
                lXe[: len(lns)] = st.ln_Xe[lns]
                lmask = np.zeros((Lb,), bool)
                lmask[: len(lns)] = True
                lobs_cam = np.zeros((Mlb,), np.int32)
                lobs_line = np.zeros((Mlb,), np.int32)
                lobs_nld = np.zeros((Mlb, 3), np.float32)
                lobs_is2 = np.ones((Mlb,), np.float32)
                lobs_m = np.zeros((Mlb,), bool)
                lobs_cam[:Ml] = kf_local[lo_kf]
                lobs_line[:Ml] = ln_local[lo_ln]
                sp = st.kf_kl_sp[lo_kf, lo_kl]
                ep = st.kf_kl_ep[lo_kf, lo_kl]
                # host-side normalized image line (nx, ny, d): an EAGER
                # device call here would compile fresh primitives for every
                # distinct Ml (a ~4.5 s stall per new line-observation
                # count, measured — eager ops on the tunneled backend
                # compile per shape)
                dvec = ep - sp
                nrm = np.stack([-dvec[:, 1], dvec[:, 0]], -1)
                nrm = nrm / np.maximum(
                    np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-9)
                lobs_nld[:Ml] = np.concatenate(
                    [nrm, -np.sum(nrm * sp, -1, keepdims=True)],
                    axis=-1).astype(np.float32)
                # length-scaled information (short segments carry more
                # angular noise on the inferred infinite line)
                mlen = np.linalg.norm(ep - sp, axis=-1)
                lobs_is2[:Ml] = np.clip((mlen / 40.0) ** 2, 0.1, 4.0)
                lobs_m[:Ml] = True
                lobs_z = np.zeros((Mlb, 2), np.float32)
                lobs_z[:Ml] = st.kf_kl_depth[lo_kf, lo_kl]
                line_kw = dict(
                    lines_Xs=jnp.asarray(lXs), lines_Xe=jnp.asarray(lXe),
                    line_mask=jnp.asarray(lmask),
                    lobs_cam=jnp.asarray(lobs_cam),
                    lobs_line=jnp.asarray(lobs_line),
                    lobs_nld=jnp.asarray(lobs_nld),
                    lobs_inv_sigma2=jnp.asarray(lobs_is2),
                    lobs_mask=jnp.asarray(lobs_m),
                    lobs_depth=jnp.asarray(lobs_z),
                )
            else:
                lns = np.zeros((0,), np.int64)

        prob = ba.make_problem(
            jnp.asarray(R), jnp.asarray(t), jnp.asarray(fixed_pad),
            jnp.asarray(points),
            jnp.asarray(obs_cam), jnp.asarray(obs_pt), jnp.asarray(obs_uvr),
            jnp.asarray(obs_is2), jnp.asarray(obs_mask),
            cam_mask=jnp.asarray(cam_mask), point_mask=jnp.asarray(pt_mask),
            **line_kw,
        )
        import os as _os

        if _os.environ.get("PLVS_DEBUG_BA_SHAPES"):
            import sys as _sys

            sig = {f: (tuple(getattr(prob, f).shape),
                       str(getattr(prob, f).dtype))
                   for f in prob._fields}
            print(f"BA problem shapes: {sig}", file=_sys.stderr)
        return prob, cams, pts, lns, fixed_mask, K
