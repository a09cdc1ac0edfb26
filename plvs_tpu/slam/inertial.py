"""Inertial runtime: IMU queueing, state prediction, init scheduling, VI-BA
window assembly.

TPU-native re-derivation of the reference's inertial plumbing
(reference: Tracking::GrabImuData/PreintegrateIMU/PredictStateIMU
src/Tracking.cc:1913-2034; LocalMapping::InitializeIMU
src/LocalMapping.cc:2164-2300 staged at t≈0/5/15 s; LocalInertialBA
dispatch :187-192). The host queues raw samples; preintegration runs as
one scan per frame gap; initialization reuses the inertial-only GN solve;
after init the local-mapping window optimizes with the VI-BA solver.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import lie
from ..imu import initialization as imu_init
from ..imu import preintegration as pre
from ..solvers import vi_ba


@dataclasses.dataclass
class InertialRuntime:
    calib: pre.ImuCalib = dataclasses.field(default_factory=pre.ImuCalib)
    R_cb: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(3, dtype=np.float32))
    t_cb: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    init_min_kfs: int = 6
    init_min_time: float = 1.5    # min seconds of preintegrated data
    init_refine_until: float = 6.0  # keep re-estimating until this much data
    # per-frame pose-prior inflation: uncertainty of the (unmarginalized)
    # last-frame velocity estimate and floors for its pose. The velocity
    # comes from finite-differencing consecutive tracked poses, so its
    # noise is ~sqrt(2)*sigma_pose*fps — the POSITION prior must stay weak
    # or it drags every solve toward a correlated-noise prediction; the
    # ROTATION prior is the gyro's strength and stays tight.
    prior_vel_sigma: float = 0.15   # m/s
    prior_pos_floor: float = 0.005  # m
    prior_rot_floor: float = 0.002  # rad
    # per-frame marginalized-IMU term in the tracking solves (reference:
    # PoseInertialOptimizationLastFrame); False = IMU only shapes the
    # motion-model prediction (the pre-r3 behavior, kept for comparison)
    per_frame_prior: bool = True
    # metric scale: stereo/RGB-D maps are born metric (scale fixed); a
    # MONOCULAR map's scale is a free variable of the inertial-only
    # optimization and the whole map is rescaled on (re-)initialization
    # (reference: InitializeIMU's mbMonocular scale estimate +
    # ScaleRefinement, src/LocalMapping.cc:2164-2300, 2512-2544)
    fix_scale: bool = True

    def __post_init__(self):
        self.samples: list[tuple[float, np.ndarray, np.ndarray]] = []
        self.kf_preint: dict[int, pre.Preintegrated] = {}  # kf -> preint since prev KF
        self.kf_chain: list[int] = []
        self.kf_velocity: dict[int, np.ndarray] = {}
        # raw measurement window behind each kf_preint entry (t0, list of
        # (t, gyro, acc)): keyframe culling re-chains the two adjacent
        # preintegrations by re-running the scan over the concatenated raw
        # window — exact, like the reference's Reintegrate/MergePrevious
        # (src/ImuTypes.cc); a few hundred samples per gap is trivial host
        # memory
        self.kf_raw: dict[int, tuple[float, list]] = {}
        self.bias_gyro = np.zeros(3, np.float32)
        self.bias_acc = np.zeros(3, np.float32)
        self.gravity: np.ndarray | None = None  # None until initialized
        self._since_kf: list[tuple[float, np.ndarray, np.ndarray]] = []
        self._last_frame_t: float | None = None
        self._frame_preint: pre.Preintegrated | None = None
        # world-frame body-velocity estimate carried between frames
        # (reference: Tracking keeps mVelocity / frame velocities and
        # PredictStateIMU propagates them, src/Tracking.cc:2034)
        self._cur_velocity: np.ndarray | None = None
        self._last_pose: tuple[float, np.ndarray] | None = None
        # scale correction applied to the map by the last (re-)init, for
        # the System to mirror onto the tracker state / trajectory buffers
        self._pending_scale: float | None = None
        # one-entry host cache of the current frame-gap preintegration's
        # bias-corrected deltas: every consumer (rotation prediction, full
        # state prediction, the per-frame prior) shares ONE device await
        self._deltas_cache: tuple | None = None

    def consume_scale_correction(self) -> float | None:
        """Scale factor the map was just multiplied by (None if none)."""
        s, self._pending_scale = self._pending_scale, None
        return s

    @property
    def initialized(self) -> bool:
        return self.gravity is not None

    # ------------------------------------------------------------------
    def add_samples(self, samples):
        """samples: iterable of (t, gyro[3], acc[3]) (reference:
        Tracking::GrabImuData)."""
        for t, w, a in samples:
            s = (float(t), np.asarray(w, np.float32), np.asarray(a, np.float32))
            self.samples.append(s)
            self._since_kf.append(s)

    def preintegrate_frame_gap(self, t0: float, t1: float) -> pre.Preintegrated | None:
        """Preintegrate all samples in (t0, t1] (reference:
        Tracking::PreintegrateIMU)."""
        sel = [(t, w, a) for t, w, a in self.samples if t0 < t <= t1]
        return self._preintegrate_raw(t0, sel)

    def _preintegrate_raw(self, t0: float, sel) -> pre.Preintegrated | None:
        if len(sel) < 2:
            return None
        gy = np.stack([s[1] for s in sel]).astype(np.float32)
        ac = np.stack([s[2] for s in sel]).astype(np.float32)
        ts = np.asarray([s[0] for s in sel])
        dts = np.diff(ts, prepend=t0).astype(np.float32)
        # jitted + bucket-padded: the eager scan compiled per distinct
        # sample count and dispatched per primitive through the tunnel —
        # the dominant stall of the realtime VI path (measured)
        return pre.preintegrate_padded(gy, ac, dts, self.bias_gyro,
                                       self.bias_acc, self.calib)

    # ------------------------------------------------------------------
    def _fetch_deltas(self, p: pre.Preintegrated):
        """(dR, dV, dP, dT, cov) of ``p`` as host arrays — computed in one
        jitted program and fetched in one await, cached per preintegration
        object (rotation prediction, state prediction and the per-frame
        prior all consume the same gap)."""
        if self._deltas_cache is not None and self._deltas_cache[0] is p:
            return self._deltas_cache[1]
        out = jax.device_get(pre.deltas_jit(
            p, jnp.asarray(self.bias_gyro), jnp.asarray(self.bias_acc)))
        out = tuple(np.asarray(o) for o in out)
        self._deltas_cache = (p, out)
        return out

    def predict_rotation(self, R_cw: np.ndarray, p: pre.Preintegrated) -> np.ndarray:
        """Gyro-only camera rotation prediction for guided matching
        (reference: PredictStateIMU's rotation part, robust even before
        full inertial init). R_cw' = R_cb dR^T R_bc R_cw."""
        dR = self._fetch_deltas(p)[0]
        R_bw = self.R_cb.T @ R_cw  # body-from-world... (R_cb maps body->cam)
        R_bw_new = dR.T @ R_bw
        return (self.R_cb @ R_bw_new).astype(np.float32)

    # ------------------------------------------------------------------
    def note_frame_pose(self, R_cw: np.ndarray, t_cw: np.ndarray,
                        timestamp: float) -> None:
        """Refresh the velocity estimate from consecutive tracked camera
        centers (the body-frame lever arm contributes negligibly at frame
        rate). Called by the System after a successful visual track."""
        C = (-R_cw.T @ t_cw).astype(np.float32)
        if self._last_pose is not None:
            t0, C0 = self._last_pose
            dt = timestamp - t0
            if 1e-4 < dt < 1.0:
                self._cur_velocity = ((C - C0) / dt).astype(np.float32)
        self._last_pose = (timestamp, C)

    # ------------------------------------------------------------------
    def predict_state(self, R_cw: np.ndarray, t_cw: np.ndarray,
                      p: pre.Preintegrated):
        """Full IMU state prediction (reference: Tracking::PredictStateIMU
        src/Tracking.cc:2034): propagate the body state through the
        bias-corrected preintegrated gap under the estimated gravity,
        then map back to a camera pose. Requires initialization and a
        velocity estimate; returns (R_cw', t_cw') or None."""
        if not self.initialized or self._cur_velocity is None:
            return None
        dR, dV, dP, dT, _ = self._fetch_deltas(p)
        dT = float(dT)
        # camera pose -> body state (T_bw = T_bc T_cw)
        R_bc = self.R_cb.T
        t_bc = -R_bc @ self.t_cb
        R_bw = R_bc @ R_cw
        t_bw = R_bc @ t_cw + t_bc
        R_wb = R_bw.T
        p_wb = -R_wb @ t_bw
        v = self._cur_velocity
        g = self.gravity
        # zero-residual propagation of imu.preintegration.inertial_residual
        R_wb2 = R_wb @ dR
        p_wb2 = p_wb + v * dT + 0.5 * g * dT * dT + R_wb @ dP
        self._cur_velocity = (v + g * dT + R_wb @ dV).astype(np.float32)
        R_bw2 = R_wb2.T
        t_bw2 = -R_bw2 @ p_wb2
        R_cw2 = (self.R_cb @ R_bw2).astype(np.float32)
        t_cw2 = (self.R_cb @ t_bw2 + self.t_cb).astype(np.float32)
        return R_cw2, t_cw2

    # ------------------------------------------------------------------
    def pose_prior_info(self, p: pre.Preintegrated) -> np.ndarray:
        """[6,6] information of the SE3 prior at the IMU-predicted camera
        pose — the per-frame marginalized inertial term (reference:
        PoseInertialOptimizationLastFrame's preintegration factor + prior,
        src/Optimizer.cc:10137). Built from the preintegration covariance:
        rotation from the δθ block, position from the δp block plus the
        velocity-estimate uncertainty propagated over the gap (the last
        frame state is treated as fixed with that inflation — the dominant
        marginalization effect at frame rate). Isotropic per block, so the
        camera/body frame change drops out."""
        _, _, _, dT, C = self._fetch_deltas(p)
        dT = float(dT)
        var_rot = float(np.trace(C[0:3, 0:3])) / 3.0 + self.prior_rot_floor ** 2
        var_pos = (float(np.trace(C[6:9, 6:9])) / 3.0
                   + (self.prior_vel_sigma * dT) ** 2
                   + self.prior_pos_floor ** 2)
        info = np.zeros((6, 6), np.float32)
        info[0, 0] = info[1, 1] = info[2, 2] = 1.0 / var_pos
        info[3, 3] = info[4, 4] = info[5, 5] = 1.0 / var_rot
        return info

    # ------------------------------------------------------------------
    def on_keyframe(self, kf_id: int, t_prev_kf: float | None, t_kf: float,
                    store) -> None:
        """Record the preintegration covering (prev KF, this KF]."""
        if kf_id in self.kf_chain:
            # slot reuse after keyframe culling — drop the stale history
            i = self.kf_chain.index(kf_id)
            for k in self.kf_chain[i:]:
                self.kf_preint.pop(k, None)
                self.kf_raw.pop(k, None)
            self.kf_chain = self.kf_chain[:i]
        if t_prev_kf is not None:
            sel = [(t, w, a) for t, w, a in self.samples
                   if t_prev_kf < t <= t_kf]
            p = self._preintegrate_raw(t_prev_kf, sel)
            if p is not None:
                self.kf_preint[kf_id] = p
                self.kf_raw[kf_id] = (t_prev_kf, sel)
        self.kf_chain.append(kf_id)
        # drop consumed samples (keep a small tail for overlap)
        self.samples = [s for s in self.samples if s[0] > t_kf - 0.5]
        # staged initialization (reference: InitializeIMU at t≈0/5/15 s):
        # wait for enough integrated time, then keep refining the estimate
        # while the window is still short
        # host-side total span (a float(p.dT) per entry would pay one
        # device fetch EACH): the raw windows carry the same timestamps
        total_t = float(sum(
            (raw[-1][0] - t0) for t0, raw in self.kf_raw.values() if raw))
        if len(self.kf_chain) >= self.init_min_kfs and (
            (not self.initialized and total_t >= self.init_min_time)
            or (self.initialized and total_t < self.init_refine_until)
        ):
            self._try_initialize(store)

    # ------------------------------------------------------------------
    def max_cull_gap(self, kc: int, default: float = 3.0) -> float | None:
        """Merged preintegration span (t_next - t_prev) that culling ``kc``
        would create, or None if kc is not an interior chain node. The
        caller gates culling on this staying short (reference:
        KeyFrameCulling's inertial branch only culls when the temporal
        neighbours are close in time, src/LocalMapping.cc)."""
        if kc not in self.kf_chain:
            return None
        i = self.kf_chain.index(kc)
        if i == 0 or i >= len(self.kf_chain) - 1:
            return None
        nxt = self.kf_chain[i + 1]
        if kc not in self.kf_raw or nxt not in self.kf_raw:
            return None
        t_prev = self.kf_raw[kc][0]
        raw_n = self.kf_raw[nxt][1]
        t_next = raw_n[-1][0] if raw_n else t_prev
        return float(t_next - t_prev)

    def remove_keyframe(self, kc: int) -> bool:
        """Re-chain the preintegrations across a culled keyframe: the next
        chain node's preintegration becomes the exact re-integration of the
        concatenated raw windows (prev, kc] + (kc, next] (reference:
        KeyFrameCulling's inertial branch merges the culled KF's
        preintegration into its next temporal neighbour,
        src/LocalMapping.cc; ImuTypes' MergePrevious/Reintegrate)."""
        if kc not in self.kf_chain:
            return False
        i = self.kf_chain.index(kc)
        if 0 < i < len(self.kf_chain) - 1:
            nxt = self.kf_chain[i + 1]
            if kc in self.kf_raw and nxt in self.kf_raw:
                t_prev, raw_a = self.kf_raw[kc]
                raw_b = self.kf_raw[nxt][1]
                merged = raw_a + raw_b
                p = self._preintegrate_raw(t_prev, merged)
                if p is not None:
                    self.kf_preint[nxt] = p
                    self.kf_raw[nxt] = (t_prev, merged)
        self.kf_chain.pop(i)
        self.kf_preint.pop(kc, None)
        self.kf_raw.pop(kc, None)
        self.kf_velocity.pop(kc, None)
        return True

    # ------------------------------------------------------------------
    def _try_initialize(self, store) -> bool:
        """Gravity/bias/velocity estimation over the KF chain (reference:
        LocalMapping::InitializeIMU; scale fixed for stereo/RGB-D)."""
        chain = [k for k in self.kf_chain if store.kf_mask[k]]
        pairs = [(a, b) for a, b in zip(chain[:-1], chain[1:])
                 if b in self.kf_preint]
        if len(pairs) < self.init_min_kfs - 1:
            return False
        kfs = [pairs[0][0]] + [b for _, b in pairs]
        R_wb, p_wb = [], []
        for k in kfs:
            R_cw = store.kf_R[k]
            t_cw = store.kf_t[k]
            R_wb.append((R_cw.T @ self.R_cb).astype(np.float32))
            # p_wb = camera center - R_wb t_cb... T_bw = T_bc T_cw
            R_bc = self.R_cb.T
            t_bc = -R_bc @ self.t_cb
            R_bw = R_bc @ R_cw
            t_bw = R_bc @ t_cw + t_bc
            p_wb.append((-R_bw.T @ t_bw).astype(np.float32))
        # jitted + chain-length bucketed: the eager solve recompiled on
        # every distinct chain length while the staged init refines
        out = imu_init.inertial_only_optimize_padded(
            np.stack(R_wb), np.stack(p_wb),
            [self.kf_preint[b] for _, b in pairs],
            fix_scale=self.fix_scale)
        if not bool(jnp.all(jnp.isfinite(out.gravity))):
            return False
        if not self.fix_scale:
            # monocular map: apply the estimated metric scale to the WHOLE
            # map (keyframe translations, landmarks, line endpoints) —
            # reference: InitializeIMU's map rescale + the periodic
            # ScaleRefinement pass (src/LocalMapping.cc:2164-2300,
            # 2512-2544). Re-initializations refine s toward 1.
            s = float(out.scale)
            if not np.isfinite(s) or not (0.05 < s < 20.0):
                return False
            if abs(s - 1.0) > 1e-3:
                store.rescale_map(s)
                self._pending_scale = (self._pending_scale or 1.0) * s
        self.gravity = np.asarray(out.gravity)
        self.bias_gyro = np.asarray(out.bias_gyro)
        self.bias_acc = np.asarray(out.bias_acc)
        for k, v in zip(kfs, np.asarray(out.velocities)):
            self.kf_velocity[k] = v.astype(np.float32)
        return True

    # ------------------------------------------------------------------
    def vi_local_ba(self, cam, store, kf_id: int, window: int = 8):
        """VI-BA over the temporal KF window ending at kf_id (reference:
        LocalInertialBA uses the temporally-connected recent keyframes)."""
        if not self.initialized:
            return False
        chain = [k for k in self.kf_chain if store.kf_mask[k]]
        if kf_id not in chain:
            return False
        end = chain.index(kf_id)
        kfs = chain[max(0, end - window + 1): end + 1]
        if len(kfs) < 3:
            return False
        # all consecutive pairs need preintegrations
        pres, pmask = [], []
        for a, b in zip(kfs[:-1], kfs[1:]):
            if b in self.kf_preint:
                pres.append(self.kf_preint[b])
                pmask.append(True)
            else:
                pres.append(jax.tree.map(jnp.zeros_like,
                                         next(iter(self.kf_preint.values()))))
                pmask.append(False)
        K = len(kfs)
        R_wb = np.zeros((K, 3, 3), np.float32)
        p_wb = np.zeros((K, 3), np.float32)
        v_w = np.zeros((K, 3), np.float32)
        R_bc = self.R_cb.T
        t_bc = -R_bc @ self.t_cb
        for i, k in enumerate(kfs):
            R_bw = R_bc @ store.kf_R[k]
            t_bw = R_bc @ store.kf_t[k] + t_bc
            R_wb[i] = R_bw.T
            p_wb[i] = -R_bw.T @ t_bw
            v_w[i] = self.kf_velocity.get(k, np.zeros(3, np.float32))

        # visual observations of the window
        okf, opt, okp = store.live_obs()
        sel = np.isin(okf, kfs)
        pts = np.unique(opt[sel])
        pts = pts[store.pt_mask[pts]]
        if len(pts) < 20:
            return False
        kf_local = {k: i for i, k in enumerate(kfs)}
        pt_local = np.full(store.max_pts, -1, np.int64)
        pt_local[pts] = np.arange(len(pts))
        sel = sel & np.isin(opt, pts)
        o_kf = np.asarray([kf_local[k] for k in okf[sel]], np.int32)
        o_pt = pt_local[opt[sel]].astype(np.int32)
        o_uvr = store.kf_kp_uvr[okf[sel], okp[sel]]
        M = len(o_kf)
        if M < 40:
            return False

        fixed = np.zeros((K,), bool)
        fixed[0] = True
        from ..imu.initialization import stack_preints

        # fixed-shape buckets (cf. LocalMapper._gather_ba): an exact-size
        # VI problem compiles once per (K, P, M) — through the tunnel each
        # is a multi-second stall inside the realtime VI loop. The
        # temporal window is the K bucket; points/observations pad to
        # power-of-two capacities with masked rows.
        from .local_mapping import _bucket

        Kb = max(window, K)
        Pb = _bucket(len(pts), 1024)
        Mb = _bucket(M, 4096)
        if Kb > K:
            pk = Kb - K
            R_wb = np.concatenate(
                [R_wb, np.tile(np.eye(3, dtype=np.float32)[None],
                               (pk, 1, 1))])
            p_wb = np.concatenate([p_wb, np.zeros((pk, 3), np.float32)])
            v_w = np.concatenate([v_w, np.zeros((pk, 3), np.float32)])
            fixed = np.concatenate([fixed, np.ones((pk,), bool)])
            zero_p = jax.tree.map(jnp.zeros_like, pres[0])
            pres = pres + [zero_p] * pk
            pmask = pmask + [False] * pk
        cam_mask = np.arange(Kb) < K
        P = len(pts)
        pt_xyz = np.zeros((Pb, 3), np.float32)
        pt_xyz[:P] = store.pt_xyz[pts]
        pt_mask = np.arange(Pb) < P
        o_kf = np.pad(o_kf, (0, Mb - M))
        o_pt = np.pad(o_pt, (0, Mb - M))
        o_uvr = np.pad(np.asarray(o_uvr, np.float32),
                       ((0, Mb - M), (0, 0)), constant_values=-1.0)
        o_is2 = np.ones((Mb,), np.float32)
        o_mask = np.arange(Mb) < M

        # line observations of the window: pose-constraining VI line edges
        # (reference: EdgeLineMono in LocalInertialBA, src/G2oLineTypes.cc)
        line_kw = {}
        if store.num_lines > 0:
            from ..features import lines as lines_mod

            lkf, lln, lkl = store.live_line_obs()
            lsel = np.isin(lkf, kfs) & store.ln_mask[
                np.clip(lln, 0, store.max_lines - 1)]
            if lsel.sum() >= 4:
                lo_kf = np.asarray([kf_local[k] for k in lkf[lsel]], np.int32)
                sp = store.kf_kl_sp[lkf[lsel], lkl[lsel]]
                ep = store.kf_kl_ep[lkf[lsel], lkl[lsel]]
                nld = np.asarray(lines_mod.line_nld(
                    jnp.asarray(sp), jnp.asarray(ep)))
                mlen = np.linalg.norm(ep - sp, axis=-1)
                nl = int(lsel.sum())
                nlb = _bucket(nl, 512)
                pl_ = ((0, nlb - nl), (0, 0))
                line_kw = dict(
                    lobs_kf=jnp.asarray(np.pad(lo_kf, (0, nlb - nl))),
                    lobs_Xs=jnp.asarray(np.pad(np.asarray(
                        store.ln_Xs[lln[lsel]], np.float32), pl_)),
                    lobs_Xe=jnp.asarray(np.pad(np.asarray(
                        store.ln_Xe[lln[lsel]], np.float32), pl_)),
                    lobs_nld=jnp.asarray(np.pad(
                        np.asarray(nld, np.float32), pl_)),
                    lobs_inv_sigma2=jnp.asarray(np.pad(np.asarray(
                        np.clip((mlen / 40.0) ** 2, 0.1, 4.0), np.float32),
                        (0, nlb - nl), constant_values=1.0)),
                    lobs_mask=jnp.asarray(np.arange(nlb) < nl),
                )

        prob = vi_ba.VIProblem(
            jnp.asarray(R_wb), jnp.asarray(p_wb), jnp.asarray(v_w),
            jnp.asarray(np.tile(self.bias_gyro, (Kb, 1))),
            jnp.asarray(np.tile(self.bias_acc, (Kb, 1))),
            jnp.asarray(fixed), jnp.asarray(cam_mask),
            jnp.asarray(self.R_cb), jnp.asarray(self.t_cb),
            jnp.asarray(pt_xyz), jnp.asarray(pt_mask),
            jnp.asarray(o_kf), jnp.asarray(o_pt), jnp.asarray(o_uvr),
            jnp.asarray(o_is2), jnp.asarray(o_mask),
            stack_preints(pres), jnp.asarray(pmask),
            jnp.asarray(self.gravity),
            **line_kw,
        )
        Rn, pn, vn, bgn, ban, ptsn, info = vi_ba.vi_bundle_adjust_jit(
            cam, prob, num_iters=6, cg_iters=30)
        if not np.isfinite(float(info["cost"])):
            return False
        Rn, pn, vn = np.asarray(Rn), np.asarray(pn), np.asarray(vn)
        for i, k in enumerate(kfs):
            if fixed[i]:
                continue
            R_bw = Rn[i].T
            t_bw = -R_bw @ pn[i]
            store.kf_R[k] = (self.R_cb @ R_bw).astype(np.float32)
            store.kf_t[k] = (self.R_cb @ t_bw + self.t_cb).astype(np.float32)
            self.kf_velocity[k] = vn[i].astype(np.float32)
        store.version += 1
        store.pt_xyz[pts] = np.asarray(ptsn)[: len(pts)]
        # While the staged initialization is still refining (short window),
        # the inertial-only solve — rerun on_keyframe with long-baseline
        # rotation edges — is the better bias estimator; VI-BA's window
        # biases random-walk within the anchor. Afterwards, track the last
        # keyframe's optimized bias (reference: Tracking predicts with the
        # last KF's bias, src/Tracking.cc PredictStateIMU).
        # host-side total span (a float(p.dT) per entry would pay one
        # device fetch EACH): the raw windows carry the same timestamps
        total_t = float(sum(
            (raw[-1][0] - t0) for t0, raw in self.kf_raw.values() if raw))
        if total_t >= self.init_refine_until:
            # last REAL keyframe (padded camera slots sit beyond K-1)
            self.bias_gyro = np.asarray(bgn)[K - 1].astype(np.float32)
            self.bias_acc = np.asarray(ban)[K - 1].astype(np.float32)
        return True
