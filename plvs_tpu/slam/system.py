"""System façade: wires the tracking front end, local mapping and map store.

TPU-native equivalent of the reference's System class
(reference: src/System.cc:82-443 — constructs Atlas/Tracking/LocalMapping/
LoopClosing and spawns their threads; per-sensor Track* entry points at
include/System.h:135-259; trajectory export :179-200). v1 runs local
mapping synchronously after each keyframe (the async actor pipeline arrives
with the parallel runtime); the public API mirrors the reference's.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..geometry import cameras as cam_mod
from ..geometry import lie
from . import frame as frame_mod
from .keyframe_database import KeyFrameDatabase
from .local_mapping import LocalMapper
from .loop_closing import LoopCloser
from .map_store import MapStore
from .tracking import OK, Tracker


_DECOMPRESS = None


def _pack_rgbd(gray: np.ndarray, depth: np.ndarray, dec: int = 1):
    """Host half of the packed upload: quantize (u8 gray / u16 millimeter
    depth — native sensor precision), decimate the depth map by ``dec``
    (fresh-content upload bandwidth through the tunnel is ~37 MB/s — the
    per-frame byte count IS the frame budget; depth is smooth and the
    consumers sample it at keypoints) and pack both into one uint32
    buffer. Returns None on unsupported geometry."""
    g8 = np.ascontiguousarray(np.asarray(gray))
    if g8.dtype != np.uint8:
        g8 = np.clip(g8, 0, 255).astype(np.uint8)
    h, w = g8.shape
    if h % 4 or h % dec or w % dec or (h // dec) % 2:
        return None
    # PLANE packing: byte p of word j is pixel p*n8+j (quarter-image
    # planes), NOT pixel 4j+p — the device unpack is then shifts + a
    # major-axis concat with no lane interleave (an interleaved layout
    # costs a ~3.4 ms relayout on the chip per frame; measured)
    q = g8.reshape(4, -1).astype(np.uint32)
    n8 = h * w // 4
    d = np.asarray(depth, np.float32)[::dec, ::dec]
    d16 = (np.clip(d, 0.0, 65.0) * 1000.0).astype(np.uint16)
    dh = d16.reshape(2, -1).astype(np.uint32)
    buf = np.empty(n8 + d.size // 2, np.uint32)
    buf[:n8] = q[0] | (q[1] << 8) | (q[2] << 16) | (q[3] << 24)
    buf[n8:] = dh[0] | (dh[1] << 16)
    return buf


def _upload_rgbd(gray: np.ndarray, depth: np.ndarray):
    """Packed single-RPC image upload + on-device decompression to f32.
    One transfer instead of two: through the tunnel's slow mode every
    blocking transfer costs a full round trip."""
    global _DECOMPRESS
    if _DECOMPRESS is None:
        import functools

        import jax

        @functools.partial(jax.jit, static_argnames=("h", "w"))
        def dec(buf, h, w):
            from .tracking import _decompress_packed

            return _decompress_packed(buf, h, w)

        _DECOMPRESS = dec
    buf = _pack_rgbd(gray, depth)
    if buf is None:
        # odd geometry: fall back to two plain transfers
        d16 = (np.clip(np.asarray(depth, np.float32), 0.0, 65.0)
               * 1000.0).astype(np.uint16)
        g8 = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
        return (jnp.asarray(g8.astype(np.float32)),
                jnp.asarray(d16.astype(np.float32) * 0.001))
    h, w = gray.shape
    return _DECOMPRESS(jnp.asarray(buf), h, w)


@dataclasses.dataclass
class SystemConfig:
    num_features: int = 1024
    n_levels: int = 8
    scale: float = 1.2
    max_kf: int = 512
    max_pts: int = 65536
    local_ba: bool = True
    loop_closing: bool = True
    dense_mapping: bool = False
    dense_voxel_size: float = 0.02
    dense_segmentation: bool = False
    # incremental-mesh cadence in keyframes (0 = mesh only on demand);
    # reference: the dense thread meshes continuously during a run
    dense_mesh_every: int = 1
    use_lines: bool = False
    max_lines: int = 128
    sensor: str = "rgbd"  # "rgbd" | "stereo" | "mono"
    use_imu: bool = False
    min_kf_inliers: int = 30
    kf_ratio: float = 0.75
    max_kf_interval: int = 10
    # atlas: park the map and start a new one after this many consecutive
    # lost frames (reference: 5 s relocalization deadline at 30 fps,
    # src/Tracking.cc:86); 0 disables multi-map
    new_map_after_lost: int = 150
    # pre-trained vocabulary (reference: ORBVocabulary load,
    # src/System.cc:158-196): .txt = DBoW2 text format, .npz = native dump;
    # None = train lazily from the first keyframes
    vocabulary_path: Optional[str] = None
    # input images (and intrinsics) rescaled by this factor before tracking
    # (reference: Camera.imageScale, Settings::readImageInfo)
    image_scale: float = 1.0
    # start in localization-only mode (reference: System localization mode)
    only_tracking: bool = False
    # fov-centers keyframe generation criterion (reference: yaml
    # KeyFrame.fovCentersBasedGeneration.on / maxFovCentersDistance)
    fov_centers_kf: bool = False
    max_fov_centers_distance: float = 0.4
    # run full-map bundle adjustment after each closed loop (reference:
    # LoopClosing::RunGlobalBundleAdjustment, src/LoopClosing.cc:1652-1663)
    global_ba_on_loop: bool = True
    # asynchronous mapper actor: local mapping / loop closing / dense
    # integration run on their own host thread, overlapped with tracking
    # (reference: the LocalMapping + LoopClosing + dense threads spawned in
    # System::System, src/System.cc:315-398). Off by default for
    # deterministic tests; the realtime entry points enable it.
    async_mapping: bool = False
    # deferred-resolution tracking pipeline: the fused per-frame solve is
    # fetched one frame late (depth-1 software pipeline), hiding the
    # remote-accelerator link's flat per-fetch latency. Matching semantics
    # are unchanged (each frame's candidates come from the RESOLVED
    # previous frame); Track* returns the predicted pose for the current
    # frame and the trajectory records resolved poses. Incompatible with
    # the inertial runtime (per-frame IMU state needs the final pose).
    pipelined: bool = False
    # in-flight window size: solves of up to this many frames are fetched
    # together in ONE stacked device->host transfer (the remote link's flat
    # per-fetch latency is the budget; depth N divides it by N at the cost
    # of up-to-N-frame-stale match candidates and KF decisions)
    pipeline_depth: int = 1
    # double-buffered resolve: the window's blocking device_get runs on a
    # helper thread so device execution + transfer of group N overlaps the
    # host-side finish of group N-1 and the assembly of group N+1 (all
    # dispatches and map mutations stay on the tracking thread). Raises
    # worst-case candidate staleness to 2*pipeline_depth frames.
    pipeline_overlap: bool = True
    # interleaved keyframe backend (pipelined mode, no actor): the per-KF
    # backend pass (local mapping, dense integrate+mesh, loop closing) is a
    # staged generator whose stages run BETWEEN frame dispatches on the
    # tracking thread, with the blocking fetches handed to a helper thread
    # — the tunnel-compatible equivalent of the reference's LocalMapping/
    # LoopClosing/dense threads (one submitting thread, overlapped awaits;
    # reference: tracking never waits for LocalMapping,
    # src/System.cc:315-317)
    interleaved_backend: bool = True
    # route the heavy global solves (global BA after loop closure, the
    # essential-graph correction) through the multi-device sharded backends
    # (plvs_tpu.parallel) over a mesh of all visible devices — the SPMD
    # equivalent of the reference's single-threaded g2o global solves
    # (SURVEY.md §5.8). No-op with one device.
    sharded_backend: bool = False
    # raise the backend solve-shape bucket floors so every realistic
    # local-BA/maintenance problem lands in ONE precompiled shape (a fresh
    # bucket mid-sequence pays a multi-second XLA compile inside the
    # tracking loop; the solves are latency-bound, so padding is nearly
    # free device-side). Realtime runs want this ON; tests keep small
    # shapes for fast CPU compiles.
    backend_fixed_shapes: bool = False
    # depth-map upload decimation on the packed fast path: depth ships at
    # 1/N resolution and is nearest-upsampled on device (fresh-content
    # upload bandwidth through a remote-device link is the per-frame
    # budget; depth is smooth and consumed at keypoint samples). 1 = full.
    depth_upload_decimation: int = 2
    # image-level stereo rectification for calibrated NON-rectified pairs
    # (reference: Camera.needRectification, src/Settings.cc:205-207,280):
    # both frames are warped through precomputed maps to a common
    # row-aligned pinhole pair, and the whole rectified fast path (row-scan
    # stereo matcher, dense census/SGM engine) applies. Alternative to the
    # keypoint-level rig path (which matches across the epipolar geometry
    # without warping).
    rectify: bool = False


class System:
    """RGB-D SLAM system (monocular/stereo variants arrive in later
    milestones; the RGB-D path exercises the full stack)."""

    # interleaved-backend backlog cap: queued keyframe generators beyond
    # this force synchronous catch-up steps (see _enqueue_backend)
    MAX_BACKEND_BACKLOG = 2
    # a backend stage whose helper-thread fetch is still pending after this
    # many _step_backend polls (2 per frame) is resumed anyway, blocking on
    # the fetch: stage advancement is thereby gated on FRAME COUNT, not
    # wall time, so backend progress — and hence map evolution and
    # accuracy — is load-independent up to a deterministic bound
    BACKEND_STAGE_DEADLINE = 10

    def __init__(self, cam: cam_mod.Camera, config: SystemConfig | None = None,
                 cam2: cam_mod.Camera | None = None, T_c1_c2=None,
                 imu_calib=None, imu_T_b_c=None):
        """``cam2``/``T_c1_c2`` declare a non-rectified stereo rig (e.g.
        a KB8 fisheye pair): T_c1_c2 is the 4x4 right-to-left transform
        X_c1 = T X_c2 (reference: Settings::readCamera2 + Stereo.T_c1_c2,
        src/Settings.cc:325,404-409).

        ``imu_calib`` (ImuCalib noise densities) and ``imu_T_b_c`` (4x4
        camera-in-body extrinsic, X_b = T X_c; reference: IMU.T_b_c1,
        Settings::readIMU) configure the inertial runtime when
        ``config.use_imu`` is set."""
        self._base_cam = cam
        # full constructor snapshot so reset() can rebuild an identical
        # system (a stereo-rig or inertial system must not silently degrade
        # to monocular-intrinsics RGB-D on reset)
        self._ctor_args = dict(cam=cam, config=config, cam2=cam2,
                               T_c1_c2=T_c1_c2, imu_calib=imu_calib,
                               imu_T_b_c=imu_T_b_c)
        self.config = config or SystemConfig()
        c = self.config
        if c.image_scale != 1.0:
            cam = cam_mod.scale_camera(cam, c.image_scale)
            if cam2 is not None:
                cam2 = cam_mod.scale_camera(cam2, c.image_scale)
        self.rectifier = None
        if c.rectify and cam2 is not None and T_c1_c2 is not None:
            from ..geometry.rectify import StereoRectifier

            self.rectifier = StereoRectifier(cam, cam2,
                                             np.asarray(T_c1_c2, np.float32))
            cam = self.rectifier.cam       # common row-aligned pinhole
            cam2 = None                    # downstream sees rectified stereo
            T_c1_c2 = None
        self.cam = cam
        self.cam2 = cam2
        self.R_lr = self.t_lr = None
        if T_c1_c2 is not None:
            T = np.asarray(T_c1_c2, np.float32)
            self.R_lr = T[:3, :3].copy()
            self.t_lr = T[:3, 3].copy()
        self.store = MapStore(max_kf=c.max_kf, max_pts=c.max_pts, n_kp=c.num_features)
        self.kfdb = KeyFrameDatabase(self.store)
        if c.vocabulary_path:
            from ..vocab import bow

            if c.vocabulary_path.endswith(".txt"):
                self.kfdb.voc = bow.load_dbow2_text(c.vocabulary_path)
            else:
                try:
                    self.kfdb.voc = bow.Vocabulary.load(c.vocabulary_path)
                except (KeyError, ValueError):
                    self.kfdb.voc = bow.GeneralVocabulary.load(c.vocabulary_path)
        self.tracker = Tracker(
            cam, self.store, num_features=c.num_features,
            min_kf_inliers=c.min_kf_inliers, kf_ratio=c.kf_ratio,
            max_kf_interval=c.max_kf_interval, use_lines=c.use_lines,
            kfdb=self.kfdb, sensor=c.sensor,
            new_map_after_lost=c.new_map_after_lost,
            fov_centers_kf=c.fov_centers_kf,
            max_fov_centers_distance=c.max_fov_centers_distance,
            min_init_pts=(
                # a non-rectified rig triangulates fewer (but verified)
                # matches than the rectified row scan; the reference's
                # fisheye-stereo init likewise gates on total features,
                # not stereo depths (src/Tracking.cc StereoInitialization)
                max(80, int(round(120 * c.image_scale ** 2)))
                if cam2 is not None
                else max(100, int(round(300 * c.image_scale ** 2)))),
        )
        self.tracker.only_tracking = c.only_tracking
        self.tracker.scale = c.scale
        self.tracker.n_levels = c.n_levels
        self.tracker.max_keylines = c.max_lines
        self.tracker.depth_decimation = c.depth_upload_decimation
        self.tracker.fixed_shapes = c.backend_fixed_shapes
        # VI runs pipelined too (reference: the stereo/mono-inertial runs
        # feed the same realtime Track loop, src/Tracking.cc:1913-2034);
        # the pipeline is SHALLOW for IMU — the per-frame IMU prediction is
        # computed against the last RESOLVED pose, so depth 2 bounds its
        # staleness while still hiding the tunnel's fetch latency
        self.tracker.pipelined = c.pipelined
        self.tracker.pipeline_depth = max(
            1, min(c.pipeline_depth, 2) if c.use_imu else c.pipeline_depth)
        self.tracker.overlap_fetch = c.pipeline_overlap
        self.tracker.on_resolved = self._on_resolved
        self._pending_payloads = {}
        if self.cam2 is not None and self.t_lr is not None:
            # rig cameras carry no rectified bf; the close/far depth gate is
            # ThDepth x baseline like the reference (Stereo.ThDepth with
            # b_ = Tlr.translation().norm(), src/Settings.cc:409)
            self.tracker.max_depth = 40.0 * float(np.linalg.norm(self.t_lr))
        self.local_mapper = LocalMapper(
            cam, self.store, scale=c.scale, n_levels=c.n_levels,
            use_lines=c.use_lines, kfdb=self.kfdb,
            triangulate_new_points=(c.sensor == "mono"),
            # inertial maps cull too: the runtime re-chains the culled KF's
            # preintegration into its next temporal neighbour and the gate
            # keeps the merged span short (reference: the inertial branch
            # of LocalMapping::KeyFrameCulling) — see the inertial= wiring
            # below
            kf_culling=True,
            fixed_shapes=c.backend_fixed_shapes,
        )
        self.loop_closer = (
            LoopCloser(self.store, kfdb=self.kfdb, cam=cam)
            if c.loop_closing else None
        )
        self.mesh = None
        if c.sharded_backend:
            import jax

            if len(jax.devices()) > 1:
                from ..parallel import sharded_ba

                self.mesh = sharded_ba.make_mesh(len(jax.devices()))
                self.local_mapper.mesh = self.mesh
                if self.loop_closer is not None:
                    self.loop_closer.mesh = self.mesh
        self.dense_mapper = None
        if c.dense_mapping:
            from ..dense.mapping import DenseMapper

            self.dense_mapper = DenseMapper(
                cam, voxel_size=c.dense_voxel_size,
                use_segmentation=c.dense_segmentation,
                mesh_every=c.dense_mesh_every,
                fixed_shapes=c.backend_fixed_shapes,
            )
        self.inertial = None
        if c.use_imu:
            from .inertial import InertialRuntime

            kwargs = {}
            if imu_calib is not None:
                kwargs["calib"] = imu_calib
            if imu_T_b_c is not None:
                T = np.asarray(imu_T_b_c, np.float32)
                R_bc, t_bc = T[:3, :3], T[:3, 3]
                kwargs["R_cb"] = np.ascontiguousarray(R_bc.T)
                kwargs["t_cb"] = (-R_bc.T @ t_bc).astype(np.float32)
            # monocular maps are born up-to-scale: the inertial init
            # estimates the metric scale and rescales the map (reference:
            # the mbMonocular branch of InitializeIMU)
            kwargs["fix_scale"] = c.sensor != "mono"
            self.inertial = InertialRuntime(**kwargs)
            # keyframe culling must go through the inertial re-chaining
            # gate (see LocalMapper.cull_keyframes)
            self.local_mapper.inertial = self.inertial
        # planar map objects (reference: MapObject.* yaml enables detection
        # in Tracking + Sim3 refinement in local BA, src/Tracking.cc:1510-1544)
        self.object_store = None
        self.actor = None
        if c.async_mapping:
            from .async_runtime import MapperActor

            self.actor = MapperActor(self)
        # interleaved-backend state (SystemConfig.interleaved_backend): a
        # FIFO of staged per-KF backend generators, the head stepped
        # between frame dispatches on the tracking thread. Queueing (vs
        # draining on the next KF) lets a stage's device fetch span the
        # keyframe boundary instead of force-blocking — the reference's
        # LocalMapping likewise consumes a keyframe QUEUE at its own pace
        # (mlNewKeyFrames, src/LocalMapping.cc InsertKeyFrame)
        import collections as _collections

        self._backend_q = _collections.deque()
        # why each backend stage advanced: fetch complete ("ready") vs
        # blocked on an incomplete fetch (frame-count "deadline" / forced
        # catch-up) — the blocked counts locate tracker-stall budget
        self._stage_stats = {"ready": 0, "deadline": 0, "forced": 0}
        self._backend_pool = None
        self._last_frame_ts = None
        self._last_kf_ts = None
        self.loops_closed = []
        self.trajectory = []  # list of (timestamp, R, t) world-to-camera
        # retro-correctable trajectory: (timestamp, ref_kf_uid, R_rel,
        # t_rel) with T_frame_w = T_rel ∘ T_ref_w — export reconstructs
        # through the CURRENT (loop-corrected, BA-refined) keyframe poses
        # (reference: mlRelativeFramePoses include/Tracking.h:206-211 +
        # SaveTrajectoryTUM src/System.cc:860-1006)
        self._traj_rel = []
        # per-stage timing (reference: REGISTER_TIMES vectors on
        # Tracking/LocalMapping dumped by PrintTimeStats, include/
        # Tracking.h:236-250, src/Tracking.cc:391; Stopwatch TICK/TOCK)
        from ..utils.profiling import Stopwatch

        self.stopwatch = Stopwatch()
        self.local_mapper.stopwatch = self.stopwatch
        if self.dense_mapper is not None:
            self.dense_mapper.stopwatch = self.stopwatch
        if self.loop_closer is not None:
            self.loop_closer.stopwatch = self.stopwatch

    # -- mode / lifecycle (reference: include/System.h:157-167) ------------
    def activate_localization_mode(self):
        """Freeze the map; keep tracking against it (reference:
        System::ActivateLocalizationMode)."""
        self.tracker.only_tracking = True

    def deactivate_localization_mode(self):
        self.tracker.only_tracking = False

    def reset(self):
        """Full reset: drop every map and restart (reference: System::Reset,
        include/System.h:166). Rebuilds with the ORIGINAL constructor
        arguments — stereo-rig extrinsics and IMU calibration survive."""
        self.flush()
        self._freeze_traj_rel()  # old store's uids die with it
        traj, traj_rel = self.trajectory, self._traj_rel
        self.__init__(**self._ctor_args)
        self.trajectory = traj  # trajectory log survives a reset
        self._traj_rel = traj_rel

    def reset_active_map(self):
        """Clear only the active map's contents; other Atlas maps survive
        (reference: System::ResetActiveMap, include/System.h:167)."""
        st = self.store
        for k in st.kfs_of_map(st.active_map):
            st.remove_keyframe(int(k))
        pts = st.points_of_map(st.active_map)
        st.remove_points(pts[st.pt_mask[pts]])
        self.tracker.reset_state()

    def _maybe_scale(self, img: np.ndarray, nearest: bool = False) -> np.ndarray:
        """Rescale an input image to the working resolution (reference:
        image scaling in System::Track* when Camera.imageScale != 1)."""
        s = self.config.image_scale
        if s == 1.0:
            return img
        import jax

        h, w = self.cam.height, self.cam.width
        method = "nearest" if nearest else "linear"
        return np.asarray(jax.image.resize(jnp.asarray(img, jnp.float32),
                                           (h, w) + img.shape[2:], method))

    def _imu_pre_frame(self, timestamp: float, imu_samples):
        """Queue IMU samples and override the motion model with the IMU
        prediction (reference: Tracking::PredictStateIMU src/Tracking.cc:
        2034 — full state propagation once initialized; gyro-only rotation
        before that)."""
        from .tracking import OK, RECENTLY_LOST

        if self.inertial is None:
            return
        self.tracker.prior_info = None
        if imu_samples is not None:
            self.inertial.add_samples(imu_samples)
        if self._last_frame_ts is None:
            return
        if self.tracker.state not in (OK, RECENTLY_LOST):
            return
        p = self.inertial.preintegrate_frame_gap(
            self._last_frame_ts, timestamp)
        if p is None:
            return
        pred = self.inertial.predict_state(self.tracker.R, self.tracker.t, p)
        if pred is not None:
            R_pred, t_pred = pred
            self.tracker.vel_R = (
                R_pred @ self.tracker.R.T).astype(np.float32)
            self.tracker.vel_t = (
                t_pred - self.tracker.vel_R @ self.tracker.t).astype(
                    np.float32)
            # the IMU prediction enters the per-frame SOLVE, not just the
            # initial guess: marginalized-prior inertial term (reference:
            # PoseInertialOptimizationLastFrame, src/Optimizer.cc:10137)
            if self.inertial.per_frame_prior:
                self.tracker.prior_info = self.inertial.pose_prior_info(p)
        else:
            R_pred = self.inertial.predict_rotation(self.tracker.R, p)
            self.tracker.vel_R = (
                R_pred @ self.tracker.R.T).astype(np.float32)

    def _imu_post_frame(self, state: int, timestamp: float):
        """Refresh the inertial velocity estimate from the tracked pose
        (reference: Tracking sets frame velocities after a successful
        track)."""
        if self.inertial is None or state != 2:  # OK
            return
        self.inertial.note_frame_pose(self.tracker.R, self.tracker.t,
                                      timestamp)

    def _imu_post_kf(self, kf_id: int, timestamp: float):
        if self.inertial is None:
            return
        self.inertial.on_keyframe(kf_id, self._last_kf_ts, timestamp,
                                  self.store)
        self._last_kf_ts = timestamp
        s = self.inertial.consume_scale_correction()
        if s is not None:
            # the monocular-inertial init rescaled the map: mirror the
            # scale onto the tracker state and the recorded trajectory so
            # past and future poses live in the same (now metric) frame
            tr = self.tracker
            tr.t = (tr.t * s).astype(np.float32)
            tr.vel_t = (tr.vel_t * s).astype(np.float32)
            self.trajectory = [(ts, R, (t * s).astype(np.float32))
                               for ts, R, t in self.trajectory]
            self._traj_rel = [(ts, uid, R, (t * s).astype(np.float32))
                              for ts, uid, R, t in self._traj_rel]
        if self.inertial.initialized:
            self.inertial.vi_local_ba(self.cam, self.store, kf_id)
            # an initialized IMU earns predicted-pose coasting through
            # RECENTLY_LOST (reference: PredictStateIMU src/Tracking.cc:2318)
            self.tracker.imu_coast = True
            # gravity is now observable: loop corrections switch to the
            # 4-DoF essential graph (reference: src/LoopClosing.cc:1631-1637)
            if self.loop_closer is not None:
                self.loop_closer.gravity_w = self.inertial.gravity

    # -- planar map objects (reference: src/MapObject.cc) ------------------
    def add_map_object(self, gray: np.ndarray, metric_width: float) -> int:
        """Register a planar object template; it will be detected at every
        new keyframe and its Sim3 pose refined against its observations
        (reference: MapObject.* yaml + Tracking detection,
        src/Tracking.cc:1510-1544; Sim3 refinement src/Optimizer.cc:1115)."""
        from .map_objects import ObjectStore, ObjectTemplate

        if self.object_store is None:
            self.object_store = ObjectStore(self.cam)
            if self.loop_closer is not None:
                self.loop_closer.object_store = self.object_store
        tpl = ObjectTemplate.from_image(
            np.asarray(gray, np.float32), metric_width,
            object_id=len(self.object_store.objects))
        return self.object_store.add_template(tpl)

    def _detect_objects(self, kf_id: int):
        st = self.store
        self.object_store.detect_in_frame(
            st.kf_kp_xy[kf_id], st.kf_kp_desc[kf_id], st.kf_kp_mask[kf_id],
            st.kf_R[kf_id], st.kf_t[kf_id], kf_id=kf_id)

    # -- per-keyframe backend (reference: the LocalMapping + LoopClosing +
    # dense-thread work dispatched per new keyframe) -----------------------
    def _backend_keyframe(self, kf_id: int, dense_payload=None):
        """Everything downstream of keyframe creation, run to completion.
        Runs inline in synchronous mode, on the MapperActor thread in
        async mode (the interleaved mode steps _backend_stages instead)."""
        gen = self._backend_stages(kf_id, dense_payload)
        while True:
            try:
                next(gen)
            except StopIteration as stop:
                return stop.value

    def _backend_stages(self, kf_id: int, dense_payload=None, submit=None):
        """Staged per-keyframe backend (generator; each ``yield`` lets the
        tracking loop interleave frames — the tunnel-compatible equivalent
        of the reference's LocalMapping/LoopClosing/dense threads).
        ``submit`` (fn(outs) -> future) routes blocking fetches to a helper
        thread; None fetches inline (synchronous drain)."""
        from .local_mapping import _SyncFetch

        fetch = submit if submit is not None else _SyncFetch()
        # queue the BoW vocabulary descent NOW: its RESULT is fetched inside
        # the local mapper's first batched await, so the loop closer's add()
        # pays no extra link round trip at all (a separate np.asarray on the
        # in-flight array would still cost the ~25 ms flat fetch RPC even
        # when the execution itself finished long ago — measured)
        bow_fut = None
        if self.loop_closer is not None:
            st = self.store
            bow_fut = self.kfdb.dispatch_quantize(st.kf_kp_desc[kf_id])
        if self.config.local_ba:
            lm_gen = self.local_mapper.process_keyframe_stages(
                kf_id, extra_fetch=bow_fut, submit=submit)
            while True:
                try:
                    with self.stopwatch.scope("local_mapping"):
                        wait = next(lm_gen)
                except StopIteration as stop:
                    fetched_words = stop.value
                    break
                yield wait
            if fetched_words is not None:
                bow_fut = np.asarray(fetched_words)
        if self.object_store is not None:
            # Sim3 refinement against the observing keyframes (reference:
            # object vertices in local BA, src/Optimizer.cc:1115-1196)
            with self.stopwatch.scope("map_objects"):
                self.object_store.refine(self.store)
        if self.dense_mapper is not None and dense_payload is not None:
            kind, a, b = dense_payload
            # grayscale color plane on the rgbd path: the integrator
            # broadcasts it into the RGB color volume on device (a
            # replicated [H, W, 3] float upload costs 3x the link bytes)
            d_gen = self.dense_mapper.insert_stages(
                kind, kf_id, np.asarray(a, np.float32),
                np.asarray(b, np.float32),
                self.store.kf_R[kf_id], self.store.kf_t[kf_id], fetch)
            while True:
                try:
                    with self.stopwatch.scope("dense_mapping"):
                        wait = next(d_gen)
                except StopIteration:
                    break
                yield wait
        if self.loop_closer is None:
            self.kfdb.add(kf_id)
            return None
        with self.stopwatch.scope("loop_closing"):
            info = self.loop_closer.process_keyframe(kf_id, bow_fut=bow_fut)
        if info is not None:
            self.loops_closed.append((kf_id, info))
            if (info.get("merge") and self.inertial is not None
                    and self.inertial.initialized):
                # refine the welded region with inertial factors over an
                # enlarged temporal window (reference: MergeInertialBA,
                # src/LoopClosing.cc:2380+)
                self.inertial.vi_local_ba(self.cam, self.store, kf_id,
                                          window=16)
            if self.config.global_ba_on_loop and self.config.local_ba:
                # full BA refines the pose-graph solution. Reference:
                # RunGlobalBundleAdjustment runs in a DETACHED thread
                # after CorrectLoop (src/LoopClosing.cc:1652-1663) —
                # tracking never blocks on it. Here: dispatch the solve,
                # yield its fetch to the interleaved driver, apply a few
                # frames later (the stale-slot guard in _ba_apply protects
                # against keyframes culled/reallocated meanwhile).
                with self.stopwatch.scope("global_ba"):
                    gctx = self.local_mapper.global_ba_dispatch()
                if gctx is not None:
                    gfut = fetch(gctx["outs"])
                    yield gfut
                    with self.stopwatch.scope("global_ba"):
                        solved = gfut.result()
                        with self.store.lock:
                            self.local_mapper._ba_apply(gctx, solved)
            if self.dense_mapper is not None:
                # loop closure + global BA moved keyframes: rebuild the
                # dense map with corrected poses (reference: RebuildMap is
                # signaled AFTER the GBA map update, src/System.cc:434-437)
                st = self.store
                with self.stopwatch.scope("dense.rebuild"):
                    self.dense_mapper.rebuild(
                        lambda k: (st.kf_R[k], st.kf_t[k])
                        if st.kf_mask[k] else (None, None)
                    )
        return info

    # -- interleaved backend driver (SystemConfig.interleaved_backend) -----
    @property
    def _interleaved(self) -> bool:
        # pipelined visual runs only: the inertial runtime's per-KF init /
        # VI-BA assumes a settled backend (as does the non-pipelined sync
        # path that tests rely on for determinism)
        return (self.config.interleaved_backend and self.actor is None
                and self.config.pipelined and not self.config.use_imu)

    def _submit_backend_fetch(self, outs):
        """Hand a blocking device fetch to the backend helper thread; the
        stage that resumes a frame later finds the data host-side (the
        single-submitting-thread rule holds — only device_get runs off
        the tracking thread, like the resolve double buffer)."""
        if self._backend_pool is None:
            from concurrent.futures import ThreadPoolExecutor

            # two fetch lanes: the dense-mesh gather fetch (~40 ms) and
            # the local-BA fetch are independent device outputs — one
            # worker serializes them and the BA stage then misses its
            # frame-count deadline, blocking the tracker. Only device_get
            # runs here (the single-SUBMITTING-thread rule still holds).
            self._backend_pool = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="plvs-backend-fetch")
        import jax as _jax

        return self._backend_pool.submit(_jax.device_get, outs)

    def _enqueue_backend(self, kf_id: int, dense_payload=None):
        """Queue the staged backend for a fresh keyframe. Generators run
        strictly in keyframe order (only the head of the FIFO is stepped),
        but a predecessor's in-flight fetch may span this KF boundary —
        no force-drain, so the tracking thread never blocks on it here."""
        st = self.store
        ref = self.tracker.ref_kf
        snap = None
        with st.lock:
            if 0 <= ref < st.max_kf and st.kf_mask[ref]:
                snap = (ref, st.kf_R[ref].copy(), st.kf_t[ref].copy())
        gen = self._backend_stages(
            kf_id, dense_payload, submit=self._submit_backend_fetch)
        self._backend_q.append(
            {"gen": gen, "wait": None, "snap": (snap, len(self.loops_closed))})
        # bound the backlog: if the backend falls more than MAX_BACKLOG
        # keyframes behind the tracker, force progress (keeps map
        # maintenance / loop-closing latency bounded like the reference's
        # blocking InsertKeyFrame when LocalMapping is saturated). The cap
        # is deliberately loose — a force blocks the tracking thread on the
        # head stage's device fetch, so catching up gradually via the
        # per-frame steps is far cheaper than draining here.
        while len(self._backend_q) > self.MAX_BACKEND_BACKLOG:
            self._step_backend(force=True)
        self._step_backend()

    def _step_backend(self, force: bool = False):
        """Run ONE backend stage of the FIFO head (called between frame
        dispatches). A stage whose yielded fetch future has not completed
        yet is left alone until the next frame (resuming early would just
        block the tracking thread on .result()); ``force`` resumes
        regardless."""
        if not self._backend_q:
            return
        head = self._backend_q[0]
        w = head["wait"]
        if w is not None and not force and not w.done():
            head["age"] = head.get("age", 0) + 1
            if head["age"] < self.BACKEND_STAGE_DEADLINE:
                return
            self._stage_stats["deadline"] += 1
        elif w is not None and force and not w.done():
            self._stage_stats["forced"] += 1
        else:
            self._stage_stats["ready"] += 1
        head["age"] = 0
        head["wait"] = None
        try:
            head["wait"] = next(head["gen"])
        except StopIteration:
            if self._backend_q and self._backend_q[0] is head:
                self._backend_q.popleft()
            self._fold_backend_correction(head["snap"])

    def _drain_backend(self):
        while self._backend_q:
            self._step_backend(force=True)

    def _fold_backend_correction(self, snap_entry):
        """A loop closure during the staged backend moved the map under the
        tracker: fold T_ref_old^-1 ∘ T_ref_new into the tracker's cached
        pose (same scheme as MapperActor.apply_pending_correction)."""
        snap, n_loops = snap_entry or (None, 0)
        if snap is None or len(self.loops_closed) <= n_loops:
            return
        ref, R_old, t_old = snap
        st = self.store
        with st.lock:
            if not st.kf_mask[ref]:
                return
            R_new, t_new = st.kf_R[ref].copy(), st.kf_t[ref].copy()
        dR = R_old.T @ R_new
        dt = R_old.T @ (t_new - t_old)
        tr = self.tracker
        R_f, t_f = tr.R, tr.t
        tr.R = (R_f @ dR).astype(np.float32)
        tr.t = (R_f @ dt + t_f).astype(np.float32)
        # the queued successors snapped PRE-correction ref poses at enqueue
        # time; left stale, each would re-apply this same loop-closure delta
        # when it finishes. Re-snap them against the corrected map so later
        # folds measure only corrections that happen after this one.
        self._refresh_backend_snaps()

    def _refresh_backend_snaps(self):
        st = self.store
        ref = self.tracker.ref_kf
        snap = None
        with st.lock:
            if 0 <= ref < st.max_kf and st.kf_mask[ref]:
                snap = (ref, st.kf_R[ref].copy(), st.kf_t[ref].copy())
        for entry in self._backend_q:
            entry["snap"] = (snap, len(self.loops_closed))

    def _on_resolved(self, res, ts: float, seq=None):
        """Tracker callback: a deferred frame finished resolving (any
        trigger path) — run its full post-track path. Pending dense
        payloads are keyed by the tracker's monotonic frame counter, not
        the timestamp (two frames with equal timestamps must not collide)."""
        payload = self._pending_payloads.pop(seq, None)
        self._post_track(res, ts, payload)

    def _resolve_pipeline(self, force: bool = False):
        """Deferred-pipeline drain: when the in-flight window is full (or
        on force), fetch all outstanding solves in one stacked transfer;
        each resolution runs through _on_resolved. ``force`` also settles
        the interleaved keyframe backend."""
        with self.stopwatch.scope("resolve"):
            self.tracker.resolve_batch(force=force)
        if force:
            self._drain_backend()

    def flush(self):
        """Finalize any deferred frames (call at end of sequence;
        trajectory exports and shutdown do this automatically)."""
        self._resolve_pipeline(force=True)
        self._drain_backend()
        if self.actor is not None:
            self.actor.wait_idle(60.0)

    def _finish_frame(self, res, timestamp: float, dense_payload=None):
        """Route a Track* result: provisional (deferred solve in flight) or
        final (run the post-track path now). One interleaved-backend stage
        runs per frame AFTER this frame's own dispatch, so the stage's
        host work overlaps the frame's device execution."""
        if self.tracker._pending:
            self._pending_payloads[self.tracker._pending[-1]["seq"]] = \
                dense_payload
            self._last_frame_ts = timestamp
            # ADAPTIVE pipeline depth: the deferred window hides the
            # tunnel's fetch latency, but its predictions extrapolate the
            # motion model up to depth frames — under fast rotation the
            # per-frame matching degrades faster than the batch resolves
            # and tracking spirals down (measured on the room orbit:
            # inliers 500 -> 0 over ~20 frames). Bound the staleness by
            # the observed rotation rate, and resolve every frame while
            # the motion model is cold (startup / reloc / weak frame).
            tr = self.tracker
            if tr._vel_warm < 3:
                eff_depth, force = 1, True
            else:
                ang = float(np.arccos(np.clip(
                    (np.trace(tr.vel_R) - 1.0) * 0.5, -1.0, 1.0)))
                if ang > 0.10:
                    # extreme rotation / cold model: block for the result
                    # NOW so the velocity re-anchors before the next frame
                    eff_depth, force = 1, True
                elif ang > 0.03:
                    # fast rotation (e.g. the room orbit at ~3.75deg/frame):
                    # dispatch EVERY frame but keep the newest group in
                    # flight (double buffering) — staleness is exactly one
                    # frame plus extrapolation, which the 30/60 px widening
                    # tiers absorb; depth-2 staleness was measured to LOSE
                    # tracking on the orbit's far wall, while a forced
                    # per-frame drain serialized ~40-60 ms/frame
                    eff_depth, force = 1, False
                else:
                    eff_depth, force = tr.pipeline_depth, False
            if len(tr._pending) >= eff_depth:
                with self.stopwatch.scope("resolve"):
                    tr.resolve_batch(force=force, dispatch_at=eff_depth)
            self._step_backend()
            self._step_backend()
            return res.state, res.R, res.t
        out = self._post_track(res, timestamp, dense_payload)
        self._step_backend()
        self._step_backend()
        return out

    def _post_track(self, res, timestamp: float, dense_payload=None):
        """Common tail of every Track* entry point."""
        # record the frame's pose RELATIVE to its reference keyframe BEFORE
        # the backend runs (a loop closure in the backend moves the KF; the
        # relative pose stays valid and export re-anchors through the
        # corrected KF pose)
        st = self.store
        ref = self.tracker.ref_kf
        with st.lock:
            if 0 <= ref < st.max_kf and st.kf_mask[ref] \
                    and st.kf_uid[ref] >= 0:
                uid = int(st.kf_uid[ref])
                R_ref, t_ref = st.kf_R[ref], st.kf_t[ref]
                R_rel = (res.R @ R_ref.T).astype(np.float32)
                t_rel = (res.t - R_rel @ t_ref).astype(np.float32)
                self._traj_rel.append((timestamp, uid, R_rel, t_rel))
            else:
                self._traj_rel.append((timestamp, -1, res.R.copy(),
                                       res.t.copy()))
        if res.is_keyframe and res.kf_id >= 0:
            if self.object_store is not None:
                # detection runs in the tracking thread at KF creation
                # (reference: Tracking's object detection pass,
                # src/Tracking.cc:1510-1544)
                self._detect_objects(res.kf_id)
            if self.actor is not None:
                self.actor.insert_keyframe(res.kf_id, dense_payload)
                self._imu_post_kf(res.kf_id, timestamp)
            elif self._interleaved:
                # staged backend: stages run between subsequent frame
                # dispatches; a loop correction folds into the tracker pose
                # at completion (_fold_backend_correction)
                self._enqueue_backend(res.kf_id, dense_payload)
                self._imu_post_kf(res.kf_id, timestamp)
            else:
                self._backend_keyframe(res.kf_id, dense_payload)
                self._imu_post_kf(res.kf_id, timestamp)
                # keep the tracker's pose consistent with the (possibly
                # loop-corrected / VI-refined) adjusted KF
                self.tracker.R = self.store.kf_R[res.kf_id].copy()
                self.tracker.t = self.store.kf_t[res.kf_id].copy()
        self._imu_post_frame(res.state, timestamp)
        # never move the frame clock BACKWARDS: in pipelined mode resolves
        # trail dispatches, and rewinding _last_frame_ts here would make
        # the next frame's IMU gap re-consume samples already integrated
        # for the frames dispatched meanwhile
        if self._last_frame_ts is None or timestamp > self._last_frame_ts:
            self._last_frame_ts = timestamp
        self.trajectory.append((timestamp, res.R.copy(), res.t.copy()))
        return res.state, res.R, res.t

    def track_rgbd(self, gray: np.ndarray, depth: np.ndarray, timestamp: float,
                   imu_samples=None):
        """Track one RGB-D frame; returns (state, Rcw, tcw)."""
        gray = self._maybe_scale(gray)
        depth = self._maybe_scale(depth, nearest=True)
        self._imu_pre_frame(timestamp, imu_samples)
        if self.actor is not None:
            self.actor.apply_pending_correction()
        self._resolve_pipeline()
        # steady-state fast path: the WHOLE frame (decompress + extract +
        # match + solve) is one packed upload + one executable — per-frame
        # program-launch latency through a remote link is the real frame
        # budget, not device compute (~1 ms total)
        res = None
        if self.tracker.state == OK:
            buf = _pack_rgbd(gray, depth, self.config.depth_upload_decimation)
            if buf is not None:
                with self.stopwatch.scope("track"):
                    res = self.tracker.process_frame_packed(
                        buf, gray.shape[0], gray.shape[1], timestamp)
        if res is None:
            # fallback (init / reloc / odd geometry): separate build
            with self.stopwatch.scope("frame_build"):
                gray_d, depth_d = _upload_rgbd(gray, depth)
                fr = frame_mod.build_frame_rgbd(
                    gray_d, depth_d,
                    self.cam, self.config.num_features, self.config.n_levels,
                    self.config.scale,
                )
                fl = None
                if self.config.use_lines:
                    fl = frame_mod.build_frame_lines(
                        gray_d, depth_d, self.cam, self.config.max_lines,
                    )
            with self.stopwatch.scope("track"):
                res = self.tracker.process_frame(fr, timestamp, fl)
        payload = ("rgbd", gray, depth) if self.dense_mapper else None
        return self._finish_frame(res, timestamp, payload)

    def track_monocular(self, gray: np.ndarray, timestamp: float,
                        imu_samples=None):
        """Track one monocular frame (reference: System::TrackMonocular,
        src/System.cc:653; with imu_samples this is the monocular-inertial
        entry point, reference: Examples/Monocular-Inertial mains). The
        returned map/trajectory is up to scale until IMU initialization
        resolves it."""
        gray = self._maybe_scale(gray)
        self._imu_pre_frame(timestamp, imu_samples)
        if self.actor is not None:
            self.actor.apply_pending_correction()
        self._resolve_pipeline()
        with self.stopwatch.scope("frame_build"):
            fr = frame_mod.build_frame_mono(
                jnp.asarray(gray, jnp.float32), self.cam,
                self.config.num_features, self.config.n_levels,
                self.config.scale,
            )
        with self.stopwatch.scope("track"):
            res = self.tracker.process_frame(fr, timestamp)
        return self._finish_frame(res, timestamp)

    def track_stereo(self, gray_l: np.ndarray, gray_r: np.ndarray,
                     timestamp: float, imu_samples=None):
        """Track one rectified stereo pair (reference: System::TrackStereo,
        src/System.cc:460; with imu_samples it is the stereo-inertial entry
        point, reference: Examples/Stereo-Inertial mains)."""
        if self.rectifier is not None:
            # warp the calibrated non-rectified pair to the common
            # row-aligned pinhole pair (one jitted gather per image)
            gray_l, gray_r = self.rectifier(gray_l, gray_r)
        else:
            gray_l = self._maybe_scale(gray_l)
            gray_r = self._maybe_scale(gray_r)
        self._imu_pre_frame(timestamp, imu_samples)
        if self.actor is not None:
            self.actor.apply_pending_correction()
        self._resolve_pipeline()
        with self.stopwatch.scope("frame_build"):
            if self.cam2 is not None and self.R_lr is not None:
                # non-rectified rig (fisheye stereo): epipolar-gated
                # matching + two-ray triangulation
                fr = frame_mod.build_frame_stereo_rig(
                    jnp.asarray(gray_l, jnp.float32),
                    jnp.asarray(gray_r, jnp.float32),
                    self.cam, self.cam2,
                    jnp.asarray(self.R_lr), jnp.asarray(self.t_lr),
                    self.config.num_features, self.config.n_levels,
                    self.config.scale,
                )
            else:
                fr = frame_mod.build_frame_stereo(
                    jnp.asarray(gray_l, jnp.float32),
                    jnp.asarray(gray_r, jnp.float32),
                    self.cam, self.config.num_features, self.config.n_levels,
                    self.config.scale,
                )
            fl = None
            if self.config.use_lines:
                # endpoint depths from left-right line matching (reference:
                # LineMatcher::SearchStereoMatchesByKnn + line disparity)
                fl = frame_mod.build_frame_lines_stereo(
                    jnp.asarray(gray_l, jnp.float32),
                    jnp.asarray(gray_r, jnp.float32),
                    self.cam, self.config.max_lines,
                )
        with self.stopwatch.scope("track"):
            res = self.tracker.process_frame(fr, timestamp, fl)
        payload = ("stereo", gray_l, gray_r) if self.dense_mapper else None
        return self._finish_frame(res, timestamp, payload)

    # -- trajectory export (reference: System::SaveTrajectoryTUM) ----------
    def retro_trajectory(self):
        """(ts, R_cw, t_cw) per frame, RECONSTRUCTED through the current
        keyframe poses: every loop closure / global BA that moved a
        keyframe retro-corrects all frames anchored to it (reference:
        SaveTrajectoryTUM composes mlRelativeFramePoses with the current
        KeyFrame poses, src/System.cc:860-1006). Frames whose reference
        keyframe is unresolvable fall back to their live tracked pose."""
        self._resolve_pipeline(force=True)
        out = []
        st = self.store
        with st.lock:
            for i, (ts, R_raw, t_raw) in enumerate(self.trajectory):
                rel = (self._traj_rel[i]
                       if i < len(self._traj_rel) else None)
                pose = (st.resolve_kf_pose(rel[1])
                        if rel is not None and rel[1] >= 0 else None)
                if pose is None:
                    out.append((ts, R_raw, t_raw))
                else:
                    _, _, R_rel, t_rel = rel
                    R_ref, t_ref = pose
                    out.append((ts, (R_rel @ R_ref).astype(np.float32),
                                (R_rel @ t_ref + t_rel).astype(np.float32)))
        return out

    def _freeze_traj_rel(self):
        """Bake the retro-corrected poses into absolute entries — called
        before the store is replaced or reset (old uids would otherwise
        dangle, or collide with the new store's uid sequence)."""
        frozen = self.retro_trajectory()
        self.trajectory = [(ts, R, t) for ts, R, t in frozen]
        self._traj_rel = [(ts, -1, R, t) for ts, R, t in frozen]

    def trajectory_tum(self) -> np.ndarray:
        """[T, 8] rows (t, tx, ty, tz, qx, qy, qz, qw) of camera-in-world."""
        rows = []
        for ts, R, t in self.retro_trajectory():
            Rwc = R.T
            twc = -Rwc @ t
            q = np.asarray(lie.rotmat_to_quat(jnp.asarray(Rwc)))  # (w, x, y, z)
            rows.append([ts, *twc, q[1], q[2], q[3], q[0]])
        return np.asarray(rows)

    def save_trajectory_tum(self, path: str):
        np.savetxt(path, self.trajectory_tum(), fmt="%.6f")

    def save_trajectory_kitti(self, path: str):
        """Flattened 3x4 [R_wc | t_wc] per frame (reference:
        System::SaveTrajectoryKITTI, include/System.h:196)."""
        from ..io import trajectory as traj_io

        traj_io.write_kitti(path, self.retro_trajectory())

    def save_trajectory_euroc(self, path: str):
        """EuRoC csv trajectory (reference: System::SaveTrajectoryEuRoC,
        include/System.h:188)."""
        from ..io import trajectory as traj_io

        traj_io.write_euroc(path, self.retro_trajectory())

    def keyframe_trajectory(self):
        """(ts, R_cw, t_cw) tuples for the live keyframes, by timestamp."""
        live = np.nonzero(self.store.kf_mask)[0]
        order = live[np.argsort(self.store.kf_timestamp[live])]
        return [(float(self.store.kf_timestamp[k]),
                 self.store.kf_R[k].copy(), self.store.kf_t[k].copy())
                for k in order]

    def save_keyframe_trajectory_tum(self, path: str):
        """Keyframe-only trajectory (reference:
        System::SaveKeyFrameTrajectoryTUM, include/System.h:184)."""
        from ..io import trajectory as traj_io

        traj_io.write_tum(path, self.keyframe_trajectory())

    def save_keyframe_trajectory_euroc(self, path: str):
        """Keyframe-only EuRoC csv (reference:
        System::SaveKeyFrameTrajectoryEuRoC, include/System.h:192)."""
        from ..io import trajectory as traj_io

        traj_io.write_euroc(path, self.keyframe_trajectory())

    def shutdown(self, save_map_path: str | None = None,
                 save_dense_path: str | None = None):
        """Finalize the session, optionally persisting the atlas and dense
        map (reference: System::Shutdown + SparseMapping.saveOnShutdown,
        src/System.cc:829-844)."""
        self._resolve_pipeline(force=True)
        if self.actor is not None:
            self.actor.shutdown()
        if save_map_path:
            from ..io import serialization

            voc = self.kfdb.voc if self.kfdb else None
            serialization.save_atlas(save_map_path, self.store, voc)
        if save_dense_path and self.dense_mapper is not None:
            from ..io import serialization

            serialization.save_dense(save_dense_path, self.dense_mapper.volume)

    def load_map(self, path: str, freeze: bool = True,
                 force_relocalization: bool = True,
                 dense_path: str | None = None):
        """Reuse a previously saved atlas (reference: SparseMapping.reuseMap
        flow — System::LoadAtlas src/System.cc:201-229: load, optionally
        freeze every keyframe (:212-216, mbFixed), and start tracking in
        RELOCALIZE_IN_LOADED_MAP when forceRelocalization is set
        (:353-356)).

        The loaded store replaces the current one; with ``freeze`` the
        loaded keyframes stay fixed in every subsequent optimization and are
        never culled, so the session only extends the map.
        """
        from ..io import serialization

        expected = self.kfdb.voc if self.config.vocabulary_path else None
        self._freeze_traj_rel()  # the old store's uids die with it
        store, voc = serialization.load_atlas(path, expected_vocab=expected)
        store.ensure_uids()
        if freeze:
            store.kf_fixed[store.kf_mask] = True
        self.store = store
        if voc is not None and self.kfdb.voc is None:
            self.kfdb.voc = voc
        self.kfdb.store = store
        self.kfdb.rebuild()
        self.tracker.store = store
        self.local_mapper.store = store
        if self.loop_closer is not None:
            self.loop_closer.store = store
        if dense_path and self.dense_mapper is not None:
            self.dense_mapper.volume = serialization.load_dense(
                dense_path, self.cam)
        # continue numbering after the loaded session
        live = np.nonzero(store.kf_mask)[0]
        if len(live):
            self.tracker.frame_id = int(store.kf_frame_id[live].max()) + 1
        from .tracking import LOST, RELOCALIZE_IN_LOADED_MAP

        self.tracker.state = (RELOCALIZE_IN_LOADED_MAP
                              if force_relocalization else LOST)
        self.tracker.ref_kf = int(live[-1]) if len(live) else -1
        self.tracker.last_kp_pt_id = None

    def map_statistics(self):
        return {
            "keyframes": self.store.num_keyframes,
            "points": self.store.num_points,
            "lines": self.store.num_lines,
            "frames": len(self.trajectory),
            "maps": self.store.n_maps,
        }

    def time_stats(self) -> dict:
        """Per-stage timing statistics (reference: PrintTimeStats,
        src/Tracking.cc:391 — mean/std per stage over the run)."""
        return self.stopwatch.stats()

    def print_time_stats(self) -> str:
        report = self.stopwatch.report()
        print(report)
        return report
