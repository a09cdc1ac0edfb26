"""Asynchronous mapper actor: the backend pipeline on its own host thread.

TPU-native equivalent of the reference's thread fabric (reference:
System::System spawns LocalMapping::Run, LoopClosing::Run and the dense
PointCloudMapping thread, src/System.cc:315-398; keyframes cross the
boundary through the mutex-protected mlNewKeyFrames queue,
include/LocalMapping.h:72,93). Here ONE actor thread drains a keyframe
queue and runs the full backend (local mapping -> loop closing -> dense
integration) per keyframe, overlapping its work with the tracking thread:

  * map-state consistency comes from the coarse ``MapStore.lock`` — the
    tracker's candidate gathers and keyframe creation and the actor's
    mutating stages hold it; device solves run OUTSIDE it, so while the
    actor waits on a local-BA solve the tracker keeps building frames and
    dispatching its own device work (on one chip the XLA queue interleaves
    them; with a second device the dense/BA programs run truly parallel —
    see plvs_tpu.parallel.pipeline).
  * a new keyframe arriving while the actor is inside local BA sets the
    abort flag, making the BA return after its current chunk (reference:
    mbAbortBA / LocalMapping::InterruptBA, src/LocalMapping.cc:139).
  * loop corrections move every keyframe of the map while the tracker is
    mid-sequence; the actor records the tracker reference KF's pose change
    and the tracker applies it to its cached pose at the next frame
    boundary (reference: Tracking continues during CorrectLoop; the
    corrected local map re-anchors it).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class MapperActor:
    def __init__(self, system):
        self.system = system
        self.queue: "queue.Queue" = queue.Queue()
        self.abort_ba = threading.Event()
        self._busy = threading.Event()
        self._stop = False
        self._error = None
        self._correction_lock = threading.Lock()
        self._pending_correction = None  # (ref_kf, R_old, t_old)
        # wire the interruptible-BA check into the local mapper
        system.local_mapper.abort_check = self.abort_ba.is_set
        self.thread = threading.Thread(target=self._run, daemon=True,
                                       name="plvs-mapper")
        self.thread.start()

    # -- tracking-thread API ------------------------------------------------
    def insert_keyframe(self, kf_id: int, dense_payload=None):
        """Queue a keyframe for the backend; interrupts a running local BA
        (reference: LocalMapping::InsertKeyFrame + InterruptBA)."""
        self.abort_ba.set()
        self.queue.put((kf_id, dense_payload))
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError(f"mapper actor failed: {err}")

    def apply_pending_correction(self):
        """Fold a loop/global-BA pose correction into the tracker's cached
        pose: T_frame' = T_frame ∘ T_ref_old^-1 ∘ T_ref_new."""
        with self._correction_lock:
            pend, self._pending_correction = self._pending_correction, None
        if pend is None:
            return
        ref_kf, R_old, t_old = pend
        st = self.system.store
        with st.lock:
            if not st.kf_mask[ref_kf]:
                return
            R_new, t_new = st.kf_R[ref_kf].copy(), st.kf_t[ref_kf].copy()
        tr = self.system.tracker
        # delta = T_ref_old^-1 ∘ T_ref_new;  T_frame' = T_frame ∘ delta,
        # i.e. (R', t') = (R_f dR, R_f dt + t_f)
        dR = R_old.T @ R_new
        dt = R_old.T @ (t_new - t_old)
        R_f, t_f = tr.R, tr.t
        tr.R = (R_f @ dR).astype(np.float32)
        tr.t = (R_f @ dt + t_f).astype(np.float32)

    def idle(self) -> bool:
        return self.queue.empty() and not self._busy.is_set()

    def wait_idle(self, timeout: float = 60.0) -> bool:
        import time

        t0 = time.time()
        while time.time() - t0 < timeout:
            if self.idle():
                return True
            time.sleep(0.005)
        return False

    def shutdown(self, timeout: float = 120.0):
        self.wait_idle(timeout)
        self._stop = True
        self.queue.put(None)
        self.thread.join(timeout=10.0)

    # -- actor thread -------------------------------------------------------
    def _run(self):
        sys_ = self.system
        while True:
            item = self.queue.get()
            if item is None or self._stop:
                return
            kf_id, payload = item
            self._busy.set()
            self.abort_ba.clear()
            try:
                ref_before = sys_.tracker.ref_kf
                st = sys_.store
                with st.lock:
                    ok = 0 <= ref_before < st.max_kf and st.kf_mask[ref_before]
                    if ok:
                        R_old = st.kf_R[ref_before].copy()
                        t_old = st.kf_t[ref_before].copy()
                n_loops = len(sys_.loops_closed)
                sys_._backend_keyframe(kf_id, payload)
                if ok and len(sys_.loops_closed) > n_loops:
                    # a loop closure moved the map under the tracker
                    with self._correction_lock:
                        self._pending_correction = (ref_before, R_old, t_old)
            except Exception as e:  # surfaced on the next insert
                self._error = e
            finally:
                self._busy.clear()
