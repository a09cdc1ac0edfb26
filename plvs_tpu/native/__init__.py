"""Native host runtime for plvs_tpu: C++ engine loaded via ctypes.

The TPU compute path lives in JAX/Pallas; this package is the part of the
framework that must stay on the host — observation-graph bookkeeping,
place-recognition indexing, and image IO — implemented in C++ for the same
reasons the reference implements its runtime in C++ (reference:
src/KeyFrame.cc covisibility graph, src/KeyFrameDatabase.cc inverted file,
the dataset-loading mains under Examples/): latency-critical, branchy code
that runs concurrently with device compute.

The shared library is built from ``src/plvs_native.cpp`` on first import
(g++, cached next to the source, rebuilt when the source changes). If the
toolchain or libpng is unavailable, ``available()`` returns False and every
caller keeps its pure-numpy path — the native layer is an accelerator, not a
hard dependency.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "plvs_native.cpp")

_lib = None
_lib_err: str | None = None
_lock = threading.Lock()


def _build_and_load():
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(_DIR, f"_plvs_native_{tag}.so")
    if not os.path.exists(so_path):
        for stale in os.listdir(_DIR):
            if stale.startswith("_plvs_native_") and stale.endswith(".so"):
                try:
                    os.unlink(os.path.join(_DIR, stale))
                except OSError:
                    pass
        cmd = [
            "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
            _SRC, "-o", so_path + ".tmp", "-lpng", "-lz",
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        if proc.returncode != 0:
            raise RuntimeError(f"native build failed:\n{proc.stderr[-2000:]}")
        os.replace(so_path + ".tmp", so_path)
    lib = ctypes.CDLL(so_path)

    i64, i32, u8, f32 = ctypes.c_int64, ctypes.c_int32, ctypes.c_uint8, ctypes.c_float
    pi64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    pi32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    pu8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    pf32 = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")

    lib.covis_counts.argtypes = [pi64, pi64, pu8, i64, i64, i64, i64, pi32]
    lib.covis_counts.restype = None
    lib.covis_graph.argtypes = [pi64, pi64, pu8, i64, i64, i64, i32, i64,
                                pi32, pi32, pi32]
    lib.covis_graph.restype = i64
    lib.spanning_tree.argtypes = [pi32, pi32, pi32, i64, i64, pi32]
    lib.spanning_tree.restype = None

    lib.invindex_create.argtypes = [i64]
    lib.invindex_create.restype = ctypes.c_void_p
    lib.invindex_destroy.argtypes = [ctypes.c_void_p]
    lib.invindex_add.argtypes = [ctypes.c_void_p, i32, pi32, pf32, i64]
    lib.invindex_remove.argtypes = [ctypes.c_void_p, i32]
    lib.invindex_query.argtypes = [ctypes.c_void_p, pi32, pf32, i64, i32,
                                   pf32, pi32]
    lib.invindex_query.restype = i64

    lib.png_read_gray_f32.argtypes = [ctypes.c_char_p, pf32, i64,
                                      ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.png_read_gray_f32.restype = ctypes.c_int
    lib.prefetch_create.argtypes = [ctypes.POINTER(ctypes.c_char_p), i64, i64,
                                    i32, i32]
    lib.prefetch_create.restype = ctypes.c_void_p
    lib.prefetch_next.argtypes = [ctypes.c_void_p, pf32, i64,
                                  ctypes.POINTER(i32), ctypes.POINTER(i32)]
    lib.prefetch_next.restype = i32
    lib.prefetch_destroy.argtypes = [ctypes.c_void_p]
    return lib


def lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _lib_err
    if _lib is None and _lib_err is None:
        with _lock:
            if _lib is None and _lib_err is None:
                if os.environ.get("PLVS_TPU_NO_NATIVE"):
                    _lib_err = "disabled via PLVS_TPU_NO_NATIVE"
                else:
                    try:
                        _lib = _build_and_load()
                    except Exception as e:  # toolchain/libpng missing
                        _lib_err = str(e)
    return _lib


def available() -> bool:
    return lib() is not None


def build_error() -> str | None:
    lib()
    return _lib_err


# ---------------------------------------------------------------------------
# Covisibility engine (reference: KeyFrame::UpdateConnections /
# GetBestCovisibilityKeyFrames, include/KeyFrame.h:124-138)
# ---------------------------------------------------------------------------

def covis_counts(obs_kf: np.ndarray, obs_pt: np.ndarray, obs_mask: np.ndarray,
                 kf: int, max_kf: int, max_pts: int) -> np.ndarray:
    """Shared-landmark count between ``kf`` and every other keyframe."""
    L = lib()
    obs_kf = np.ascontiguousarray(obs_kf, np.int64)
    obs_pt = np.ascontiguousarray(obs_pt, np.int64)
    obs_mask = np.ascontiguousarray(obs_mask, np.uint8)
    out = np.zeros((max_kf,), np.int32)
    L.covis_counts(obs_kf, obs_pt, obs_mask, len(obs_kf), kf, max_kf,
                   max_pts, out)
    return out


def covis_graph(obs_kf: np.ndarray, obs_pt: np.ndarray, obs_mask: np.ndarray,
                max_kf: int, max_pts: int, min_weight: int = 15,
                cap: int = 1 << 16):
    """Full weighted covisibility graph as COO edges (i < j, weight)."""
    L = lib()
    obs_kf = np.ascontiguousarray(obs_kf, np.int64)
    obs_pt = np.ascontiguousarray(obs_pt, np.int64)
    obs_mask = np.ascontiguousarray(obs_mask, np.uint8)
    while True:
        ei = np.empty((cap,), np.int32)
        ej = np.empty((cap,), np.int32)
        w = np.empty((cap,), np.int32)
        n = L.covis_graph(obs_kf, obs_pt, obs_mask, len(obs_kf), max_kf,
                          max_pts, min_weight, cap, ei, ej, w)
        if n <= cap:
            return ei[:n], ej[:n], w[:n]
        cap = int(n)


def spanning_tree(ei: np.ndarray, ej: np.ndarray, w: np.ndarray,
                  max_kf: int) -> np.ndarray:
    """Parent id per keyframe (-1 for roots): highest-weight earlier
    covisible KF (reference: KeyFrame spanning tree, mspChildrens)."""
    L = lib()
    ei = np.ascontiguousarray(ei, np.int32)
    ej = np.ascontiguousarray(ej, np.int32)
    w = np.ascontiguousarray(w, np.int32)
    out = np.empty((max_kf,), np.int32)
    L.spanning_tree(ei, ej, w, len(ei), max_kf, out)
    return out


# ---------------------------------------------------------------------------
# Sparse BoW inverted index (reference: KeyFrameDatabase::mvInvertedFile)
# ---------------------------------------------------------------------------

class InvertedIndex:
    """Sparse postings-list index with DBoW2 L1 scoring.

    Host-side alternative to the dense [K, W] device scoring in
    plvs_tpu.slam.keyframe_database — wins when the vocabulary is large
    (W >= 10^4, e.g. the full ORBvoc tree) and BoW vectors are sparse.
    """

    def __init__(self, n_words: int, max_kf: int):
        self._lib = lib()
        self._h = self._lib.invindex_create(n_words)
        self.n_words = n_words
        self.max_kf = max_kf

    def add(self, kf: int, words: np.ndarray, weights: np.ndarray):
        words = np.ascontiguousarray(words, np.int32)
        weights = np.ascontiguousarray(weights, np.float32)
        self._lib.invindex_add(self._h, kf, words, weights, len(words))

    def remove(self, kf: int):
        self._lib.invindex_remove(self._h, kf)

    def query(self, words: np.ndarray, weights: np.ndarray,
              max_kf: int | None = None):
        """L1 similarity + shared-word count vs every indexed keyframe.
        ``max_kf`` may exceed the construction-time value (the map store
        grows its keyframe capacity on demand)."""
        words = np.ascontiguousarray(words, np.int32)
        weights = np.ascontiguousarray(weights, np.float32)
        mk = int(max_kf if max_kf is not None else self.max_kf)
        scores = np.zeros((mk,), np.float32)
        shared = np.zeros((mk,), np.int32)
        self._lib.invindex_query(self._h, words, weights, len(words),
                                 mk, scores, shared)
        return scores, shared

    def close(self):
        if self._h:
            self._lib.invindex_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# PNG decode + prefetching dataset loader (reference: LoadImages loops in
# Examples/RGB-D/rgbd_tum.cc etc.)
# ---------------------------------------------------------------------------

def read_png_gray(path: str, cap_px: int = 4096 * 4096) -> np.ndarray:
    """Decode a PNG to float32 grayscale (16-bit stays in raw units)."""
    L = lib()
    buf = np.empty((cap_px,), np.float32)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = L.png_read_gray_f32(path.encode(), buf, cap_px,
                             ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        raise IOError(f"png_read_gray_f32({path}) failed: rc={rc}")
    return buf[: h.value * w.value].reshape(h.value, w.value).copy()


class ImagePrefetcher:
    """Threaded in-order PNG decoder: overlaps dataset IO with device compute
    (the SLAM front end is frame-serial; decode of frame t+1..t+window runs
    while the device tracks frame t)."""

    def __init__(self, paths: list[str], cap_px: int = 4096 * 4096,
                 n_threads: int = 4, window: int = 8):
        self._lib = lib()
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self.cap_px = cap_px
        self._h = self._lib.prefetch_create(arr, len(self._paths), cap_px,
                                            n_threads, window)
        self._n = len(paths)
        self._served = 0

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._served >= self._n:
            raise StopIteration
        buf = np.empty((self.cap_px,), np.float32)
        h = ctypes.c_int32()
        w = ctypes.c_int32()
        rc = self._lib.prefetch_next(self._h, buf, self.cap_px,
                                     ctypes.byref(h), ctypes.byref(w))
        self._served += 1
        if rc == -99:
            raise StopIteration
        if rc != 0:
            raise IOError(f"prefetch_next failed: rc={rc}")
        return buf[: h.value * w.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._h:
            self._lib.prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
