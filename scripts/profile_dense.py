"""Fine-grained profile of the dense pipeline at bench shape.

Times each sub-step of a per-KF dense insert (alloc / integrate dispatch /
touched fetch / dirty scan / padded-field host prep+dispatch / device fetch /
host triangle generation) to locate the tracking-thread cost that caps the
headline fps (VERDICT r3 item 1/3).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if jax.default_backend() != "cpu":
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from plvs_tpu.dense import meshing
from plvs_tpu.dense.mapping import DenseMapper
from plvs_tpu.geometry import cameras
from plvs_tpu.io import synthetic

W, H = 640, 480
cam = cameras.pinhole(520.9, 521.0, 325.1, 249.7, width=W, height=H, bf=40.0)
tex = synthetic.make_structured_texture(2048, rng=np.random.default_rng(7))
scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, texture=tex, tex_scale=420.0)
frames = [(ts, gray, depth, R, t)
          for ts, gray, depth, R, t in scene.sequence(n_frames=120)]
kfs = frames[::10]  # ~12 KFs like the bench

mapper = DenseMapper(cam, voxel_size=0.02, mesh_every=1)
mapper.mesh_budget = 160

T = {}


def tic():
    return time.perf_counter()


def add(k, t0):
    T.setdefault(k, []).append((time.perf_counter() - t0) * 1e3)


for rep in range(2):  # rep 0 = compile warmup, rep 1 = measured
    if rep == 1:
        T.clear()
        mapper = DenseMapper(cam, voxel_size=0.02, mesh_every=1)
        mapper.mesh_budget = 160
    for ts, gray, depth, R, t in kfs:
        vol = mapper.volume
        t0 = tic(); vol._allocate_for_frame(depth, R, t); add("alloc", t0)
        # integrate minus alloc: time the dispatch path
        t0 = tic()
        import jax.numpy as jnp
        raw = np.asarray(depth, np.float32)
        d16 = np.clip(raw * 1000.0, 0, 65535).astype(np.uint16)
        g8 = np.clip(gray, 0, 255).astype(np.uint8)
        buf = np.empty(H * W * 3, np.uint8)
        buf[: H * W * 2] = d16.astype("<u2").view(np.uint8).ravel()
        buf[H * W * 2:] = g8.ravel()
        add("pack_host", t0)
        t0 = tic()
        from plvs_tpu.dense.mapping import _unpack_filter_packed
        dep_d, col_d = _unpack_filter_packed(jnp.asarray(buf), H, W)
        add("unpack_dispatch", t0)
        t0 = tic(); vol.integrate(dep_d, col_d, R, t, alloc_depth=raw)
        add("integrate_dispatch", t0)
        t0 = tic(); vol.flush_touched(); add("touched_fetch", t0)
        t0 = tic(); dirty = mapper.mesher._dirty_slots(); add("dirty_scan", t0)
        # emulate update_begin queue work
        m = mapper.mesher
        for s in dirty:
            s = int(s)
            if s not in m._queued:
                m._queued.add(s)
                m._queue.append(s)
        take, m._queue = m._queue[:160], m._queue[160:]
        for s in take:
            m._queued.discard(s)
        slots = np.asarray(sorted(s for s in take if s < vol.n_blocks),
                           np.int64)
        if not len(slots):
            continue
        t0 = tic()
        out = meshing._padded_fields_dispatch(vol, slots, m.min_weight)
        add("padded_dispatch", t0)
        t0 = tic(); fetched = jax.device_get(out); add("padded_fetch", t0)
        pt, mask = fetched
        n = len(slots)
        t0 = tic()
        tri, tri_slot = meshing._triangles_from_fields(
            vol, slots, np.asarray(pt[:n], np.float32), np.asarray(mask)[:n])
        add("tri_host", t0)
        versions = vol.block_version[slots].copy()
        order = np.argsort(tri_slot, kind="stable")
        tri_s = tri[order]; slot_s = tri_slot[order]
        lo = np.searchsorted(slot_s, np.asarray(slots, slot_s.dtype))
        hi = np.searchsorted(slot_s, np.asarray(slots, slot_s.dtype), "right")
        for s, v, a, b in zip(slots, versions, lo, hi):
            m._block_tris[int(s)] = tri_s[a:b]
            m._meshed_version[int(s)] = int(v)

print(f"n_blocks={mapper.volume.n_blocks}")
for k, v in T.items():
    v = np.asarray(v)
    print(f"{k:22s} mean={v.mean():7.2f} ms  median={np.median(v):7.2f}  "
          f"max={v.max():7.2f}  n={len(v)}")
