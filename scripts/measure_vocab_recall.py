"""Place-recognition recall + latency at >= 1k keyframes (VERDICT r4
item 10): index 4 laps of a structured room (1024 keyframes) with the
shipped 100k-word vocabulary and measure

  * recall@5 / top-1 accuracy of loop-candidate retrieval for queries from
    a *held-out* lap against the same-viewing-angle ground truth,
  * per-keyframe ``KeyFrameDatabase.add`` latency and per-query
    ``relocalization_candidates`` latency at full database size.

Reference scale: KeyFrameDatabase::DetectNBestCandidates over the ~1M-leaf
ORBvoc (/root/reference/include/KeyFrameDatabase.h:91,
/root/reference/src/System.cc:158-196). The DBoW2 text/binary loaders
(plvs_tpu/vocab/bow.py:172,258) accept a converted ORBvoc drop-in; this
script records what the shipped 100k tree achieves at 8x the r3 test's
database size.

Usage: python scripts/measure_vocab_recall.py  (CPU or attached TPU)
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(n_per_lap: int = 256, n_laps_indexed: int = 4):
    import os

    import jax

    if os.environ.get("PLVS_RECALL_TPU", "0") != "1":
        # host CPU: the sandbox's remote-TPU backend ignores JAX_PLATFORMS
        # and per-frame eager extraction through the tunnel compiles every
        # primitive (this must be the FIRST jax call in the process)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from plvs_tpu.features import orb
    from plvs_tpu.geometry import cameras
    from plvs_tpu.io import synthetic
    from plvs_tpu.slam.keyframe_database import KeyFrameDatabase
    from plvs_tpu.slam.map_store import MapStore

    cam = cameras.pinhole(150.0, 150.0, 80.0, 60.0, width=160, height=120,
                          bf=12.0)
    room = synthetic.SyntheticRoom(cam, half=3.0, seed=2, structured=True)
    n_total = n_per_lap * (n_laps_indexed + 1)
    poses = synthetic.orbit_loop_trajectory(
        n_frames=n_total, radius=1.0, laps=float(n_laps_indexed + 1))

    st = MapStore(max_kf=2048, max_pts=256, n_kp=192)
    db = KeyFrameDatabase(st)
    assert db.ensure_vocab(), "shipped vocabulary missing"
    print(f"vocabulary loaded ({type(db.voc).__name__})", file=sys.stderr)

    feats = []
    t0 = time.perf_counter()
    for i, (R, t) in enumerate(poses):
        gray, _ = room.render(R, t)
        kp = orb.extract(jnp.asarray(gray, jnp.float32), 192, 4, 1.2)
        feats.append((np.asarray(kp.desc), np.asarray(kp.mask)))
    print(f"rendered+extracted {n_total} frames in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    # index laps 1..n_laps_indexed; per-KF add latency sampled across the
    # GROWING database (the reference's inverted-file add is O(words))
    n_indexed = n_per_lap * n_laps_indexed
    add_ms = []
    for i in range(n_indexed):
        kf = st.alloc_kf()
        st.kf_mask[kf] = True
        st.kf_kp_desc[kf] = feats[i][0]
        st.kf_kp_mask[kf] = feats[i][1]
        t0 = time.perf_counter()
        db.add(kf)
        add_ms.append((time.perf_counter() - t0) * 1e3)
    add_ms = np.asarray(add_ms)

    # query with the held-out final lap
    hits = top1 = n_q = 0
    q_ms = []
    for i in range(n_indexed, n_total, 5):
        true_angle = i % n_per_lap
        t0 = time.perf_counter()
        cands = db.relocalization_candidates(*feats[i], top_n=5)
        q_ms.append((time.perf_counter() - t0) * 1e3)
        n_q += 1

        def angdist(k):
            d = abs((k % n_per_lap) - true_angle)
            return min(d, n_per_lap - d)

        if cands and any(angdist(k) <= 4 for k, _ in cands):
            hits += 1
        if cands and angdist(cands[0][0]) <= 4:
            top1 += 1
    q_ms = np.asarray(q_ms)

    print(f"database: {n_indexed} keyframes indexed "
          f"({n_laps_indexed} laps x {n_per_lap})")
    print(f"recall@5: {hits / n_q:.3f}  top-1: {top1 / n_q:.3f} "
          f"(n={n_q} held-out-lap queries, +-4-frame angle tolerance)")
    print(f"add latency ms: p50={np.percentile(add_ms, 50):.2f} "
          f"p99={np.percentile(add_ms, 99):.2f} "
          f"(last-100 p50={np.percentile(add_ms[-100:], 50):.2f})")
    print(f"query latency ms at {n_indexed} KFs: "
          f"p50={np.percentile(q_ms, 50):.2f} "
          f"p99={np.percentile(q_ms, 99):.2f}")


if __name__ == "__main__":
    main()
