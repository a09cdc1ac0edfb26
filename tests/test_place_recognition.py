"""Place recognition at scale: 10k-word vocabulary + native inverted index.

VERDICT r1 item 5 acceptance: the shipped >=10k-word vocabulary replaces the
512-word lazy fallback, queries run through the native inverted file with
the shared-word prefilter, and a self-similar scene (wrapping repeated
texture) closes ZERO false loops under the 2-coincidence gate (reference:
KeyFrameDatabase::DetectNBestCandidates include/KeyFrameDatabase.h:106,
LoopClosing's 3-coincidence confirmation src/LoopClosing.cc:377-459).
"""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import synthetic
from plvs_tpu.slam import System, SystemConfig
from plvs_tpu.slam.keyframe_database import _DEFAULT_VOCAB

CAM = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320, height=240,
                      bf=24.0)


class TestVocabulary:
    def test_default_vocab_is_10k(self):
        import os

        assert os.path.exists(_DEFAULT_VOCAB), "shipped vocabulary missing"
        from plvs_tpu.slam.map_store import MapStore
        from plvs_tpu.slam.keyframe_database import KeyFrameDatabase

        db = KeyFrameDatabase(MapStore(max_kf=8, max_pts=256, n_kp=64))
        assert db.ensure_vocab()
        assert db.voc.n_words >= 10_000

    def test_native_inverted_index_is_product_path(self):
        from plvs_tpu import native

        if not native.available():
            pytest.skip("native library unavailable")
        from plvs_tpu.slam.map_store import MapStore
        from plvs_tpu.slam.keyframe_database import KeyFrameDatabase

        st = MapStore(max_kf=8, max_pts=256, n_kp=64)
        db = KeyFrameDatabase(st)
        rng = np.random.default_rng(0)
        descs = [rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32)
                 for _ in range(3)]
        descs.append(descs[0])  # KF 3 is a twin of KF 0
        for k, d in enumerate(descs):
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
            st.kf_kp_desc[kf] = d
            st.kf_kp_mask[kf] = True
            db.add(kf)
        assert db._inv is not None, "dense fallback used despite native lib"
        assert db.kf_bow is None
        # the twin keyframe must be found and ranked first
        res = db.query_sparse(*db._kf_words[3], exclude={3})
        assert res and res[0][0] == 0, res

    def test_query_ranks_true_revisit_first(self):
        from plvs_tpu.slam.map_store import MapStore
        from plvs_tpu.slam.keyframe_database import KeyFrameDatabase
        import jax.numpy as jnp
        from plvs_tpu.features import orb

        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, seed=3)
        poses = synthetic.default_trajectory(8)
        st = MapStore(max_kf=16, max_pts=256, n_kp=256)
        db = KeyFrameDatabase(st)
        for i, (R, t) in enumerate(poses):
            gray, _ = scene.render(R, t)
            kp = orb.extract(jnp.asarray(gray, jnp.float32), 256, 4, 1.2)
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
            st.kf_kp_desc[kf] = np.asarray(kp.desc)
            st.kf_kp_mask[kf] = np.asarray(kp.mask)
            db.add(kf)
        # a revisit of pose 1 must rank KF 1 first
        gray, _ = scene.render(*poses[1])
        kp = orb.extract(jnp.asarray(gray, jnp.float32), 256, 4, 1.2)
        cands = db.relocalization_candidates(np.asarray(kp.desc),
                                             np.asarray(kp.mask))
        assert cands and cands[0][0] == 1, cands


@pytest.mark.slow
class TestSelfSimilarScene:
    def test_zero_false_loops_on_repeated_texture(self):
        """Lateral sweep over a wrapping texture (period ~1.2 m): every
        view beyond one period looks like an earlier one, but no true
        revisit happens — any closed loop is false."""
        tex = synthetic.make_texture(256, np.random.default_rng(5))
        scene = synthetic.SyntheticRGBD(CAM, wall_z=3.0, texture=tex,
                                        tex_scale=220.0)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=128,
                           max_pts=32768, new_map_after_lost=0)
        system = System(CAM, cfg)
        n = 60
        for i in range(n):
            s = i / (n - 1)
            R = np.eye(3, dtype=np.float32)
            C = np.array([3.0 * s, 0.0, 0.0], np.float32)
            t = (-R @ C).astype(np.float32)
            gray, depth = scene.render(R, t)
            system.track_rgbd(gray, depth, i / 30.0)
        assert len(system.loops_closed) == 0, system.loops_closed


@pytest.mark.slow
class TestLargeMapRecall:
    def test_recall_on_500kf_map_with_repeated_structure(self):
        """Place-recognition recall at scale (VERDICT r3 item 6): a 500-KF
        synthetic map — two orbit laps of a 4-wall structured room whose
        walls repeat panel/blob motifs — indexed with the shipped product
        vocabulary. Every second-lap query must rank a first-lap keyframe
        from (nearly) the same viewing angle among its top candidates
        (reference scale: KeyFrameDatabase::DetectNBestCandidates over the
        ~1M-leaf ORBvoc, include/KeyFrameDatabase.h:91)."""
        import jax.numpy as jnp

        from plvs_tpu.features import orb
        from plvs_tpu.slam.keyframe_database import KeyFrameDatabase
        from plvs_tpu.slam.map_store import MapStore

        cam = cameras.pinhole(150.0, 150.0, 80.0, 60.0, width=160,
                              height=120, bf=12.0)
        room = synthetic.SyntheticRoom(cam, half=3.0, seed=2,
                                       structured=True)
        n_per_lap = 250
        poses = synthetic.orbit_loop_trajectory(n_frames=2 * n_per_lap,
                                                radius=1.0, laps=2.0)

        st = MapStore(max_kf=512, max_pts=256, n_kp=192)
        db = KeyFrameDatabase(st)
        assert db.ensure_vocab()
        feats = []
        for i, (R, t) in enumerate(poses):
            gray, _ = room.render(R, t)
            kp = orb.extract(jnp.asarray(gray, jnp.float32), 192, 4, 1.2)
            feats.append((np.asarray(kp.desc), np.asarray(kp.mask)))
        # index lap 1 only
        for i in range(n_per_lap):
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
            st.kf_kp_desc[kf] = feats[i][0]
            st.kf_kp_mask[kf] = feats[i][1]
            db.add(kf)
        # query with lap 2: ground truth = same-angle lap-1 keyframe
        hits = top1_err = n_q = 0
        for i in range(n_per_lap, 2 * n_per_lap, 5):
            true_kf = i - n_per_lap
            cands = db.relocalization_candidates(*feats[i], top_n=5)
            n_q += 1
            def angdist(k):
                d = abs(k - true_kf)
                return min(d, n_per_lap - d)
            if cands and any(angdist(k) <= 4 for k, _ in cands):
                hits += 1
            if cands and angdist(cands[0][0]) <= 4:
                top1_err += 1
        recall = hits / n_q
        top1 = top1_err / n_q
        assert recall >= 0.85, (recall, top1, n_q)
        assert top1 >= 0.70, (recall, top1, n_q)
