import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.geometry import lie
from plvs_tpu.solvers import pose_graph, sim3_solver
from plvs_tpu.vocab import bow


class TestSim3Ransac:
    def test_recovers_transform_with_outliers(self, rng):
        n = 200
        P = rng.normal(size=(n, 3)).astype(np.float32) * 2
        s_gt = 1.6
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.3, -0.5, 0.2], jnp.float32)))
        t_gt = np.array([1.0, -0.5, 2.0], np.float32)
        Q = s_gt * P @ R_gt.T + t_gt + rng.normal(size=(n, 3)).astype(np.float32) * 0.005
        # 30% outliers
        out_idx = rng.choice(n, n * 3 // 10, replace=False)
        Q[out_idx] += rng.uniform(1, 3, (len(out_idx), 3)).astype(np.float32)
        res = sim3_solver.sim3_ransac(
            jnp.asarray(P), jnp.asarray(Q), jnp.ones((n,), bool),
            jax.random.PRNGKey(0),
        )
        np.testing.assert_allclose(float(res.s), s_gt, rtol=0.01)
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=0.01)
        np.testing.assert_allclose(np.asarray(res.t), t_gt, atol=0.05)
        assert int(res.n_inliers) > n * 0.6
        assert np.asarray(res.inliers)[out_idx].mean() < 0.1

    def test_se3_mode_scale_one(self, rng):
        n = 100
        P = rng.normal(size=(n, 3)).astype(np.float32)
        R_gt = np.asarray(lie.so3_exp(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
        t_gt = np.array([0.3, 0.1, -0.2], np.float32)
        Q = P @ R_gt.T + t_gt
        res = sim3_solver.sim3_ransac(
            jnp.asarray(P), jnp.asarray(Q), jnp.ones((n,), bool),
            jax.random.PRNGKey(1), with_scale=False,
        )
        np.testing.assert_allclose(float(res.s), 1.0)
        np.testing.assert_allclose(np.asarray(res.R), R_gt, atol=1e-4)


class TestPoseGraph:
    def _chain_problem(self, rng, K=30, drift=0.02, se3=True):
        """Odometry chain with drift + one loop-closure edge back to start."""
        # ground truth: circle
        gt_R, gt_t = [], []
        for k in range(K):
            ang = 2 * np.pi * k / K
            Rk = np.asarray(lie.so3_exp(jnp.asarray([0.0, ang, 0.0], jnp.float32)))
            C = np.array([np.sin(ang) * 3, 0.0, 3 - np.cos(ang) * 3], np.float32)
            gt_R.append(Rk)
            gt_t.append((-Rk @ C).astype(np.float32))
        gt_R, gt_t = np.stack(gt_R), np.stack(gt_t)
        gt_s = np.ones((K,), np.float32)

        # noisy odometry estimates: integrate noisy relative poses
        est_R = [gt_R[0]]
        est_t = [gt_t[0]]
        for k in range(1, K):
            Rrel, trel, srel = pose_graph.make_edges_from_poses(
                jnp.asarray(gt_R), jnp.asarray(gt_t), jnp.asarray(gt_s),
                jnp.asarray([[k, k - 1]]),
            )
            dn = lie.so3_exp(jnp.asarray(rng.normal(size=3) * drift, jnp.float32))
            Rrel = np.asarray(Rrel[0] @ dn)
            trel = np.asarray(trel[0]) + rng.normal(size=3).astype(np.float32) * drift
            est_R.append((Rrel @ est_R[-1]))
            est_t.append(Rrel @ est_t[-1] + trel)
        est_R, est_t = np.stack(est_R), np.stack(est_t)

        # edges: odometry chain measured from the (noisy) estimates,
        # loop edge measured from ground truth (the loop detection)
        pairs = np.stack([np.arange(1, K), np.arange(0, K - 1)], -1)
        eR, et, es = pose_graph.make_edges_from_poses(
            jnp.asarray(est_R), jnp.asarray(est_t), jnp.asarray(gt_s), jnp.asarray(pairs)
        )
        lR, lt, ls = pose_graph.make_edges_from_poses(
            jnp.asarray(gt_R), jnp.asarray(gt_t), jnp.asarray(gt_s),
            jnp.asarray([[K - 1, 0]]),
        )
        edge_i = jnp.asarray(np.concatenate([pairs[:, 0], [K - 1]]), jnp.int32)
        edge_j = jnp.asarray(np.concatenate([pairs[:, 1], [0]]), jnp.int32)
        edge_R = jnp.concatenate([eR, lR])
        edge_t = jnp.concatenate([et, lt])
        edge_s = jnp.concatenate([es, ls])
        E = edge_i.shape[0]
        fixed = np.zeros((K,), bool)
        fixed[0] = True
        prob = pose_graph.PoseGraphProblem(
            jnp.asarray(est_R), jnp.asarray(est_t), jnp.asarray(gt_s),
            jnp.asarray(fixed), edge_i, edge_j, edge_R, edge_t, edge_s,
            jnp.ones((E,)), jnp.ones((E,), bool),
        )
        return prob, gt_R, gt_t

    def test_loop_correction_reduces_error(self, rng):
        prob, gt_R, gt_t = self._chain_problem(rng)
        R, t, s, info = pose_graph.optimize(prob, num_iters=15, fix_scale=True)
        assert float(info["cost"]) < float(info["cost0"]) * 0.05

        def traj_err(Rs, ts):
            C_est = -np.einsum("kij,kj->ki", np.asarray(Rs).transpose(0, 2, 1), np.asarray(ts))
            C_gt = -np.einsum("kij,kj->ki", gt_R.transpose(0, 2, 1), gt_t)
            return np.linalg.norm(C_est - C_gt, axis=-1).mean()

        err_before = traj_err(prob.R, prob.t)
        err_after = traj_err(R, t)
        assert err_after < err_before * 0.5, (err_before, err_after)
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)  # fix_scale

    def test_fixed_vertex_unmoved(self, rng):
        prob, _, _ = self._chain_problem(rng)
        R, t, s, _ = pose_graph.optimize(prob, num_iters=5, fix_scale=True)
        np.testing.assert_allclose(np.asarray(R[0]), np.asarray(prob.R[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t[0]), np.asarray(prob.t[0]), atol=1e-6)


class TestBow:
    @pytest.fixture(scope="class")
    def voc(self):
        rng = np.random.default_rng(0)
        desc = rng.integers(0, 2 ** 32, (5000, 8), dtype=np.uint32)
        return bow.train(desc, k=8, depth=3, seed=0)

    def test_quantize_shapes(self, voc, rng):
        desc = jnp.asarray(rng.integers(0, 2 ** 32, (100, 8), dtype=np.uint32))
        words = bow.quantize(voc, desc)
        assert words.shape == (100,)
        assert int(words.max()) < voc.n_words
        assert int(words.min()) >= 0

    def test_same_descriptor_same_word(self, voc, rng):
        desc = jnp.asarray(rng.integers(0, 2 ** 32, (50, 8), dtype=np.uint32))
        w1 = bow.quantize(voc, desc)
        w2 = bow.quantize(voc, jnp.concatenate([desc, desc])[:50])
        np.testing.assert_array_equal(w1, w2)

    def test_similar_images_score_higher(self, voc, rng):
        """BoW score of two overlapping descriptor sets >> disjoint sets."""
        base = rng.integers(0, 2 ** 32, (300, 8), dtype=np.uint32)
        # same place: 70% shared descriptors with bit noise
        noise = (1 << rng.integers(0, 32, (300, 8))).astype(np.uint32)
        same = base.copy()
        same[:90] = rng.integers(0, 2 ** 32, (90, 8), dtype=np.uint32)
        same ^= noise * (rng.random((300, 8)) < 0.3)
        other = rng.integers(0, 2 ** 32, (300, 8), dtype=np.uint32)
        m = jnp.ones((300,), bool)
        v0 = bow.bow_vector(voc, bow.quantize(voc, jnp.asarray(base)), m)
        v1 = bow.bow_vector(voc, bow.quantize(voc, jnp.asarray(same)), m)
        v2 = bow.bow_vector(voc, bow.quantize(voc, jnp.asarray(other)), m)
        s_same = float(bow.l1_score(v0, v1))
        s_other = float(bow.l1_score(v0, v2))
        assert s_same > s_other + 0.1, (s_same, s_other)

    def test_database_scoring(self, voc, rng):
        descs = [rng.integers(0, 2 ** 32, (200, 8), dtype=np.uint32) for _ in range(5)]
        m = jnp.ones((200,), bool)
        vecs = jnp.stack([bow.bow_vector(voc, bow.quantize(voc, jnp.asarray(d)), m) for d in descs])
        scores = bow.score_database(vecs[2], vecs)
        assert int(jnp.argmax(scores)) == 2
        np.testing.assert_allclose(float(scores[2]), 1.0, atol=1e-5)


class TestDbow2TextFormat:
    """DBoW2 ORBvoc.txt-format vocabularies (irregular trees)."""

    def _toy_text(self, tmp_path):
        # root(0) -> 1,2 internal; 1 -> 3,4 leaves; 2 -> 5 leaf (irregular)
        rng = np.random.default_rng(3)
        d = rng.integers(0, 256, (6, 32))
        # greedy descent follows internal-node descriptors: make each
        # internal node carry the descriptor of one of its leaves
        d[1] = d[3]
        d[2] = d[5]
        lines = ["2 2 0 0"]
        spec = [(0, 0, 1), (0, 0, 2), (1, 1, 3), (1, 1, 4), (2, 1, 5)]
        for parent, is_leaf, node in spec:
            b = " ".join(str(x) for x in d[node])
            lines.append(f"{parent} {is_leaf} {b} 0.5")
        p = tmp_path / "voc.txt"
        p.write_text("\n".join(lines) + "\n")
        return str(p), d

    def test_load_structure(self, tmp_path):
        path, d = self._toy_text(tmp_path)
        voc = bow.load_dbow2_text(path)
        assert voc.n_words == 3
        assert voc.k == 2 and voc.depth == 2
        wid = np.asarray(voc.word_id)
        assert (wid >= 0).sum() == 3
        # node descriptors survive byte packing
        got = np.asarray(voc.nodes).view(np.uint8).reshape(-1, 32)
        np.testing.assert_array_equal(got[3], d[3].astype(np.uint8))

    def test_quantize_descends_to_nearest_leaf(self, tmp_path):
        path, d = self._toy_text(tmp_path)
        voc = bow.load_dbow2_text(path)
        # query = exact leaf-3 descriptor -> must land on leaf 3's word
        q = jnp.asarray(d[3:4].astype(np.uint8).reshape(1, 32).view(np.uint32))
        w = bow.quantize(voc, q)
        assert int(w[0]) == int(np.asarray(voc.word_id)[3])

    def test_irregular_branch_early_leaf(self, tmp_path):
        path, d = self._toy_text(tmp_path)
        voc = bow.load_dbow2_text(path)
        # query equal to node-2 side: node 5 is reached at depth 1 and must
        # survive the depth-2 descent
        q = jnp.asarray(d[5:6].astype(np.uint8).reshape(1, 32).view(np.uint32))
        w = bow.quantize(voc, q)
        assert int(w[0]) == int(np.asarray(voc.word_id)[5])

    def test_roundtrip(self, tmp_path):
        path, _ = self._toy_text(tmp_path)
        voc = bow.load_dbow2_text(path)
        out = tmp_path / "voc2.txt"
        bow.save_dbow2_text(voc, str(out))
        voc2 = bow.load_dbow2_text(str(out))
        np.testing.assert_array_equal(np.asarray(voc.nodes), np.asarray(voc2.nodes))
        np.testing.assert_array_equal(np.asarray(voc.word_id), np.asarray(voc2.word_id))
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(bow.quantize(voc, q)), np.asarray(bow.quantize(voc2, q)))

    def test_bow_vector_with_general_vocab(self, tmp_path):
        path, _ = self._toy_text(tmp_path)
        voc = bow.load_dbow2_text(path)
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.integers(0, 2 ** 32, (32, 8), dtype=np.uint32))
        words = bow.quantize(voc, q)
        v = bow.bow_vector(voc, words, jnp.ones((32,), bool))
        assert v.shape == (voc.n_words,)
        np.testing.assert_allclose(float(v.sum()), 1.0, rtol=1e-5)


class TestBinaryVocabulary:
    """DBoW2 .bin format (reference: TemplatedVocabulary::loadFromBinaryFile
    / saveToBinaryFile + the bin_vocabulary converter)."""

    def _toy_voc(self, tmp_path):
        rng = np.random.default_rng(3)
        d = rng.integers(0, 255, (6, 32), np.uint8)
        lines = ["2 2 0 0"]
        spec = [(0, 0, 1), (0, 0, 2), (1, 1, 3), (1, 1, 4), (2, 1, 5)]
        for parent, is_leaf, node in spec:
            b = " ".join(str(x) for x in d[node])
            lines.append(f"{parent} {is_leaf} {b} 0.5")
        p = tmp_path / "voc.txt"
        p.write_text("\n".join(lines) + "\n")
        return bow.load_dbow2_text(str(p))

    def test_binary_roundtrip(self, tmp_path):
        voc = self._toy_voc(tmp_path)
        out = str(tmp_path / "voc.bin")
        bow.save_dbow2_binary(voc, out)
        voc2 = bow.load_dbow2_binary(out)
        assert voc2.k == voc.k and voc2.depth == voc.depth
        assert voc2.n_words == voc.n_words
        np.testing.assert_array_equal(np.asarray(voc.nodes),
                                      np.asarray(voc2.nodes))
        np.testing.assert_array_equal(np.asarray(voc.word_id),
                                      np.asarray(voc2.word_id))
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.integers(0, 2 ** 32, (64, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(bow.quantize(voc, q)), np.asarray(bow.quantize(voc2, q)))

    def test_binary_record_layout(self, tmp_path):
        """The on-disk node record must be the reference's packed 41 bytes."""
        voc = self._toy_voc(tmp_path)
        out = str(tmp_path / "voc.bin")
        bow.save_dbow2_binary(voc, out)
        raw = open(out, "rb").read()
        nb_nodes, size_node = np.frombuffer(raw[:8], "<u4")
        assert size_node == 41 and nb_nodes == 5
        assert len(raw) == 8 + 16 + 41 * 5
        k, L, scoring, weighting = np.frombuffer(raw[8:24], "<i4")
        assert (k, L) == (2, 2)

    def test_load_vocabulary_dispatches_by_extension(self, tmp_path):
        voc = self._toy_voc(tmp_path)
        b = str(tmp_path / "voc.bin")
        bow.save_dbow2_binary(voc, b)
        t = str(tmp_path / "voc2.txt")
        bow.save_dbow2_text(voc, t)
        n = str(tmp_path / "voc3.npz")
        voc.save(n)
        for p in (b, t, n):
            v = bow.load_vocabulary(p)
            assert v.n_words == voc.n_words


class TestCoincidenceGate:
    """The consecutive-coincidence gate of loop detection (reference:
    NewDetectCommonRegions requires N successive keyframes confirming the
    same region before CorrectLoop runs, src/LoopClosing.cc:377-459)."""

    def _build(self, rng, required):
        from plvs_tpu.slam.keyframe_database import KeyFrameDatabase
        from plvs_tpu.slam.loop_closing import LoopCloser
        from plvs_tpu.slam.map_store import MapStore

        st = MapStore(max_kf=32, max_pts=4096, max_obs=32768, n_kp=256)
        n_pts = 220
        xyz = np.stack([
            rng.uniform(-2, 2, n_pts), rng.uniform(-1.5, 1.5, n_pts),
            rng.uniform(2.8, 3.2, n_pts)], -1).astype(np.float32)
        desc = rng.integers(0, 2**32, (n_pts, 8), dtype=np.uint32)

        def add_kf(t_cw, pt_ids, frame_id):
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
            st.kf_R[kf] = np.eye(3, dtype=np.float32)
            st.kf_t[kf] = t_cw
            st.kf_frame_id[kf] = frame_id
            n = len(pt_ids)
            st.kf_kp_desc[kf, :n] = st.pt_desc[pt_ids]
            st.kf_kp_mask[kf, :n] = True
            st.add_observations(kf, pt_ids, np.arange(n))
            return kf

        # original visit: two keyframes observing the wall
        p0 = st.alloc_pts(n_pts)
        st.pt_mask[p0] = True
        st.pt_xyz[p0] = xyz
        st.pt_desc[p0] = desc
        kf0 = add_kf(np.zeros(3, np.float32), p0, 0)
        st.pt_ref_kf[p0] = kf0
        add_kf(np.array([0.05, 0, 0], np.float32), p0, 1)

        # revisit after drift: duplicated landmarks shifted by +0.3m x
        drift = np.array([0.3, 0.0, 0.0], np.float32)
        p1 = st.alloc_pts(n_pts)
        st.pt_mask[p1] = True
        st.pt_xyz[p1] = xyz + drift
        st.pt_desc[p1] = desc
        kf2 = add_kf((-drift).astype(np.float32), p1, 200)
        st.pt_ref_kf[p1] = kf2
        kf3 = add_kf((-drift + np.array([0.04, 0, 0])).astype(np.float32),
                     p1, 201)
        # strong_inliers disabled: these tests exercise the coincidence
        # STREAK logic specifically (the overwhelming-support shortcut is
        # covered by test_strong_single_hit_closes_immediately)
        closer = LoopCloser(
            st, kfdb=KeyFrameDatabase(st, min_train_descs=128,
                                      vocab_train_descs=512),
            required_coincidences=required, strong_inliers=10 ** 9)
        for k in (kf0, 1):
            closer.kfdb.add(k)
        return st, closer, kf2, kf3

    def test_two_coincidences_needed(self, rng):
        st, closer, kf2, kf3 = self._build(rng, required=2)
        assert closer.process_keyframe(kf2) is None   # first hit: pending
        assert closer._pending is not None and closer._pending["count"] == 1
        info = closer.process_keyframe(kf3)           # consecutive confirm
        assert info is not None, "loop not closed after 2 coincidences"
        assert closer._pending is None

    def test_gap_resets_pending(self, rng):
        st, closer, kf2, kf3 = self._build(rng, required=2)
        assert closer.process_keyframe(kf2) is None

        def blank_kf(frame_id):
            k = st.alloc_kf()
            st.kf_mask[k] = True
            st.kf_R[k] = np.eye(3, dtype=np.float32)
            st.kf_t[k] = np.array([50.0, 0, 0], np.float32)
            st.kf_frame_id[k] = frame_id
            st.kf_kp_desc[k, :64] = rng.integers(
                0, 2**32, (64, 8), dtype=np.uint32)
            st.kf_kp_mask[k, :64] = True
            return k

        # ONE unrecognisable keyframe is tolerated (sparse keyframes can
        # skip a revisit frame)...
        closer.process_keyframe(blank_kf(202))
        assert closer._pending is not None
        # ...but a second consecutive miss breaks the streak
        closer.process_keyframe(blank_kf(203))
        assert closer._pending is None

    def test_strong_support_shortcuts_long_streak(self, rng):
        """Overwhelming expanded support (>= strong_inliers) closes after
        ONE confirming coincidence even when required_coincidences is
        higher — but NEVER on a single detection (a single aliased
        strong match on repeated texture must not close immediately)."""
        st, closer, kf2, kf3 = self._build(rng, required=3)
        closer.strong_inliers = 60
        info = closer.process_keyframe(kf2)
        assert info is None, "strong single detection must not close"
        assert closer._pending is not None
        info = closer.process_keyframe(kf3)
        assert info is not None, \
            "strong support + one confirmation should shortcut required=3"
        assert info["inliers"] >= 60

    def test_single_coincidence_closes_immediately(self, rng):
        st, closer, kf2, _ = self._build(rng, required=1)
        info = closer.process_keyframe(kf2)
        assert info is not None
        # guided expansion found the duplicated wall and fused it
        assert info.get("n_fused", 0) >= 25
