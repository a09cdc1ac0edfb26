"""Native C++ runtime tests: each engine vs an independent numpy oracle."""

import numpy as np
import pytest

from plvs_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native runtime unavailable: {native.build_error()}",
)


def _random_obs(rng, n_kf=20, n_pts=300, n_obs=1500):
    okf = rng.integers(0, n_kf, n_obs).astype(np.int64)
    opt = rng.integers(0, n_pts, n_obs).astype(np.int64)
    # dedup (kf, pt) pairs — the map store never stores duplicates
    _, idx = np.unique(okf * n_pts + opt, return_index=True)
    okf, opt = okf[idx], opt[idx]
    mask = rng.random(len(okf)) > 0.1
    return okf, opt, mask


class TestCovisibility:
    def test_counts_match_numpy(self, rng):
        okf, opt, mask = _random_obs(rng)
        for kf in (0, 3, 19):
            got = native.covis_counts(okf, opt, mask, kf, 20, 300)
            my = set(opt[(okf == kf) & mask].tolist())
            want = np.zeros(20, np.int32)
            for k, p, m in zip(okf, opt, mask):
                if m and k != kf and p in my:
                    want[k] += 1
            np.testing.assert_array_equal(got, want)

    def test_graph_matches_bruteforce(self, rng):
        okf, opt, mask = _random_obs(rng)
        ei, ej, w = native.covis_graph(okf, opt, mask, 20, 300, min_weight=2)
        assert np.all(ei < ej)
        # brute force
        want = {}
        pts_of = {k: set(opt[(okf == k) & mask].tolist()) for k in range(20)}
        for i in range(20):
            for j in range(i + 1, 20):
                c = len(pts_of[i] & pts_of[j])
                if c >= 2:
                    want[(i, j)] = c
        got = {(int(a), int(b)): int(c) for a, b, c in zip(ei, ej, w)}
        assert got == want

    def test_graph_capacity_retry(self, rng):
        okf, opt, mask = _random_obs(rng)
        full = native.covis_graph(okf, opt, mask, 20, 300, min_weight=1)
        small = native.covis_graph(okf, opt, mask, 20, 300, min_weight=1, cap=4)
        assert len(small[0]) == len(full[0])
        a = set(zip(*[x.tolist() for x in full]))
        b = set(zip(*[x.tolist() for x in small]))
        assert a == b

    def test_spanning_tree(self):
        ei = np.array([0, 0, 1, 1], np.int32)
        ej = np.array([1, 2, 2, 3], np.int32)
        w = np.array([10, 5, 20, 7], np.int32)
        parent = native.spanning_tree(ei, ej, w, 5)
        assert parent[0] == -1          # root
        assert parent[1] == 0           # only incoming edge
        assert parent[2] == 1           # weight 20 beats 5
        assert parent[3] == 1
        assert parent[4] == -1          # isolated

    def test_mapstore_covisibility_native_equals_numpy(self, rng, monkeypatch):
        from plvs_tpu.slam.map_store import MapStore

        st = MapStore(max_kf=16, max_pts=256, max_obs=4096, n_kp=64)
        for k in range(6):
            kf = st.alloc_kf()
            st.kf_mask[kf] = True
        pids = st.alloc_pts(100)
        st.pt_mask[pids] = True
        for pid in pids:
            for k in rng.choice(6, size=int(rng.integers(2, 5)),
                                replace=False):
                st.add_observations(int(k), np.array([pid]),
                                    np.array([int(rng.integers(0, 64))]))
        ids_nat, w_nat = st.covisibility(2, min_weight=3)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_lib_err", "forced off")
        ids_np, w_np = st.covisibility(2, min_weight=3)
        np.testing.assert_array_equal(ids_nat, ids_np)
        np.testing.assert_array_equal(w_nat, w_np)


class TestInvertedIndex:
    def test_l1_scores_match_dense(self, rng):
        n_words, n_kf = 64, 10
        ix = native.InvertedIndex(n_words, n_kf)
        dense = np.zeros((n_kf, n_words), np.float32)
        for k in range(n_kf):
            nw = rng.integers(5, 20)
            words = rng.choice(n_words, nw, replace=False).astype(np.int32)
            wts = rng.random(nw).astype(np.float32)
            ix.add(k, words, wts)
            dense[k, words] = wts
        dense /= dense.sum(-1, keepdims=True)

        nw = 12
        qw = rng.choice(n_words, nw, replace=False).astype(np.int32)
        qv = rng.random(nw).astype(np.float32)
        qdense = np.zeros(n_words, np.float32)
        qdense[qw] = qv
        qdense /= qdense.sum()

        scores, shared = ix.query(qw, qv)
        # DBoW2 L1 score: 1 - 0.5 * |a - b|_1 for L1-normalised vectors
        want = 1.0 - 0.5 * np.abs(dense - qdense[None]).sum(-1)
        np.testing.assert_allclose(scores, want, atol=1e-5)
        want_shared = ((dense > 0) & (qdense > 0)[None]).sum(-1)
        np.testing.assert_array_equal(shared, want_shared)
        ix.close()

    def test_remove(self, rng):
        ix = native.InvertedIndex(16, 4)
        words = np.arange(8, dtype=np.int32)
        wts = np.ones(8, np.float32)
        ix.add(0, words, wts)
        ix.add(1, words, wts)
        ix.remove(0)
        scores, shared = ix.query(words, wts)
        assert scores[0] == 0 and shared[0] == 0
        assert scores[1] > 0.99
        ix.close()


class TestPngIO:
    def _write_png(self, path, arr, mode):
        from PIL import Image

        Image.fromarray(arr, mode=mode).save(path)

    def test_gray8_roundtrip(self, rng, tmp_path):
        img = rng.integers(0, 256, (37, 53), dtype=np.uint8)
        p = str(tmp_path / "g8.png")
        self._write_png(p, img, "L")
        got = native.read_png_gray(p)
        np.testing.assert_array_equal(got, img.astype(np.float32))

    def test_gray16_roundtrip(self, rng, tmp_path):
        img = rng.integers(0, 65536, (24, 31), dtype=np.uint16)
        p = str(tmp_path / "g16.png")
        self._write_png(p, img, "I;16")
        got = native.read_png_gray(p)
        np.testing.assert_array_equal(got, img.astype(np.float32))

    def test_rgb_luma(self, rng, tmp_path):
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        p = str(tmp_path / "rgb.png")
        self._write_png(p, img, "RGB")
        got = native.read_png_gray(p)
        want = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                + 0.114 * img[..., 2]).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=0.51)

    def test_prefetcher_in_order(self, rng, tmp_path):
        paths = []
        imgs = []
        for i in range(12):
            img = rng.integers(0, 256, (20, 20), dtype=np.uint8)
            p = str(tmp_path / f"f{i}.png")
            self._write_png(p, img, "L")
            paths.append(p)
            imgs.append(img)
        pf = native.ImagePrefetcher(paths, cap_px=20 * 20, n_threads=3,
                                    window=4)
        out = list(pf)
        pf.close()
        assert len(out) == 12
        for got, want in zip(out, imgs):
            np.testing.assert_array_equal(got, want.astype(np.float32))

    def test_dataset_reader_uses_native(self, rng, tmp_path):
        from plvs_tpu.io.datasets import _imread_depth, _imread_gray

        img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
        p = str(tmp_path / "x.png")
        self._write_png(p, img, "L")
        np.testing.assert_array_equal(_imread_gray(p), img.astype(np.float32))
        d16 = rng.integers(0, 65536, (8, 8), dtype=np.uint16)
        pd = str(tmp_path / "d.png")
        self._write_png(pd, d16, "I;16")
        np.testing.assert_allclose(
            _imread_depth(pd, 5000.0), d16.astype(np.float32) / 5000.0)


class TestBoundsHardening:
    """Out-of-range ids must be skipped, not trusted (heap safety of the
    in-process host runtime)."""

    def test_covis_counts_ignores_out_of_range_ids(self):
        if not native.available():
            pytest.skip("native unavailable")
        okf = np.array([0, 1, 99, 0, 1], np.int64)
        opt = np.array([5, 5, 5, 777, -3], np.int64)  # 777/-3 out of range
        m = np.ones(5, np.uint8)
        counts = native.covis_counts(okf, opt, m, 0, max_kf=4, max_pts=8)
        assert counts[1] == 1  # only the valid shared landmark counted
        assert counts.sum() == 1

    def test_invindex_ignores_invalid_words(self):
        if not native.available():
            pytest.skip("native unavailable")
        ix = native.InvertedIndex(16, max_kf=4)
        words = np.array([3, -1, 99], np.int32)  # -1 and 99 invalid
        w = np.array([1.0, 1.0, 1.0], np.float32)
        ix.add(0, words, w)
        scores, shared = ix.query(words, w)
        assert shared[0] == 1 and np.isfinite(scores).all()
        ix.close()
