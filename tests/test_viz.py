"""Viewer-layer tests: frame overlays, map rendering/export, rerun no-op."""

import numpy as np

from plvs_tpu.viz import frame_drawer as fd
from plvs_tpu.viz import map_drawer as md
from plvs_tpu.viz import rerun_logger as rl


class TestFrameDrawer:
    def test_overlay_marks_features(self, rng):
        gray = rng.uniform(0, 255, (120, 160)).astype(np.float32)
        kp = np.array([[40.0, 60.0], [100.0, 30.0]], np.float32)
        tracked = np.array([True, False])
        img = fd.draw_frame(gray, kp_xy=kp, kp_tracked=tracked, state=2)
        assert img.shape == (120, 160, 3) and img.dtype == np.uint8
        assert tuple(img[60 - 2, 40]) == fd.GREEN     # tracked square
        assert tuple(img[30 - 2, 100]) == fd.BLUE     # untracked square
        assert tuple(img[0, 0]) == fd.GREEN           # OK state strip

    def test_segments_and_lost_state(self, rng):
        gray = np.zeros((100, 100), np.float32)
        img = fd.draw_frame(
            gray, kl_p0=np.array([[10.0, 50.0]]), kl_p1=np.array([[90.0, 50.0]]),
            state=4)
        assert tuple(img[50, 50]) == fd.GREEN          # line pixel
        assert tuple(img[0, 0]) == fd.RED              # LOST strip

    def test_out_of_bounds_is_safe(self):
        gray = np.zeros((50, 50), np.float32)
        img = fd.draw_frame(gray, kp_xy=np.array([[-10.0, 200.0], [49.0, 49.0]]))
        assert img.shape == (50, 50, 3)

    def test_save_png(self, tmp_path, rng):
        img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
        p = str(tmp_path / "f.png")
        fd.save_png(p, img)
        import os

        assert os.path.exists(p) or os.path.exists(p[:-4] + ".ppm")


def _small_store(rng):
    from plvs_tpu.slam.map_store import MapStore

    st = MapStore(max_kf=8, max_pts=128, max_obs=1024, n_kp=32)
    for k in range(3):
        kf = st.alloc_kf()
        st.kf_mask[kf] = True
        st.kf_R[kf] = np.eye(3)
        st.kf_t[kf] = np.array([0.1 * k, 0, 0], np.float32)
    pids = st.alloc_pts(50)
    st.pt_mask[pids] = True
    st.pt_xyz[pids] = rng.normal(size=(50, 3)).astype(np.float32)
    for pid in pids:
        for k in range(3):
            st.add_observations(int(k), np.array([pid]),
                                np.array([int(rng.integers(0, 32))]))
    return st


class TestMapDrawer:
    def test_frusta_count(self, rng):
        st = _small_store(rng)
        segs = md.keyframe_frusta(st.kf_R, st.kf_t, st.kf_mask)
        assert segs.shape == (3 * 8, 2, 3)

    def test_covisibility_segments(self, rng):
        st = _small_store(rng)
        segs = md.covisibility_segments(st, min_weight=10)
        assert len(segs) == 3  # all three KFs share all 50 points

    def test_render_map_png(self, rng, tmp_path):
        st = _small_store(rng)
        p = str(tmp_path / "map.png")
        ok = md.render_map_png(p, st, traj=np.zeros((5, 3), np.float32))
        import os

        assert not ok or (os.path.exists(p) and os.path.getsize(p) > 1000)

    def test_save_segments_ply(self, rng, tmp_path):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        labels = np.array([0, 1, 1, 2, 2, 2, 0, 3, 3, 1], np.int32)
        p = str(tmp_path / "seg.ply")
        md.save_segments_ply(p, pts, labels)
        txt = open(p).read()
        assert "element vertex 10" in txt
        assert len(txt.strip().splitlines()) == 10 + 10  # header + rows


class TestRerun:
    def test_noop_without_sdk(self, rng):
        # rerun is not installed in this image: every call must be a no-op
        assert rl.available() in (True, False)
        rl.log_frame(np.zeros((10, 10)), np.zeros((2, 2)))
        rl.log_map(np.zeros((5, 3)))
        rl.log_trajectory(np.zeros((4, 3)))
