import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.features import lines as ln


def draw_scene(segs, h=240, w=320, noise=1.5, seed=0):
    img = np.full((h, w), 50.0, np.float32)
    for p0, p1 in segs:
        n = int(np.hypot(p1[0] - p0[0], p1[1] - p0[1]) * 2)
        for t in np.linspace(0, 1, n):
            x = p0[0] + t * (p1[0] - p0[0])
            y = p0[1] + t * (p1[1] - p0[1])
            img[int(y) - 1 : int(y) + 2, int(x) - 1 : int(x) + 2] = 200.0
    rng = np.random.default_rng(seed)
    img += rng.normal(size=img.shape).astype(np.float32) * noise
    return img


SEGS = [((40, 40), (200, 60)), ((60, 200), (250, 140)),
        ((280, 30), (290, 210)), ((30, 220), (30, 100))]


class TestDetection:
    def test_recovers_drawn_segments(self):
        img = draw_scene(SEGS)
        kl = ln.extract_lines(jnp.asarray(img), max_lines=32)
        m = np.asarray(kl.mask)
        assert m.sum() == len(SEGS), m.sum()
        sp = np.asarray(kl.sp)[m]
        ep = np.asarray(kl.ep)[m]
        for p0, p1 in SEGS:
            p0, p1 = np.asarray(p0, np.float32), np.asarray(p1, np.float32)
            best = min(
                min(np.linalg.norm(s - p0) + np.linalg.norm(e - p1),
                    np.linalg.norm(s - p1) + np.linalg.norm(e - p0))
                for s, e in zip(sp, ep)
            )
            assert best < 8.0, (p0, p1, best)

    def test_blank_image(self):
        img = jnp.full((120, 160), 100.0)
        kl = ln.extract_lines(img, max_lines=16)
        assert int(kl.mask.sum()) == 0

    def test_theta_d_representation(self):
        # vertical line x=30: normal (1, 0), d = 30
        sp = jnp.asarray([[30.0, 10.0]])
        ep = jnp.asarray([[30.0, 100.0]])
        theta, d = ln.line_theta_d(sp, ep)
        np.testing.assert_allclose(np.abs(d), 30.0, atol=1e-4)
        np.testing.assert_allclose(theta, 0.0, atol=1e-5)

    def test_line_nld_endpoint_on_line(self):
        sp = jnp.asarray([[40.0, 40.0]])
        ep = jnp.asarray([[200.0, 60.0]])
        nld = ln.line_nld(sp, ep)
        for p in (sp, ep):
            r = jnp.sum(nld[0, :2] * p[0]) + nld[0, 2]
            np.testing.assert_allclose(float(r), 0.0, atol=1e-3)


class TestLBD:
    def test_matching_under_shift(self):
        from plvs_tpu.features import matching

        img1 = draw_scene(SEGS, seed=0)
        shift = 6
        segs2 = [((p0[0] + shift, p0[1]), (p1[0] + shift, p1[1])) for p0, p1 in SEGS]
        img2 = draw_scene(segs2, seed=1)
        kl1 = ln.extract_lines(jnp.asarray(img1), max_lines=32)
        kl2 = ln.extract_lines(jnp.asarray(img2), max_lines=32)
        idx, dist = matching.match_nn_ratio(
            kl1.desc, kl2.desc, kl1.mask, kl2.mask, max_dist=110, ratio=0.95
        )
        idx = np.asarray(idx)
        ok = 0
        total = 0
        for i in np.nonzero(np.asarray(kl1.mask))[0]:
            if idx[i] < 0:
                continue
            total += 1
            mid1 = 0.5 * (np.asarray(kl1.sp[i]) + np.asarray(kl1.ep[i]))
            mid2 = 0.5 * (np.asarray(kl2.sp[idx[i]]) + np.asarray(kl2.ep[idx[i]]))
            if np.linalg.norm(mid2 - mid1 - np.array([shift, 0.0])) < 10.0:
                ok += 1
        assert total >= 3
        assert ok / total >= 0.7, (ok, total)

    def test_descriptor_determinism(self):
        img = draw_scene(SEGS)
        k1 = ln.extract_lines(jnp.asarray(img), max_lines=32)
        k2 = ln.extract_lines(jnp.asarray(img), max_lines=32)
        np.testing.assert_array_equal(np.asarray(k1.desc), np.asarray(k2.desc))


@pytest.mark.slow
class TestLinesInSLAM:
    def test_rgbd_slam_with_lines(self):
        """Full system with use_lines: line landmarks are created, observed
        across keyframes, and ATE stays small."""
        import numpy as np
        from plvs_tpu.geometry import cameras
        from plvs_tpu.io import evaluation, synthetic
        from plvs_tpu.slam import System, SystemConfig

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=24.0)

        # scene with strong line structure: texture of long bars
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=6)
        tex = np.full_like(scene.tex, 40.0)
        rng = np.random.default_rng(0)
        for y in range(30, tex.shape[0] - 30, 48):
            tex[y : y + 6, 20:-20] = rng.uniform(150, 250)
        for x in range(40, tex.shape[1] - 40, 64):
            tex[20:-20, x : x + 6] = rng.uniform(120, 220)
        scene.tex = tex + rng.normal(size=tex.shape).astype(np.float32)

        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, use_lines=True, max_lines=64,
                           loop_closing=False)
        system = System(cam, cfg)
        gt = []
        for ts, gray, depth, R_gt, t_gt in scene.sequence(n_frames=25):
            system.track_rgbd(gray, depth, ts)
            gt.append(-R_gt.T @ t_gt)
        stats = system.map_statistics()
        assert stats["lines"] > 5, stats
        traj = system.trajectory_tum()
        rmse = evaluation.ate_rmse(traj[:, 1:4], np.stack(gt), align=True)
        assert rmse < 0.045, rmse
        # line landmarks must be re-observed (not all single-KF)
        st = system.store
        assert (st.ln_n_obs[st.ln_mask] >= 2).sum() > 0
