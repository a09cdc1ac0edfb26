import jax
import jax.numpy as jnp
import numpy as np

from plvs_tpu.features import fast, matching, orb, pyramid


def checker_image(h=240, w=320, sq=24, rng=None):
    """Grid of isolated bright squares: strong FAST (L-)corners at known
    locations. (A perfect checkerboard would NOT work: its X-corners have
    8/8 bright/dark arcs and FAST-9 needs 9 contiguous — same as OpenCV.)"""
    img = np.full((h, w), 30.0, np.float32)
    side = sq * 14 // 24
    for y in range(20, h - side, 30):
        for x in range(20, w - side, 30):
            img[y : y + side, x : x + side] = 200.0
    if rng is not None:
        img += rng.normal(size=(h, w)).astype(np.float32) * 2.0
    return jnp.asarray(img)


class TestPyramid:
    def test_shapes(self):
        img = jnp.zeros((480, 640), jnp.float32)
        lv = pyramid.build_pyramid(img, 8, 1.2)
        assert len(lv) == 8
        assert lv[0].shape == (480, 640)
        assert lv[1].shape == (400, 533)

    def test_blur_preserves_mean(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (64, 64)).astype(np.float32))
        b = pyramid.gaussian_blur(img)
        np.testing.assert_allclose(float(b.mean()), float(img.mean()), rtol=1e-2)


class TestFast:
    def test_detects_checker_corners(self, rng):
        img = checker_image(rng=rng)
        xy, score, valid = fast.detect(img, 300)
        n = int(valid.sum())
        assert n > 50, n
        # detected corners should sit at square corners: x,y = 20 + 30k (+side)
        v = np.asarray(xy[np.asarray(valid)])

        def offs(c):
            m = (c - 20) % 30
            return np.minimum.reduce([np.abs(m), np.abs(m - 14), np.abs(30 - m)])

        assert np.median(np.maximum(offs(v[:, 0]), offs(v[:, 1]))) <= 2.0

    def test_blank_image_no_corners(self):
        img = jnp.full((120, 160), 128.0, jnp.float32)
        _, _, valid = fast.detect(img, 100)
        assert int(valid.sum()) == 0

    def test_capacity_padding(self, rng):
        img = checker_image(rng=rng)
        xy, score, valid = fast.detect(img, 5000)
        assert xy.shape == (5000, 2)
        assert not bool(valid[-1])


class TestOrb:
    def test_extract_shapes(self, rng):
        img = checker_image(240, 320, rng=rng)
        kp = orb.extract(img, num_features=512, n_levels=4)
        assert kp.xy.shape[0] == kp.desc.shape[0] == kp.mask.shape[0]
        assert kp.desc.dtype == jnp.uint32
        assert int(kp.mask.sum()) > 100

    def test_rotation_invariance(self, rng):
        """Descriptor of a patch and its 90-deg rotation should match."""
        patch = rng.uniform(0, 255, (200, 200)).astype(np.float32)
        img = jnp.asarray(patch)
        img90 = jnp.rot90(img, k=-1)  # clockwise
        kp = orb.extract(img, num_features=64, n_levels=1)
        kp90 = orb.extract(img90, num_features=64, n_levels=1)
        v = np.asarray(kp.mask)
        v90 = np.asarray(kp90.mask)
        # map kp coords into rotated frame: (x, y) -> (W-1-y, x) for cw rot
        h, w = 200, 200
        xy = np.asarray(kp.xy)
        xy_rot = np.stack([h - 1 - xy[:, 1], xy[:, 0]], -1)
        d = matching.hamming(kp.desc, kp90.desc)
        d = np.asarray(d)
        # for each valid kp, find the rotated kp at the same location
        matches = 0
        good = 0
        for i in np.nonzero(v)[0]:
            j = np.argmin(np.linalg.norm(np.asarray(kp90.xy) - xy_rot[i], axis=-1))
            if not v90[j]:
                continue
            if np.linalg.norm(np.asarray(kp90.xy)[j] - xy_rot[i]) > 2.0:
                continue
            matches += 1
            if d[i, j] < 80:
                good += 1
        assert matches > 10
        assert good / matches > 0.8, (good, matches)

    def test_descriptor_determinism(self, rng):
        img = checker_image(rng=rng)
        kp1 = orb.extract(img, num_features=256, n_levels=2)
        kp2 = orb.extract(img, num_features=256, n_levels=2)
        np.testing.assert_array_equal(kp1.desc, kp2.desc)


class TestMatching:
    def test_hamming_basic(self):
        d1 = jnp.array([[0, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
        d2 = jnp.array([[1, 0, 0, 0, 0, 0, 0, 0], [0xFFFFFFFF, 0, 0, 0, 0, 0, 0, 0]], jnp.uint32)
        d = matching.hamming(d1, d2)
        np.testing.assert_array_equal(d, [[1, 32]])

    def test_shifted_image_matching(self, rng):
        img = checker_image(240, 320, rng=rng)
        shift = 5
        img2 = jnp.roll(img, shift, axis=1)
        kp1 = orb.extract(img, num_features=256, n_levels=2)
        kp2 = orb.extract(img2, num_features=256, n_levels=2)
        idx, dist = matching.match_nn_ratio(
            kp1.desc, kp2.desc, kp1.mask, kp2.mask, max_dist=64
        )
        m = np.asarray(idx) >= 0
        assert m.sum() > 30
        dx = np.asarray(kp2.xy)[np.asarray(idx)[m], 0] - np.asarray(kp1.xy)[m, 0]
        # majority should see the true shift (mod wrap-around effects)
        frac = np.mean(np.abs(dx - shift) < 1.5)
        assert frac > 0.7, frac

    def test_search_by_projection_window(self, rng):
        img = checker_image(240, 320, rng=rng)
        kp = orb.extract(img, num_features=256, n_levels=2)
        # map features = the keypoints themselves, projected with small offset
        idx, dist = matching.search_by_projection(
            kp.xy + 2.0, kp.mask, kp.desc, kp.octave,
            kp.xy, kp.desc, kp.octave, kp.mask, radius=8.0,
        )
        m = np.asarray(idx)
        v = np.asarray(kp.mask)
        # each map feature should find its own keypoint
        acc = (m[v] == np.arange(len(m))[v]).mean()
        assert acc > 0.9, acc

    def test_rotation_consistency_filter(self):
        dtheta = jnp.concatenate([jnp.full((90,), 0.1), jnp.linspace(-3, 3, 10)])
        ok = jnp.ones((100,), bool)
        kept = matching.rotation_consistency(dtheta, ok)
        assert bool(kept[:90].all())
        assert int(kept[90:].sum()) <= 3
