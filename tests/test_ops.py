"""Pallas kernel tests (interpreter mode on CPU; compiled path is exercised
on TPU hardware by the bench/driver runs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.dense import stereo_depth as sd
from plvs_tpu.ops import hamming as ham_ops
from plvs_tpu.ops import stereo as stereo_ops


class TestHammingKernels:
    @pytest.mark.parametrize("kernel", ["mxu", "vpu"])
    def test_matches_reference(self, rng, kernel):
        dq = jnp.asarray(rng.integers(0, 2**32, (150, 8), dtype=np.uint32))
        dk = jnp.asarray(rng.integers(0, 2**32, (201, 8), dtype=np.uint32))
        ref = ham_ops.hamming_jnp(dq, dk)
        out = ham_ops.hamming_pallas(dq, dk, kernel=kernel, interpret=True)
        assert out.shape == ref.shape
        assert bool(jnp.all(out == ref))

    def test_tile_multiple_shapes(self, rng):
        dq = jnp.asarray(rng.integers(0, 2**32, (128, 8), dtype=np.uint32))
        dk = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
        ref = ham_ops.hamming_jnp(dq, dk)
        out = ham_ops.hamming_pallas(dq, dk, kernel="vpu", interpret=True)
        assert bool(jnp.all(out == ref))

    def test_zero_distance_on_identical(self, rng):
        d = jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32))
        out = ham_ops.hamming_pallas(d, d, kernel="mxu", interpret=True)
        assert bool(jnp.all(jnp.diag(out) == 0))


class TestStereoKernel:
    def test_matches_jnp_volume_path(self, rng):
        H, W, D = 32, 128, 16
        true_d = 5
        base = rng.uniform(0, 255, (H, W + 2 * D)).astype(np.float32)
        left = jnp.asarray(base[:, D:W + D])
        right = jnp.asarray(base[:, D + true_d:W + D + true_d])
        ref = np.asarray(sd.disparity(left, right, max_disp=D))
        cl = sd.census_transform(left, 2)
        cr = sd.census_transform(right, 2)
        out = np.asarray(
            stereo_ops.disparity_wta_pallas(cl, cr, max_disp=D, interpret=True)
        )
        out = np.asarray(sd._median3(jnp.asarray(out)))
        # interiors must agree (borders may differ: kernel avoids the jnp
        # path's column wrap-around in the right-image WTA)
        m = (ref > 0) & (out > 0)
        m[:6] = m[-6:] = False
        m[:, :D + 6] = False
        m[:, -6:] = False
        assert m.sum() > 0.5 * m.size * 0.5
        assert np.abs(ref[m] - out[m]).max() < 0.1
        assert np.abs(out[m] - true_d).max() < 0.6
        # validity masks agree away from borders
        assert ((ref > 0) != (out > 0))[6:-6, D + 6:-6].mean() < 0.02

    def test_invalid_on_textureless(self):
        H, W, D = 16, 128, 16
        flat = jnp.zeros((H, W), jnp.float32)
        c = sd.census_transform(flat, 2)
        out = np.asarray(
            stereo_ops.disparity_wta_pallas(c, c, max_disp=D, interpret=True)
        )
        # zero-texture image: uniqueness gate must reject (second == best)
        assert (out[2:-2] > 0).mean() < 0.05
