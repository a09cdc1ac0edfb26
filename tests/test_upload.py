"""Packed frame-input upload: quantization + device-side bitcast unpack
must reproduce the reference float conversion (byte order of
lax.bitcast_convert_type vs numpy .view is the hazard being locked in)."""

import numpy as np

from plvs_tpu.slam.system import _upload_rgbd


class TestPackedUpload:
    def test_roundtrip_matches_reference(self):
        rng = np.random.default_rng(0)
        gray = rng.uniform(0, 255, (480, 640)).astype(np.float32)
        depth = rng.uniform(0.0, 8.0, (480, 640)).astype(np.float32)
        g_d, d_d = _upload_rgbd(gray, depth)
        g_ref = np.clip(gray, 0, 255).astype(np.uint8).astype(np.float32)
        d_ref = (np.clip(depth, 0, 65.0) * 1000).astype(np.uint16) \
            .astype(np.float32) * 0.001
        np.testing.assert_array_equal(np.asarray(g_d), g_ref)
        np.testing.assert_allclose(np.asarray(d_d), d_ref, atol=1e-6)

    def test_uint8_input_passthrough(self):
        gray = np.arange(480 * 640, dtype=np.uint32).reshape(480, 640) \
            .astype(np.uint8)
        depth = np.full((480, 640), 2.5, np.float32)
        g_d, d_d = _upload_rgbd(gray, depth)
        np.testing.assert_array_equal(np.asarray(g_d),
                                      gray.astype(np.float32))
