"""ESDF generation from the TSDF map (voxblox-parity capability)."""

import numpy as np
import jax.numpy as jnp

from plvs_tpu.dense import esdf, tsdf
from plvs_tpu.geometry import cameras


class TestJFA:
    def test_matches_exact_edt(self, rng):
        from scipy.ndimage import distance_transform_edt

        occ = np.zeros((24, 20, 16), bool)
        pts = rng.integers(0, [24, 20, 16], size=(12, 3))
        occ[pts[:, 0], pts[:, 1], pts[:, 2]] = True
        vs = 0.05
        got = np.asarray(esdf.esdf_jfa(jnp.asarray(occ), vs))
        want = distance_transform_edt(~occ, sampling=vs)
        # JFA is near-exact; allow rare off-by-one-voxel approximations
        err = np.abs(got - want)
        assert np.median(err) < 1e-5
        assert (err < vs).mean() > 0.99

    def test_empty_grid_is_inf(self):
        occ = np.zeros((8, 8, 8), bool)
        got = np.asarray(esdf.esdf_jfa(jnp.asarray(occ), 0.1))
        assert np.all(np.isinf(got))


class TestEsdfFromTSDF:
    def _fused_wall(self):
        cam = cameras.pinhole(100.0, 100.0, 40.0, 30.0, width=80, height=60)
        vol = tsdf.TSDFVolume(cam, voxel_size=0.05, max_blocks=2048)
        depth = np.full((60, 80), 2.0, np.float32)
        color = np.zeros((60, 80, 3), np.float32)
        vol.integrate(depth, color, np.eye(3, dtype=np.float32),
                      np.zeros(3, np.float32))
        return vol

    def test_wall_distances(self):
        vol = self._fused_wall()
        origin, grid, sign = esdf.esdf_from_tsdf(vol)
        assert grid.size > 0
        # query points in front of the wall: distance ~ |z - 2.0| (up to the
        # half-width of the |tsdf|<eps surface band, ~1 voxel)
        q = np.array([[0.0, 0.0, 1.6], [0.0, 0.0, 1.8], [0.0, 0.0, 2.0]],
                     np.float32)
        d = esdf.query_esdf(origin, grid, vol.voxel_size, q)
        assert abs(d[0] - 0.4) < 0.12, d
        assert abs(d[1] - 0.2) < 0.12, d
        assert d[2] < 0.08, d

    def test_sign_channel_marks_interior(self):
        vol = self._fused_wall()
        origin, grid, sign = esdf.esdf_from_tsdf(vol)
        vs = vol.voxel_size
        # a voxel just behind the wall (z > 2) observed inside the trunc band
        idx = np.floor((np.array([[0.0, 0.0, 2.0 + 2 * vs]]) / vs)).astype(int)[0]
        lo = np.round(origin / vs).astype(int)
        v = idx - lo
        if np.all(v >= 0) and np.all(v < sign.shape):
            assert sign[v[0], v[1], v[2]] == -1

    def test_out_of_grid_query_is_inf(self):
        vol = self._fused_wall()
        origin, grid, sign = esdf.esdf_from_tsdf(vol)
        d = esdf.query_esdf(origin, grid, vol.voxel_size,
                            np.array([[50.0, 50.0, 50.0]], np.float32))
        assert np.isinf(d[0])
