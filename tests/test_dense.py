import jax
import jax.numpy as jnp
import numpy as np
import pytest

from plvs_tpu.dense import meshing, processing, stereo_depth
from plvs_tpu.dense.mapping import DenseMapper
from plvs_tpu.dense.tsdf import TSDFVolume
from plvs_tpu.geometry import cameras, lie

CAM = cameras.pinhole(150.0, 150.0, 80.0, 60.0, width=160, height=120, bf=12.0)


def plane_depth(z=2.0):
    return np.full((120, 160), z, np.float32)


class TestTSDF:
    def test_plane_fusion(self):
        vol = TSDFVolume(CAM, voxel_size=0.04, max_blocks=4096)
        color = np.zeros((120, 160, 3), np.float32)
        for k in range(3):
            vol.integrate(plane_depth(2.0), color, np.eye(3, dtype=np.float32),
                          np.zeros(3, np.float32))
        pts, _ = vol.occupied_cloud(tsdf_eps=0.25, min_weight=2.0)
        assert len(pts) > 200
        # surface voxels should cluster at z ~ 2.0
        assert abs(np.median(pts[:, 2]) - 2.0) < 0.05

    def test_weight_accumulates_and_caps(self):
        vol = TSDFVolume(CAM, voxel_size=0.04, max_blocks=4096)
        color = np.zeros((120, 160, 3), np.float32)
        vol.integrate(plane_depth(), color, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        w1 = vol.weight[: vol.n_blocks].max()
        vol.integrate(plane_depth(), color, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        w2 = vol.weight[: vol.n_blocks].max()
        assert w2 > w1

    def test_multi_view_consistency(self):
        """Integrating a plane from two viewpoints refines the same surface."""
        vol = TSDFVolume(CAM, voxel_size=0.04, max_blocks=8192)
        color = np.zeros((120, 160, 3), np.float32)
        vol.integrate(plane_depth(2.0), color, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        # second camera translated 0.2m right, same plane at z=2 world:
        # depth stays 2.0 (fronto-parallel plane, pure x translation)
        R2 = np.eye(3, dtype=np.float32)
        t2 = np.array([-0.2, 0, 0], np.float32)  # world-to-cam: cam at x=+0.2
        vol.integrate(plane_depth(2.0), color, R2, t2)
        pts, _ = vol.occupied_cloud(tsdf_eps=0.25, min_weight=1.5)
        assert abs(np.median(pts[:, 2]) - 2.0) < 0.05


class TestMeshing:
    def test_plane_mesh(self):
        vol = TSDFVolume(CAM, voxel_size=0.05, max_blocks=4096)
        color = np.zeros((120, 160, 3), np.float32)
        for _ in range(3):
            vol.integrate(plane_depth(2.0), color, np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        V, F = meshing.marching_tetrahedra(vol, min_weight=1.0)
        assert len(V) > 500
        assert abs(np.median(V[:, 2]) - 2.0) < 0.06
        # faces index valid vertices
        assert F.max() < len(V)


class TestStereo:
    def test_constant_disparity(self, rng):
        """Right image = left shifted by d -> recovered disparity = d."""
        d_gt = 12
        tex = rng.uniform(0, 255, (120, 200)).astype(np.float32)
        from scipy.ndimage import gaussian_filter
        tex = gaussian_filter(tex, 1.0)
        # stereo convention: uR = uL - d  =>  right(u) = left(u + d)
        left = tex[:, 0:160]
        right = tex[:, d_gt:160 + d_gt]
        disp = stereo_depth.disparity(jnp.asarray(left), jnp.asarray(right), max_disp=32)
        disp = np.asarray(disp)
        valid = disp > 0
        interior = valid[:, 40:150]
        assert interior.mean() > 0.5
        err = np.abs(disp[:, 40:150][interior] - d_gt)
        assert np.median(err) < 0.5, np.median(err)

    def test_sgm_constant_disparity(self, rng):
        """SGM aggregation path recovers a constant shift too."""
        d_gt = 12
        tex = rng.uniform(0, 255, (120, 200)).astype(np.float32)
        from scipy.ndimage import gaussian_filter
        tex = gaussian_filter(tex, 1.0)
        left = tex[:, 0:160]
        right = tex[:, d_gt:160 + d_gt]
        disp = stereo_depth.disparity(
            jnp.asarray(left), jnp.asarray(right), max_disp=32, method="sgm")
        disp = np.asarray(disp)
        interior = (disp > 0)[:, 40:150]
        assert interior.mean() > 0.5
        err = np.abs(disp[:, 40:150][interior] - d_gt)
        assert np.median(err) < 0.5, np.median(err)

    def test_sgm_scan_matches_numpy_recurrence(self, rng):
        """Directional scan == the textbook SGM recurrence evaluated in numpy."""
        S, B, D = 7, 3, 5
        p1, p2 = 2.0, 9.0
        c = rng.uniform(0, 10, (S, B, D)).astype(np.float32)
        out = np.asarray(stereo_depth._sgm_scan_lr(jnp.asarray(c), p1, p2))
        L = np.empty_like(c)
        L[0] = c[0]
        big = 1e9
        for x in range(1, S):
            prev = L[x - 1]
            lmin = prev.min(axis=-1, keepdims=True)
            up = np.concatenate([prev[:, 1:], np.full((B, 1), big, np.float32)], 1)
            dn = np.concatenate([np.full((B, 1), big, np.float32), prev[:, :-1]], 1)
            m = np.minimum(np.minimum(prev, np.minimum(up, dn) + p1), lmin + p2)
            L[x] = c[x] + m - lmin
        np.testing.assert_allclose(out, L, rtol=1e-5, atol=1e-5)

    def test_sgm_regularizes_noisy_costs(self, rng):
        """P2 smoothness suppresses isolated WTA errors a box filter keeps."""
        D, H, W = 16, 12, 40
        gt = 5
        vol = rng.uniform(2.0, 4.0, (D, H, W)).astype(np.float32)
        vol[gt] = 1.0              # true minimum everywhere
        # inject gross outliers: wrong disparity wins at scattered pixels
        ys = rng.integers(0, H, 30)
        xs = rng.integers(0, W, 30)
        vol[12, ys, xs] = 0.0
        agg = np.asarray(stereo_depth.sgm_aggregate(jnp.asarray(vol), 1.0, 50.0))
        wta = agg.argmin(axis=0)
        assert (wta == gt).mean() > 0.95

    def test_depth_conversion(self):
        disp = jnp.asarray([[2.0, -1.0]])
        depth = stereo_depth.disparity_to_depth(disp, bf=24.0)
        np.testing.assert_allclose(depth[0, 0], 12.0)
        assert float(depth[0, 1]) == 0.0


class TestProcessing:
    def test_normals_of_plane(self):
        depth = jnp.asarray(plane_depth(2.0))
        pts = processing.backproject_image(CAM, depth)
        nrm = np.asarray(processing.normals_from_points(pts))
        # fronto-parallel plane -> normal = -z (toward camera)
        inner = nrm[10:-10, 10:-10]
        np.testing.assert_allclose(np.abs(inner[..., 2]).mean(), 1.0, atol=1e-2)
        assert (inner[..., 2] < 0).mean() > 0.99

    def test_segmentation_two_planes(self):
        """Left half near plane, right half far plane -> 2 separate labels."""
        depth = np.full((120, 160), 2.0, np.float32)
        depth[:, 80:] = 3.0
        labels, _ = processing.segment_depth(CAM, jnp.asarray(depth))
        labels = np.asarray(labels)
        l_left = labels[60, 40]
        l_right = labels[60, 120]
        assert l_left > 0 and l_right > 0
        assert l_left != l_right
        # each half should be mostly one label
        assert (labels[:, :70] == l_left).mean() > 0.8
        assert (labels[:, 90:] == l_right).mean() > 0.8

    def test_filter_depth_preserves_plane(self):
        depth = plane_depth(2.0)
        depth[40, 40] = 0.0  # hole
        out = np.asarray(processing.filter_depth(jnp.asarray(depth)))
        assert abs(out[60, 60] - 2.0) < 1e-3
        assert out[40, 40] == 0.0  # holes stay invalid (conservative)


class TestDenseMapper:
    def test_rebuild_after_correction(self):
        """Rebuild with corrected poses moves the fused surface."""
        m = DenseMapper(CAM, voxel_size=0.05, max_blocks=4096)
        color = np.zeros((120, 160, 3), np.float32)
        m.insert_keyframe_rgbd(0, color, plane_depth(2.0),
                               np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        pts0, _ = m.cloud()
        z0 = np.median(pts0[:, 2])
        # corrected pose: camera actually 0.5m further back
        def get_pose(kf_id):
            return np.eye(3, dtype=np.float32), np.array([0, 0, 0.5], np.float32)
        m.rebuild(get_pose)
        pts1, _ = m.cloud()
        z1 = np.median(pts1[:, 2])
        assert abs(z0 - 2.0) < 0.05
        assert abs(z1 - 1.5) < 0.05


class TestSystemDense:
    def test_system_with_dense_mapping(self):
        """Full SLAM + dense fusion: fused cloud should reconstruct the wall."""
        from plvs_tpu.io import synthetic
        from plvs_tpu.slam import System, SystemConfig

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=24.0)
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=5)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, dense_mapping=True,
                           dense_voxel_size=0.05, loop_closing=False)
        system = System(cam, cfg)
        for ts, gray, depth, R, t in scene.sequence(n_frames=15):
            system.track_rgbd(gray, depth, ts)
        pts, cols = system.dense_mapper.cloud()
        assert len(pts) > 1000
        # wall at z=3: fused surface median near 3.0 (est poses near gt)
        assert abs(np.median(pts[:, 2]) - 3.0) < 0.08, np.median(pts[:, 2])
