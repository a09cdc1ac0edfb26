import os
import tempfile

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.io import serialization, trajectory
from plvs_tpu.slam.map_store import MapStore
from plvs_tpu.slam.settings import Settings


class TestSettings:
    def test_reference_style_yaml(self, tmp_path):
        yaml = """%YAML:1.0
# reference-style settings file
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 520.9
Camera1.fy: 521.0
Camera1.cx: 325.1
Camera1.cy: 249.7
Camera1.k1: 0.2624
Camera1.k2: -0.9531
Camera.width: 640
Camera.height: 480
Camera.fps: 30
Camera.bf: 40.0
ORBextractor.nFeatures: 1000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
Line.on: 1
Line.nLineFeatures: 100
PointCloudMapping.on: 1
PointCloudMapping.resolution: 0.03
RGBD.DepthMapFactor: 5000.0
"""
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml)
        st = Settings.from_yaml(str(p))
        assert st.camera.kind == cameras.PINHOLE
        assert abs(st.camera.fx - 520.9) < 1e-6
        assert st.camera.bf == 40.0
        assert st.config.num_features == 1000
        assert st.config.use_lines
        assert st.config.max_lines == 100
        assert st.config.dense_mapping
        assert abs(st.config.dense_voxel_size - 0.03) < 1e-9
        assert st.depth_map_factor == 5000.0
        assert st.fps == 30

    def test_sparse_mapping_keys(self, tmp_path):
        """SparseMapping.* drives the atlas-reuse flow (reference:
        src/System.cc:201-205, Settings/old/RGB-D-TUM1.yaml:137-145)."""
        yaml = """%YAML:1.0
Camera.fx: 500.0
SparseMapping.filename: "m.atlas"
SparseMapping.reuseMap: 1
SparseMapping.freezeMap: 1
SparseMapping.saveMap: 1
SparseMapping.forceRelocalization: 0
"""
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml)
        st = Settings.from_yaml(str(p))
        assert st.map_filename == "m.atlas"
        assert st.reuse_map and st.freeze_map and st.save_map
        assert not st.force_relocalization
        # defaults are all off
        st2 = Settings.from_dict({"Camera.fx": 500.0})
        assert not (st2.reuse_map or st2.freeze_map or st2.save_map)
        assert st2.force_relocalization

    def test_fisheye_yaml(self, tmp_path):
        yaml = """Camera.type: "KannalaBrandt8"
Camera1.fx: 190.9
Camera1.fy: 190.9
Camera1.cx: 254.9
Camera1.cy: 256.8
Camera1.k1: 0.0034
Camera.width: 512
Camera.height: 512
"""
        p = tmp_path / "fe.yaml"
        p.write_text(yaml)
        st = Settings.from_yaml(str(p))
        assert st.camera.kind == cameras.KANNALA_BRANDT8


class TestTrajectoryIO:
    def _traj(self):
        import jax.numpy as jnp

        from plvs_tpu.geometry import lie

        traj = []
        for i in range(5):
            R = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.1 * i, 0.0], jnp.float32)))
            t = np.asarray([0.1 * i, 0.0, 0.0], np.float32)
            traj.append((float(i) / 30, R, t))
        return traj

    def test_tum_roundtrip(self, tmp_path):
        traj = self._traj()
        p = str(tmp_path / "t.txt")
        trajectory.write_tum(p, traj)
        arr = trajectory.read_tum(p)
        assert arr.shape == (5, 8)
        # camera center of frame 1: -R^T t
        Rwc = traj[1][1].T
        twc = -Rwc @ traj[1][2]
        np.testing.assert_allclose(arr[1, 1:4], twc, atol=1e-5)

    def test_kitti_format(self, tmp_path):
        traj = self._traj()
        p = str(tmp_path / "k.txt")
        trajectory.write_kitti(p, traj)
        rows = [l.split() for l in open(p)]
        assert len(rows) == 5 and len(rows[0]) == 12

    def test_euroc_format(self, tmp_path):
        traj = self._traj()
        p = str(tmp_path / "e.csv")
        trajectory.write_euroc(p, traj)
        lines = open(p).read().strip().split("\n")
        assert lines[0].startswith("#")
        assert len(lines) == 6


class TestSerialization:
    def _store(self):
        st = MapStore(max_kf=8, max_pts=64, max_obs=256, n_kp=16,
                      max_lines=16, max_lobs=64, n_kl=8)
        kf = st.alloc_kf()
        st.kf_mask[kf] = True
        st.kf_R[kf] = np.eye(3)
        pts = st.alloc_pts(5)
        st.pt_xyz[pts] = np.arange(15).reshape(5, 3)
        st.pt_mask[pts] = True
        st.add_observations(kf, pts, np.arange(5))
        return st

    def test_atlas_roundtrip(self, tmp_path):
        st = self._store()
        p = str(tmp_path / "atlas.npz")
        serialization.save_atlas(p, st)
        st2, voc = serialization.load_atlas(p)
        assert st2.num_keyframes == 1
        assert st2.num_points == 5
        np.testing.assert_array_equal(st2.pt_xyz[:8], st.pt_xyz[:8])
        okf, opt, okp = st2.live_obs()
        assert len(okf) == 5

    def test_vocab_checksum_guard(self, tmp_path):
        from plvs_tpu.vocab import bow

        rng = np.random.default_rng(0)
        desc = rng.integers(0, 2 ** 32, (2000, 8), dtype=np.uint32)
        voc1 = bow.train(desc, k=4, depth=2, seed=0)
        voc2 = bow.train(desc, k=4, depth=2, seed=1)
        st = self._store()
        p = str(tmp_path / "atlas.npz")
        serialization.save_atlas(p, st, voc=voc1)
        st2, loaded_voc = serialization.load_atlas(p, expected_vocab=voc1)
        assert loaded_voc is not None
        with pytest.raises(ValueError, match="checksum"):
            serialization.load_atlas(p, expected_vocab=voc2)

    def test_dense_roundtrip(self, tmp_path):
        from plvs_tpu.dense.tsdf import TSDFVolume

        cam = cameras.pinhole(150.0, 150.0, 80.0, 60.0, width=160, height=120)
        vol = TSDFVolume(cam, voxel_size=0.05, max_blocks=512)
        vol.integrate(np.full((120, 160), 2.0, np.float32),
                      np.zeros((120, 160, 3), np.float32),
                      np.eye(3, dtype=np.float32), np.zeros(3, np.float32))
        p = str(tmp_path / "dense.npz")
        serialization.save_dense(p, vol)
        vol2 = serialization.load_dense(p, cam)
        assert vol2.n_blocks == vol.n_blocks
        np.testing.assert_array_equal(vol2.tsdf[: vol.n_blocks],
                                      vol.tsdf[: vol.n_blocks])
        pts1, _ = vol.occupied_cloud()
        pts2, _ = vol2.occupied_cloud()
        assert len(pts1) == len(pts2)


class TestDatasets:
    def test_tum_loader(self, tmp_path):
        # synthesize a tiny TUM-format directory
        from PIL import Image

        root = tmp_path / "seq"
        (root / "rgb").mkdir(parents=True)
        (root / "depth").mkdir()
        rgb_lines, d_lines = [], []
        for i in range(3):
            t = 100.0 + i * 0.033
            img = (np.random.default_rng(i).uniform(0, 255, (24, 32))
                   .astype(np.uint8))
            Image.fromarray(img).save(root / "rgb" / f"{t:.6f}.png")
            dep = (np.full((24, 32), 5000 * 2, np.uint16))
            Image.fromarray(dep).save(root / "depth" / f"{t:.6f}.png")
            rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
            d_lines.append(f"{t + 0.003:.6f} depth/{t:.6f}.png")
        (root / "rgb.txt").write_text("# header\n" + "\n".join(rgb_lines))
        (root / "depth.txt").write_text("# header\n" + "\n".join(d_lines))

        from plvs_tpu.io.datasets import TumRGBD

        ds = TumRGBD(str(root))
        frames = list(ds.frames())
        assert len(frames) == 3
        ts, gray, depth = frames[0]
        assert gray.shape == (24, 32)
        np.testing.assert_allclose(depth, 2.0)

    def test_associate(self):
        from plvs_tpu.io.datasets import associate

        a = np.array([0.0, 0.1, 0.2])
        b = np.array([0.001, 0.102, 0.5])
        pairs = associate(a, b)
        assert pairs == [(0, 0), (1, 1)]


class TestProfiling:
    def test_stopwatch(self):
        from plvs_tpu.utils.profiling import Stopwatch

        sw = Stopwatch()
        import time as _t

        for _ in range(3):
            with sw.scope("stage_a"):
                _t.sleep(0.002)
        st = sw.stats()
        assert st["stage_a"]["count"] == 3
        assert st["stage_a"]["mean_ms"] >= 1.5
        assert "stage_a" in sw.report()


class TestCLI:
    def test_synthetic_run(self, tmp_path, capsys):
        from plvs_tpu import run_slam

        out = str(tmp_path / "traj.txt")
        mp = str(tmp_path / "map.npz")
        run_slam.main(["--synthetic", "--frames", "8", "--out", out,
                       "--save-map", mp, "--cpu"])
        cap = capsys.readouterr().out
        assert "ate_rmse" in cap
        assert os.path.exists(out)
        assert os.path.exists(mp)
        st, _ = serialization.load_atlas(mp)
        assert st.num_keyframes >= 1


class TestDepthModel:
    def test_sigma_grows_with_range(self):
        import jax.numpy as jnp
        from plvs_tpu.utils import depth_model
        z = jnp.asarray([0.5, 2.0, 5.0])
        s = depth_model.sigma_z(z)
        assert float(s[0]) < float(s[1]) < float(s[2])

    def test_weight_bounded_and_monotone(self):
        import jax.numpy as jnp
        from plvs_tpu.utils import depth_model
        z = jnp.asarray([0.5, 1.0, 3.0, 6.0])
        w = depth_model.sigma_z_min_over_sigma_z(z)
        wn = [float(x) for x in w]
        assert all(0 < x <= 1.0 for x in wn)
        assert wn == sorted(wn, reverse=True)

    def test_inv_sigma2_scaled_by_factor(self):
        import jax.numpy as jnp
        from plvs_tpu.utils import depth_model
        w1 = float(depth_model.depth_inv_sigma2(jnp.asarray(2.0), 1.0))
        w6 = float(depth_model.depth_inv_sigma2(jnp.asarray(2.0), 6.0))
        assert abs(w1 / w6 - 36.0) < 1e-3


class TestSettingsParityKeys:
    def test_new_keys_parsed(self, tmp_path):
        from plvs_tpu.slam import settings
        y = tmp_path / "s.yaml"
        y.write_text("""%YAML:1.0
Camera.fx: 250.0
Camera.fy: 250.0
Camera.cx: 160.0
Camera.cy: 120.0
Camera.width: 320
Camera.height: 240
Camera.imageScale: 0.5
KeyFrame.fovCentersBasedGeneration.on: 1
KeyFrame.maxFovCentersDistance: 0.3
Depth.sigmaZfactor: 9.0
""")
        s = settings.Settings.from_yaml(str(y))
        assert s.config.image_scale == 0.5
        assert s.config.fov_centers_kf is True
        assert s.config.max_fov_centers_distance == 0.3
        assert s.sigma_z_factor == 9.0

    def test_imu_extrinsic_parsed_and_wired(self):
        from plvs_tpu.slam import settings

        preset = os.path.join(os.path.dirname(__file__), "..", "Settings",
                              "RGBD-Inertial-D435i.yaml")
        s = settings.Settings.from_yaml(preset)
        assert s.imu is not None
        assert s.imu_insert_kfs_when_lost is False
        T = s.imu_T_b_c
        assert T is not None and T.shape == (4, 4)
        # rotation block is orthonormal
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3),
                                   atol=1e-4)

        from plvs_tpu.slam import System, SystemConfig

        sys_ = System(s.camera, SystemConfig(use_imu=True, max_kf=8,
                                             max_pts=1024),
                      imu_calib=s.imu, imu_T_b_c=T)
        rt = sys_.inertial
        # R_cb maps body->camera: R_cb = R_bc^T, t_cb = -R_bc^T t_bc
        np.testing.assert_allclose(rt.R_cb, T[:3, :3].T, atol=1e-6)
        np.testing.assert_allclose(rt.t_cb, -T[:3, :3].T @ T[:3, 3],
                                   atol=1e-6)
        assert rt.calib.gyro_noise == pytest.approx(1e-2)

    def test_camera_scaling_helper(self):
        from plvs_tpu.geometry import cameras
        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                              width=320, height=240, bf=24.0)
        half = cameras.scale_camera(cam, 0.5)
        assert half.width == 160 and half.height == 120
        assert half.fx == 150.0 and half.bf == 12.0


class TestEvaluation:
    def _circle_traj(self, n=50, noise=0.0, seed=0):
        rng = np.random.default_rng(seed)
        ts = np.arange(n) * 0.05
        th = ts * 0.3
        xyz = np.stack([np.cos(th), np.sin(th), 0.1 * th], -1)
        xyz = xyz + noise * rng.standard_normal(xyz.shape)
        return ts, xyz

    def test_associate_by_timestamp(self):
        from plvs_tpu.io.evaluation import associate

        est = np.array([0.0, 0.1, 0.2, 0.3])
        gt = np.array([0.001, 0.102, 0.9])
        ei, gi = associate(est, gt, max_difference=0.02)
        np.testing.assert_array_equal(ei, [0, 1])
        np.testing.assert_array_equal(gi, [0, 1])

    def test_ate_timed_invariant_to_rigid_motion(self):
        from plvs_tpu.io.evaluation import ate_rmse_timed

        ts, xyz = self._circle_traj()
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th), 0],
                      [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
        moved = xyz @ R.T + np.array([1.0, -2.0, 0.5])
        est = np.column_stack([ts + 0.002, moved])
        gt = np.column_stack([ts, xyz])
        assert ate_rmse_timed(est, gt) < 1e-9

    def test_ate_timed_scale_alignment(self):
        from plvs_tpu.io.evaluation import ate_rmse_timed

        ts, xyz = self._circle_traj()
        est = np.column_stack([ts, 3.0 * xyz])
        gt = np.column_stack([ts, xyz])
        # rigid-only alignment cannot remove the scale error
        assert ate_rmse_timed(est, gt, with_scale=False) > 0.1
        assert ate_rmse_timed(est, gt, with_scale=True) < 1e-9

    def test_rpe_zero_on_identical_and_positive_on_drift(self):
        from plvs_tpu.io.evaluation import rpe

        ts, xyz = self._circle_traj()
        q = np.tile([0.0, 0.0, 0.0, 1.0], (len(ts), 1))  # identity (x,y,z,w)
        gt = np.column_stack([ts, xyz, q])
        t0, r0 = rpe(gt, gt)
        assert t0 < 1e-12 and r0 < 1e-6
        drift = xyz + np.linspace(0, 0.5, len(ts))[:, None]
        est = np.column_stack([ts, drift, q])
        t1, _ = rpe(est, gt)
        assert t1 > 1e-3


class TestBenchmarkHarness:
    def test_gate_and_aggregation(self):
        from plvs_tpu.io import benchmark as bm
        seq = [bm.RunResult(0.02, 0.0, [10.0, 12.0]),
               bm.RunResult(0.03, 0.01, [11.0]),
               bm.RunResult(9.99, 0.50, [40.0]),  # gated out
               bm.RunResult(0.025, 0.0, [9.0])]
        it = iter(seq)
        rep = bm.run_sequence_benchmark(lambda i: next(it), n_runs=4)
        assert not rep["failed"]
        assert rep["discarded"] == 1
        assert abs(rep["median_rmse"] - 0.025) < 1e-9
        # track time excludes the gated run's 40ms sample
        assert rep["track_ms_mean"] < 13.0

    def test_sequence_fails_with_too_many_lost_runs(self):
        from plvs_tpu.io import benchmark as bm
        seq = [bm.RunResult(0.02, 0.5, [10.0])] * 3 + \
              [bm.RunResult(0.02, 0.0, [10.0])]
        it = iter(seq)
        rep = bm.run_sequence_benchmark(lambda i: next(it), n_runs=4)
        assert rep["failed"]

    def test_resource_sampler(self):
        from plvs_tpu.io import benchmark as bm
        import time as _t
        with bm.ResourceSampler(interval=0.05) as rs:
            x = 0
            t0 = _t.perf_counter()
            while _t.perf_counter() - t0 < 0.3:
                x += sum(range(1000))
        s = rs.stats()
        assert s["ram_mb_mean"] > 10.0  # this process surely uses >10 MB

    def test_synthetic_run_once(self):
        """End-to-end: one benchmark run over the synthetic scene."""
        import numpy as np
        from plvs_tpu.geometry import cameras
        from plvs_tpu.io import benchmark as bm, synthetic
        from plvs_tpu.slam import System, SystemConfig

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0, width=320,
                              height=240, bf=24.0)
        cfg = SystemConfig(num_features=512, n_levels=4, loop_closing=False)
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=0)
        frames = list(scene.sequence(n_frames=10))
        gt = np.stack([-R.T @ t for _, _, _, R, t in frames])
        r = bm.run_system_once(
            lambda: System(cam, cfg),
            lambda: [(ts, g, d) for ts, g, d, _, _ in frames],
            gt_xyz=gt, sample_resources=False)
        assert r.lost_frac < 0.05
        assert r.ate_rmse < 0.05
        assert len(r.track_ms) == 10


class TestShippedPresets:
    """All Settings/ preset YAMLs must parse into valid Settings
    (reference: 44 ready configs under Settings/)."""

    def test_all_presets_parse(self):
        import glob, os
        root = os.path.join(os.path.dirname(__file__), "..", "Settings")
        paths = sorted(glob.glob(os.path.join(root, "*.yaml")))
        assert len(paths) >= 10
        for p in paths:
            st = Settings.from_yaml(p)
            assert st.camera.width > 0 and st.fps > 0
            if "TUM-VI" in p:
                assert st.camera.kind == 1  # KB8 fisheye
                assert st.imu is not None
            if "Inertial" in p:
                assert st.imu is not None and st.imu.gyro_noise > 0
            if "KITTI" in p:
                assert st.camera.bf > 100  # stereo baseline*f in pixels*m
