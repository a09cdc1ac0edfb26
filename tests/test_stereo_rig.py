"""Non-rectified stereo rig (KB8 fisheye pair): epipolar-gated matching +
two-ray triangulation (reference: KannalaBrandt8::matchAndtriangulate,
src/CameraModels/KannalaBrandt8.cpp; Stereo.T_c1_c2 rig extrinsics,
src/Settings.cc:325,404-409)."""

import jax.numpy as jnp
import numpy as np

from plvs_tpu.geometry import cameras, lie
from plvs_tpu.io import synthetic
from plvs_tpu.slam import System, SystemConfig
from plvs_tpu.slam import frame as frame_mod

CAM_L = cameras.kannala_brandt8(
    155.0, 155.0, 160.0, 120.0, 0.02, -0.008, 0.002, -0.0005,
    width=320, height=240, bf=0.0)
CAM_R = cameras.kannala_brandt8(
    153.0, 153.0, 161.0, 119.0, 0.019, -0.0075, 0.0021, -0.0004,
    width=320, height=240, bf=0.0)
# right camera 11 cm to the right with a ~1 degree yaw
_R12 = np.asarray(lie.so3_exp(jnp.asarray([0.0, 0.017, 0.0])), np.float32)
_T12 = np.eye(4, dtype=np.float32)
_T12[:3, :3] = _R12
_T12[:3, 3] = [0.11, 0.0, 0.0]


def _render_pair(scene_l, scene_r, R, t):
    gray_l, depth_l = scene_l.render(R, t)
    R_r = _R12.T @ R
    t_r = _R12.T @ (t - _T12[:3, 3])
    gray_r, _ = scene_r.render(R_r, t_r)
    return gray_l, gray_r, depth_l


def _make_scenes(seed=5):
    scene_l = synthetic.SyntheticRGBD(CAM_L, wall_z=3.0, seed=seed)
    scene_r = synthetic.SyntheticRGBD(CAM_R, wall_z=3.0, seed=seed)
    scene_r.tex = scene_l.tex  # same world texture
    return scene_l, scene_r


class TestRigTriangulation:
    def test_depths_match_ground_truth(self):
        scene_l, scene_r = _make_scenes()
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        gray_l, gray_r, depth_gt = _render_pair(scene_l, scene_r, R0, t0)
        fr = frame_mod.build_frame_stereo_rig(
            jnp.asarray(gray_l), jnp.asarray(gray_r), CAM_L, CAM_R,
            jnp.asarray(_R12), jnp.asarray(_T12[:3, 3]), 512, 4, 1.2)
        d = np.asarray(fr.depth)
        xy = np.asarray(fr.kp.xy)
        ok = d > 0
        assert ok.sum() > 100, f"only {ok.sum()} triangulated matches"
        xi = np.clip(np.round(xy[ok, 0]).astype(int), 0, 319)
        yi = np.clip(np.round(xy[ok, 1]).astype(int), 0, 239)
        gt = depth_gt[yi, xi]
        rel = (d[ok] - gt) / gt
        # unbiased, with per-point noise bounded by the ~0.3 px residual
        # match error at a ~6 px disparity (BA refines landmarks later)
        assert abs(np.median(rel)) < 0.02, np.median(rel)
        assert np.median(np.abs(rel)) < 0.08, np.median(np.abs(rel))
        # triangulated camera-frame points are consistent with depth
        np.testing.assert_allclose(np.asarray(fr.xyz_cam)[ok, 2], d[ok],
                                   rtol=1e-5)

    def test_epipolar_gate_rejects_shuffled_right(self):
        """A right image of a DIFFERENT texture yields few valid depths."""
        scene_l, _ = _make_scenes(seed=5)
        other = synthetic.SyntheticRGBD(CAM_R, wall_z=3.0, seed=99)
        R0 = np.eye(3, dtype=np.float32)
        t0 = np.zeros(3, np.float32)
        gray_l, _ = scene_l.render(R0, t0)
        gray_r, _ = other.render(R0, t0)
        fr = frame_mod.build_frame_stereo_rig(
            jnp.asarray(gray_l), jnp.asarray(gray_r), CAM_L, CAM_R,
            jnp.asarray(_R12), jnp.asarray(_T12[:3, 3]), 512, 4, 1.2)
        good = int((np.asarray(fr.depth) > 0).sum())
        assert good < 40, good


class TestRigSlam:
    def test_fisheye_stereo_slam(self):
        scene_l, scene_r = _make_scenes(seed=7)
        cfg = SystemConfig(num_features=512, n_levels=4, max_kf=64,
                           max_pts=16384, sensor="stereo",
                           loop_closing=False, max_kf_interval=5)
        system = System(CAM_L, cfg, cam2=CAM_R, T_c1_c2=_T12)
        poses = synthetic.default_trajectory(24)
        errs = []
        from plvs_tpu.slam.tracking import OK

        states = []
        for i, (R_gt, t_gt) in enumerate(poses):
            gray_l, gray_r, _ = _render_pair(scene_l, scene_r, R_gt, t_gt)
            state, R, t = system.track_stereo(gray_l, gray_r, i / 30.0)
            states.append(state)
            if state == OK:
                C_est = -R.T @ t
                C_gt = -R_gt.T @ t_gt
                errs.append(np.linalg.norm(C_est - C_gt))
        assert all(s == OK for s in states[1:]), states
        assert np.median(errs) < 0.03, (np.median(errs), errs[-3:])


class TestRigSettings:
    def test_camera2_yaml(self, tmp_path):
        yaml = """%YAML:1.0
Camera.type: "KannalaBrandt8"
Camera1.fx: 190.9
Camera1.fy: 190.9
Camera1.cx: 254.9
Camera1.cy: 256.8
Camera1.k1: 0.0034
Camera1.k2: 0.0007
Camera1.k3: -0.0034
Camera1.k4: 0.0009
Camera2.fx: 190.1
Camera2.fy: 190.1
Camera2.cx: 254.6
Camera2.cy: 256.9
Camera2.k1: 0.0034
Camera2.k2: 0.0007
Camera2.k3: -0.0034
Camera2.k4: 0.0009
Camera.width: 512
Camera.height: 512
Stereo.T_c1_c2: !!opencv-matrix
  rows: 3
  cols: 4
  dt: f
  data: [1.0, 0.0, 0.0, 0.101, 0.0, 1.0, 0.0, -0.002, 0.0, 0.0, 1.0, 0.001]
"""
        p = tmp_path / "rig.yaml"
        p.write_text(yaml)
        from plvs_tpu.slam.settings import Settings

        st = Settings.from_yaml(str(p))
        assert st.camera2 is not None
        assert st.camera2.kind == cameras.KANNALA_BRANDT8
        assert abs(st.camera2.fx - 190.1) < 1e-5
        assert st.T_c1_c2 is not None
        np.testing.assert_allclose(st.T_c1_c2[0, 3], 0.101, atol=1e-6)
        np.testing.assert_allclose(st.T_c1_c2[3], [0, 0, 0, 1])
