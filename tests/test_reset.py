"""System.reset must rebuild an IDENTICAL system: stereo-rig extrinsics and
IMU calibration survive (reference: System::Reset clears maps but never
changes the sensor configuration, include/System.h:166)."""

import numpy as np

from plvs_tpu.geometry import cameras
from plvs_tpu.slam import System, SystemConfig


CAM = cameras.pinhole(155.0, 155.0, 160.0, 120.0, width=320, height=240,
                      bf=17.0)
CAM_R = cameras.pinhole(153.0, 153.0, 161.0, 119.0, width=320, height=240,
                        bf=0.0)


def _rig_T():
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [0.11, 0.0, 0.0]
    return T


class TestResetPreservesConfig:
    def test_reset_keeps_stereo_rig(self):
        T = _rig_T()
        sys_ = System(CAM, SystemConfig(sensor="stereo", num_features=256,
                                        n_levels=4),
                      cam2=CAM_R, T_c1_c2=T)
        assert sys_.cam2 is not None
        sys_.reset()
        assert sys_.cam2 is not None, "reset dropped the rig camera"
        assert sys_.R_lr is not None and sys_.t_lr is not None
        np.testing.assert_allclose(sys_.t_lr, T[:3, 3])
        assert sys_.config.sensor == "stereo"

    def test_reset_keeps_imu(self):
        T_bc = np.eye(4, dtype=np.float32)
        T_bc[:3, 3] = [0.0, 0.02, 0.0]
        sys_ = System(CAM, SystemConfig(sensor="rgbd", use_imu=True,
                                        num_features=256, n_levels=4),
                      imu_T_b_c=T_bc)
        assert sys_.inertial is not None
        sys_.reset()
        assert sys_.inertial is not None, "reset dropped the inertial runtime"
        np.testing.assert_allclose(sys_.inertial.t_cb, [0.0, -0.02, 0.0],
                                   atol=1e-6)
        assert sys_.config.use_imu

    def test_reset_keeps_trajectory_log(self):
        sys_ = System(CAM, SystemConfig(num_features=256, n_levels=4))
        sys_.trajectory.append((0.0, np.eye(3, dtype=np.float32),
                                np.zeros(3, np.float32)))
        sys_.reset()
        assert len(sys_.trajectory) == 1
