"""ROS bridge layer without ROS: conversions + approximate-time sync."""

import dataclasses

import numpy as np
import pytest

from plvs_tpu.ros import conversions as cv
from plvs_tpu.ros.nodes import ApproxTimeSync, MonoSlamBridge, RgbdSlamBridge


@dataclasses.dataclass
class FakeStamp:
    sec: int
    nanosec: int


@dataclasses.dataclass
class FakeHeader:
    stamp: FakeStamp
    frame_id: str = ""


@dataclasses.dataclass
class FakeImage:
    height: int
    width: int
    encoding: str
    step: int
    data: bytes
    header: FakeHeader = None


def _mk_gray_msg(img: np.ndarray, ts: float = 0.0) -> FakeImage:
    h, w = img.shape
    return FakeImage(h, w, "mono8", w, img.astype(np.uint8).tobytes(),
                     FakeHeader(FakeStamp(int(ts), int((ts % 1) * 1e9))))


def _mk_depth_msg(depth_m: np.ndarray, ts: float = 0.0) -> FakeImage:
    h, w = depth_m.shape
    mm = (depth_m * 1000).astype(np.uint16)
    return FakeImage(h, w, "16UC1", w * 2, mm.tobytes(),
                     FakeHeader(FakeStamp(int(ts), int((ts % 1) * 1e9))))


class TestConversions:
    def test_mono8_roundtrip(self, rng):
        img = rng.integers(0, 255, (12, 16)).astype(np.uint8)
        got = cv.image_to_gray(_mk_gray_msg(img))
        np.testing.assert_allclose(got, img.astype(np.float32))

    def test_bgr8_weights(self):
        img = np.zeros((2, 2, 3), np.uint8)
        img[..., 2] = 255  # red channel in BGR
        msg = FakeImage(2, 2, "bgr8", 6, img.tobytes(),
                        FakeHeader(FakeStamp(0, 0)))
        got = cv.image_to_gray(msg)
        np.testing.assert_allclose(got, 0.299 * 255, rtol=1e-5)

    def test_depth_16u_millimetres(self):
        depth = np.array([[1.5, 0.0]], np.float32)
        got = cv.image_to_depth(_mk_depth_msg(depth))
        np.testing.assert_allclose(got, depth, atol=1e-3)

    def test_depth_32f_nan_to_invalid(self):
        d = np.array([[2.0, np.nan]], np.float32)
        msg = FakeImage(1, 2, "32FC1", 8, d.tobytes(),
                        FakeHeader(FakeStamp(0, 0)))
        got = cv.image_to_depth(msg)
        assert got[0, 0] == 2.0 and got[0, 1] == 0.0

    def test_camera_from_info(self):
        @dataclasses.dataclass
        class FakeInfo:
            k: list
            d: list
            width: int
            height: int
            distortion_model: str

        info = FakeInfo([525.0, 0, 319.5, 0, 525.0, 239.5, 0, 0, 1],
                        [0.1, -0.2, 0.0, 0.0, 0.0], 640, 480, "plumb_bob")
        cam = cv.camera_from_info(info, bf=40.0)
        assert cam.fx == 525.0 and cam.width == 640 and cam.bf == 40.0

    def test_pose_dict_inverts_world_to_cam(self):
        R = np.eye(3, dtype=np.float32)
        t = np.array([1.0, 0.0, 0.0], np.float32)
        p = cv.pose_to_msg_dict(R, t)
        assert abs(p["position"]["x"] + 1.0) < 1e-6
        assert abs(p["orientation"]["w"] - 1.0) < 1e-6

    def test_cloud_packing(self):
        pts = np.array([[1.0, 2.0, 3.0]], np.float32)
        cols = np.array([[255, 0, 128]], np.uint8)
        raw = cv.cloud_to_xyz_rgb_bytes(pts, cols)
        arr = np.frombuffer(raw, np.float32).reshape(-1, 4)
        np.testing.assert_allclose(arr[0, :3], pts[0])
        rgb = arr[:, 3].view(np.uint32)[0]
        assert (rgb >> 16) & 0xFF == 255 and rgb & 0xFF == 128


class TestApproxSync:
    def test_pairs_within_tolerance(self):
        s = ApproxTimeSync(max_dt=0.02)
        assert s.push_a(0.000, "a0") is None
        got = s.push_b(0.010, "b0")
        assert got == ("a0", "b0")

    def test_drops_unmatchable(self):
        s = ApproxTimeSync(max_dt=0.02)
        s.push_a(0.0, "a0")
        assert s.push_b(10.0, "b-late") is None  # a0 dropped, b kept
        got = s.push_a(10.005, "a1")
        assert got == ("a1", "b-late")

    def test_queue_bounded(self):
        s = ApproxTimeSync(max_dt=0.001, queue=5)
        for i in range(20):
            s.push_a(float(i), f"a{i}")
        assert len(s.a) <= 5


class TestBridges:
    def _system(self):
        from plvs_tpu.geometry import cameras
        from plvs_tpu.slam import System, SystemConfig

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                              width=320, height=240, bf=24.0)
        return System(cam, SystemConfig(num_features=512, n_levels=4,
                                        loop_closing=False))

    def test_rgbd_bridge_tracks(self):
        from plvs_tpu.io import synthetic
        from plvs_tpu.geometry import cameras

        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                              width=320, height=240, bf=24.0)
        bridge = RgbdSlamBridge(self._system())
        scene = synthetic.SyntheticRGBD(cam, wall_z=3.0, seed=0)
        out = None
        for ts, gray, depth, R, t in scene.sequence(n_frames=6):
            bridge.on_rgb(_mk_gray_msg(gray, ts))
            out = bridge.on_depth(_mk_depth_msg(depth, ts))
        assert out is not None
        state, pose = out
        assert state == 2  # OK
        assert len(bridge.poses) == 6

    def test_mono_bridge_runs(self, rng):
        bridge = MonoSlamBridge(self._system())
        img = rng.integers(0, 255, (240, 320)).astype(np.uint8)
        out = bridge.on_image(_mk_gray_msg(img, 0.0))
        assert out is not None  # state NOT_INITIALIZED but pose returned


class TestImuQueue:
    def test_drain_until_splits_on_image_stamp(self):
        from plvs_tpu.ros.ros1_nodes import ImuQueue

        q = ImuQueue()
        for i in range(10):
            q.push(0.01 * i, (0.0, 0.0, 0.1 * i), (0.0, 0.0, 9.81))
        batch = q.drain_until(0.045)
        assert len(batch) == 5  # t = 0.00..0.04
        assert all(t <= 0.045 for t, _, _ in batch)
        assert len(q.samples) == 5  # the rest stays queued
        assert q.drain_until(0.01) is None  # nothing at/below 0.01 left

    def test_batch_format_matches_grab_imu_data(self):
        import numpy as np
        from plvs_tpu.ros.ros1_nodes import ImuQueue

        q = ImuQueue()
        q.push(1.0, (1, 2, 3), (4, 5, 6))
        ((t, w, a),) = q.drain_until(2.0)
        assert t == 1.0
        np.testing.assert_allclose(w, [1, 2, 3])
        assert w.dtype == np.float32 and a.dtype == np.float32


class TestRos1Gating:
    def test_module_imports_without_rospy(self):
        import plvs_tpu.ros.ros1_nodes as r1

        assert hasattr(r1, "main_rgbd") and hasattr(r1, "main_stereo_inertial")
