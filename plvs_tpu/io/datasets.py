"""Dataset loaders: TUM RGB-D, EuRoC stereo(-inertial), KITTI stereo.

TPU-native equivalent of the reference's example-main loaders
(reference: Examples/RGB-D/rgbd_tum.cc LoadImages + association files,
Examples/Stereo/stereo_kitti.cc, Examples/Stereo-Inertial/
stereo_inertial_euroc.cc timestamp/IMU parsing; Scripts/associate.py).
Images are loaded with imageio/PIL if available, else raw pgm/png via
numpy where possible.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


def _imread_gray(path: str) -> np.ndarray:
    if path.endswith(".png"):
        from .. import native
        if native.available():
            return native.read_png_gray(path)
    try:
        from PIL import Image

        return np.asarray(Image.open(path).convert("L"), np.float32)
    except ImportError:
        pass
    import imageio.v2 as imageio  # type: ignore

    img = imageio.imread(path)
    if img.ndim == 3:
        img = img.mean(-1)
    return img.astype(np.float32)


def _imread_depth(path: str, factor: float) -> np.ndarray:
    if path.endswith(".png"):
        from .. import native
        if native.available():
            return native.read_png_gray(path) / factor
    try:
        from PIL import Image

        d = np.asarray(Image.open(path), np.float32)
    except ImportError:
        import imageio.v2 as imageio  # type: ignore

        d = np.asarray(imageio.imread(path), np.float32)
    return d / factor


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_dt: float = 0.02):
    """Greedy nearest-timestamp association (reference: Scripts/associate.py
    protocol)."""
    pairs = []
    used_b: set[int] = set()
    for i, ta in enumerate(ts_a):
        j = int(np.argmin(np.abs(ts_b - ta)))
        if j in used_b:
            continue
        if abs(ts_b[j] - ta) <= max_dt:
            pairs.append((i, j))
            used_b.add(j)
    return pairs


@dataclasses.dataclass
class TumRGBD:
    """TUM RGB-D sequence directory (rgb.txt / depth.txt lists).

    (reference: Examples/RGB-D/rgbd_tum.cc + Benchmarking dataset lists)
    """

    root: str
    depth_factor: float = 5000.0

    def _read_list(self, name):
        ts, files = [], []
        with open(os.path.join(self.root, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                t, p = line.split()[:2]
                ts.append(float(t))
                files.append(p)
        return np.asarray(ts), files

    def frames(self):
        ts_rgb, rgb = self._read_list("rgb.txt")
        ts_d, dep = self._read_list("depth.txt")
        for i, j in associate(ts_rgb, ts_d):
            gray = _imread_gray(os.path.join(self.root, rgb[i]))
            depth = _imread_depth(os.path.join(self.root, dep[j]),
                                  self.depth_factor)
            yield ts_rgb[i], gray, depth

    def groundtruth(self):
        """[N, 8] (t, tx..qz, qw) from groundtruth.txt if present."""
        p = os.path.join(self.root, "groundtruth.txt")
        if not os.path.exists(p):
            return None
        rows = []
        with open(p) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                rows.append([float(x) for x in line.split()])
        return np.asarray(rows)


@dataclasses.dataclass
class EurocStereo:
    """EuRoC MAV directory (mav0/cam0..., mav0/imu0/data.csv).

    (reference: Examples/Stereo-Inertial/stereo_inertial_euroc.cc loaders)
    """

    root: str

    def _cam_list(self, cam: str):
        d = os.path.join(self.root, "mav0", cam, "data")
        csv = os.path.join(self.root, "mav0", cam, "data.csv")
        ts, files = [], []
        with open(csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                t, name = line.strip().split(",")[:2]
                ts.append(int(t) * 1e-9)
                files.append(os.path.join(d, name))
        return np.asarray(ts), files

    def frames(self):
        ts0, f0 = self._cam_list("cam0")
        ts1, f1 = self._cam_list("cam1")
        for i, j in associate(ts0, ts1, max_dt=0.005):
            yield ts0[i], _imread_gray(f0[i]), _imread_gray(f1[j])

    def imu(self):
        """[N, 7]: t, wx, wy, wz, ax, ay, az."""
        csv = os.path.join(self.root, "mav0", "imu0", "data.csv")
        rows = []
        with open(csv) as f:
            for line in f:
                if line.startswith("#"):
                    continue
                v = line.strip().split(",")
                rows.append([int(v[0]) * 1e-9] + [float(x) for x in v[1:7]])
        return np.asarray(rows)


@dataclasses.dataclass
class KittiStereo:
    """KITTI odometry sequence dir (image_0/, image_1/, times.txt).

    (reference: Examples/Stereo/stereo_kitti.cc LoadImages)
    """

    root: str

    def frames(self):
        with open(os.path.join(self.root, "times.txt")) as f:
            times = [float(x) for x in f.read().split()]
        for i, t in enumerate(times):
            l = os.path.join(self.root, "image_0", f"{i:06d}.png")
            r = os.path.join(self.root, "image_1", f"{i:06d}.png")
            yield t, _imread_gray(l), _imread_gray(r)
