"""AR layer: plane RANSAC, cube anchoring, overlay rendering."""

import numpy as np
import pytest

from plvs_tpu.geometry import cameras
from plvs_tpu.viz import ar


def _plane_cloud(rng, n=200, noise=0.003):
    # z = 0.5 plane patch + 20% outliers
    pts = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
        0.5 + rng.normal(0, noise, n)], -1).astype(np.float32)
    out = rng.uniform(-1, 1, (n // 5, 3)).astype(np.float32)
    return np.concatenate([pts, out])


class TestPlaneDetection:
    def test_recovers_plane(self, rng):
        pts = _plane_cloud(rng)
        plane = ar.detect_plane(pts, thresh=0.02)
        assert plane is not None
        n = plane.normal / np.linalg.norm(plane.normal)
        assert abs(abs(n[2]) - 1.0) < 0.02, n
        assert abs(abs(plane.d) - 0.5) < 0.02
        assert plane.n_inliers > 150

    def test_too_few_points(self):
        assert ar.detect_plane(np.zeros((3, 3), np.float32)) is None

    def test_rwp_orthonormal(self, rng):
        pts = _plane_cloud(rng)
        plane = ar.detect_plane(pts)
        R = plane.Rwp
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-5)
        np.testing.assert_allclose(R[:, 2], plane.normal, atol=1e-5)


class TestCube:
    def test_cube_rests_on_plane(self, rng):
        pts = _plane_cloud(rng)
        plane = ar.detect_plane(pts)
        cube = ar.cube_vertices(plane, size=0.2)
        assert cube.shape == (8, 3)
        # bottom 4 corners lie on the plane
        d = cube[:4] @ plane.normal - plane.d
        assert np.abs(d).max() < 0.03
        # top corners are one side-length above
        d_top = cube[4:] @ plane.normal - plane.d
        assert np.allclose(np.abs(d_top - d), 0.2, atol=0.03)


class TestOverlay:
    def test_render_ar_frame(self, rng):
        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                              width=320, height=240)
        gray = rng.uniform(0, 255, (240, 120 * 2 + 80)).astype(np.float32)
        gray = gray[:, :320]
        # plane at z=2 in front of camera
        pts = np.stack([
            rng.uniform(-1, 1, 300), rng.uniform(-1, 1, 300),
            np.full(300, 2.0)], -1).astype(np.float32)
        img = ar.render_ar_frame(gray, cam, np.eye(3, dtype=np.float32),
                                 np.zeros(3, np.float32), pts_world=pts,
                                 cube_size=0.3)
        assert img.shape == (240, 320, 3)
        # green cube pixels were drawn
        greens = (img[..., 1] == 255) & (img[..., 0] == 0)
        assert greens.sum() > 20

    def test_object_behind_camera_skipped(self):
        cam = cameras.pinhole(300.0, 300.0, 160.0, 120.0,
                              width=320, height=240)
        gray = np.zeros((240, 320), np.float32)
        verts = np.array([[0, 0, -1.0], [0.1, 0, -1.0]], np.float32)
        img = ar.draw_object_overlay(ar.frame_drawer.to_rgb(gray), cam,
                                     np.eye(3, dtype=np.float32),
                                     np.zeros(3, np.float32), verts,
                                     edges=[(0, 1)])
        assert (img > 0).sum() == 0  # nothing drawn

    def test_ply_roundtrip(self, tmp_path, rng):
        pts = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        p = tmp_path / "obj.ply"
        with open(p, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(pts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write("end_header\n")
            for q in pts:
                f.write(f"{q[0]} {q[1]} {q[2]}\n")
        got = ar.load_ply_vertices(str(p))
        np.testing.assert_allclose(got, pts, atol=1e-5)
        obj = ar.GlObject(got, np.eye(3, dtype=np.float32),
                          np.array([0, 0, 2], np.float32))
        assert obj.verts_world[:, 2].min() >= 1.0
