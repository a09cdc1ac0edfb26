"""Static GL objects: PLY loading and the GlObjects.* settings block
(reference: include/GlObject.h:37-56, src/GlObjectList.cc:30-70)."""

import numpy as np

from plvs_tpu.viz.gl_objects import GlObject, GlObjectList, load_ply


def _write_ascii_ply(path, verts, colors=None, faces=None):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\n"
                    "property uchar blue\n")
        if faces is not None:
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for i, v in enumerate(verts):
            row = f"{v[0]} {v[1]} {v[2]}"
            if colors is not None:
                c = colors[i]
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        if faces is not None:
            for tri in faces:
                f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")


def _write_binary_ply(path, verts, colors):
    import struct

    with open(path, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(verts)}\n"
               "property float x\nproperty float y\nproperty float z\n"
               "property uchar red\nproperty uchar green\n"
               "property uchar blue\nend_header\n")
        f.write(hdr.encode())
        for v, c in zip(verts, colors):
            f.write(struct.pack("<fffBBB", v[0], v[1], v[2],
                                c[0], c[1], c[2]))


class TestPlyLoader:
    def test_ascii_roundtrip(self, tmp_path, rng):
        verts = rng.normal(size=(17, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (17, 3)).astype(np.uint8)
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
        p = str(tmp_path / "a.ply")
        _write_ascii_ply(p, verts, cols, faces)
        v, c, fc = load_ply(p)
        np.testing.assert_allclose(v, verts, rtol=1e-6)
        np.testing.assert_array_equal(c, cols)
        np.testing.assert_array_equal(fc, faces)

    def test_binary_roundtrip(self, tmp_path, rng):
        verts = rng.normal(size=(9, 3)).astype(np.float32)
        cols = rng.integers(0, 255, (9, 3)).astype(np.uint8)
        p = str(tmp_path / "b.ply")
        _write_binary_ply(p, verts, cols)
        v, c, fc = load_ply(p)
        np.testing.assert_allclose(v, verts, rtol=1e-6)
        np.testing.assert_array_equal(c, cols)
        assert fc is None

    def test_mesh_writer_reads_back(self, tmp_path):
        """Our dense-mesh PLY writer output loads through load_ply."""
        from plvs_tpu.dense.meshing import save_mesh_ply

        V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        F = np.array([[0, 1, 2]], np.int32)
        p = str(tmp_path / "m.ply")
        save_mesh_ply(p, V, F)
        v, _, fc = load_ply(p)
        np.testing.assert_allclose(v, V, atol=1e-6)
        np.testing.assert_array_equal(fc, F)


class TestGlObjects:
    def test_pose_applied(self, tmp_path):
        verts = np.array([[1.0, 0.0, 0.0]], np.float32)
        p = str(tmp_path / "o.ply")
        _write_ascii_ply(p, verts)
        # yaw=pi/2 rotates +x into +y; then translate by [0,0,3]
        obj = GlObject.create("cloudmesh", p,
                              pose=[0, 0, 3, 0, 0, np.pi / 2])
        w = obj.world_points()
        np.testing.assert_allclose(w, [[0.0, 1.0, 3.0]], atol=1e-6)

    def test_settings_block_loads(self, tmp_path, rng):
        verts = rng.normal(size=(5, 3)).astype(np.float32)
        _write_ascii_ply(str(tmp_path / "obj0.ply"), verts)
        _write_ascii_ply(str(tmp_path / "obj1.ply"), verts)
        yaml = tmp_path / "settings.yaml"
        yaml.write_text(
            "Camera.fx: 300.0\n"
            "GlObjects.on: 1\n\n"
            "GlObjects.list:\n"
            '  - { filename: "obj0.ply", type: "cloudmesh", '
            "pose: [ 0, 0, 0, 0, 0, 0] }\n"
            '#  - { filename: "missing.ply", type: "cloudmesh", '
            "pose: [ 0, 0, 0, 0, 0, 0] }\n"
            '  - { filename: "obj1.ply", type: "cloudmesh", '
            "pose: [ 1, 2, 3, 0, 0, 0] }\n")
        gl = GlObjectList()
        assert gl.load(str(yaml))
        assert len(gl) == 2
        pts, cols = gl.all_world_points()
        assert pts.shape == (10, 3)
        np.testing.assert_allclose(pts[5:], verts + [1, 2, 3], atol=1e-5)

    def test_off_block_ignored(self, tmp_path):
        yaml = tmp_path / "settings.yaml"
        yaml.write_text("GlObjects.on: 0\nGlObjects.list:\n"
                        '  - { filename: "x.ply", type: "cloudmesh" }\n')
        gl = GlObjectList()
        assert not gl.load(str(yaml))
        assert len(gl) == 0
