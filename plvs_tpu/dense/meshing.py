"""Isosurface extraction from the TSDF volume (marching tetrahedra).

Replaces the reference's per-backend meshers (reference: open_chisel
marching cubes Thirdparty/open_chisel/src/mesh/, voxblox MeshIntegrator,
fastfusion MeshInterleaved). Marching *tetrahedra* is used instead of
marching cubes: each cube splits into 6 tetrahedra whose 16 sign cases
reduce to two shapes (1 or 2 triangles) — no 256-entry case tables, and the
whole extraction vectorizes over every cube of every block at once.
Slightly more triangles than MC for the same grid; identical surfaces.
"""

from __future__ import annotations

import numpy as np

from .tsdf import BLOCK, TSDFVolume

# 6 tetrahedra per cube (corner indices into the cube's 8 corners).
# Cube corners indexed bit-wise: bit0=x, bit1=y, bit2=z.
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 3, 6],
        [0, 3, 2, 6],
        [0, 2, 7, 6],  # note: keep orientation consistent
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    np.int32,
)
_CORNER_OFF = np.array(
    [[(i >> 0) & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], np.int32
)  # (x, y, z)


def _interp(p0, p1, v0, v1):
    t = v0 / np.where(np.abs(v0 - v1) < 1e-12, 1e-12, v0 - v1)
    t = np.clip(t, 0.0, 1.0)[..., None]
    return p0 + t * (p1 - p0)


def _padded_fields(volume: TSDFVolume):
    """Each block's [S+1]^3 tsdf/weight with the +x/+y/+z neighbor faces
    pulled in through the block table, so cubes straddling block boundaries
    are meshed too (cross-block seams — voxblox's MeshIntegrator handles the
    same case with neighbor lookups)."""
    n = volume.n_blocks
    S = BLOCK
    pt = np.ones((n, S + 1, S + 1, S + 1), np.float32)
    pw = np.zeros((n, S + 1, S + 1, S + 1), np.float32)
    pt[:, :S, :S, :S] = volume.tsdf[:n]
    pw[:, :S, :S, :S] = volume.weight[:n]

    coords = volume.block_coords[:n]
    bmap = volume.block_map
    # neighbor offsets in (x, y, z) and the padded-slab they fill (z, y, x)
    neighbor_fills = [
        ((1, 0, 0), (slice(0, S), slice(0, S), S), (slice(0, S), slice(0, S), 0)),
        ((0, 1, 0), (slice(0, S), S, slice(0, S)), (slice(0, S), 0, slice(0, S))),
        ((0, 0, 1), (S, slice(0, S), slice(0, S)), (0, slice(0, S), slice(0, S))),
        ((1, 1, 0), (slice(0, S), S, S), (slice(0, S), 0, 0)),
        ((1, 0, 1), (S, slice(0, S), S), (0, slice(0, S), 0)),
        ((0, 1, 1), (S, S, slice(0, S)), (0, 0, slice(0, S))),
        ((1, 1, 1), (S, S, S), (0, 0, 0)),
    ]
    for off, dst, src in neighbor_fills:
        for i in range(n):
            nb = bmap.get((int(coords[i, 0] + off[0]),
                           int(coords[i, 1] + off[1]),
                           int(coords[i, 2] + off[2])))
            if nb is not None:
                pt[i][dst] = volume.tsdf[nb][src]
                pw[i][dst] = volume.weight[nb][src]
    return pt, pw


def marching_tetrahedra(volume: TSDFVolume, min_weight: float = 1.0):
    """Extract a triangle mesh. Returns (vertices [V,3], faces [F,3])."""
    n = volume.n_blocks
    if n == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    S = BLOCK
    vs = volume.voxel_size

    tsdf, weight = _padded_fields(volume)
    # cube corner values for every S^3 cube of every (padded) block
    cs = S
    corners_v = np.empty((n, cs, cs, cs, 8), np.float32)
    corners_w = np.empty((n, cs, cs, cs, 8), np.float32)
    for ci, (ox, oy, oz) in enumerate(_CORNER_OFF):
        corners_v[..., ci] = tsdf[:, oz : oz + cs, oy : oy + cs, ox : ox + cs]
        corners_w[..., ci] = weight[:, oz : oz + cs, oy : oy + cs, ox : ox + cs]

    valid_cube = (corners_w > min_weight).all(-1)
    has_surface = (corners_v.min(-1) < 0) & (corners_v.max(-1) > 0)
    b, zi, yi, xi = np.nonzero(valid_cube & has_surface)
    if len(b) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)

    # cube corner world positions [M, 8, 3]
    base = (
        volume.block_coords[:n][b] * (S * vs)
        + (np.stack([xi, yi, zi], -1) + 0.5) * vs
    )
    cpos = base[:, None, :] + _CORNER_OFF[None, :, :] * vs
    cval = corners_v[b, zi, yi, xi]  # [M, 8]

    verts_out = []
    for tet in _TETS:
        p = cpos[:, tet]              # [M, 4, 3]
        v = cval[:, tet]              # [M, 4]
        inside = v < 0
        code = (
            inside[:, 0].astype(np.int32)
            | (inside[:, 1] << 1)
            | (inside[:, 2] << 2)
            | (inside[:, 3] << 3)
        )

        # enumerate the 14 non-trivial sign cases; generate triangles
        for c in range(1, 15):
            sel = np.nonzero(code == c)[0]
            if len(sel) == 0:
                continue
            ins = [i for i in range(4) if (c >> i) & 1]
            outs = [i for i in range(4) if not (c >> i) & 1]
            ps, vv = p[sel], v[sel]
            if len(ins) == 1:
                a = ins[0]
                e = [_interp(ps[:, a], ps[:, o], vv[:, a], vv[:, o]) for o in outs]
                verts_out.append(np.stack([e[0], e[1], e[2]], 1))
            elif len(ins) == 3:
                a = outs[0]
                e = [_interp(ps[:, i], ps[:, a], vv[:, i], vv[:, a]) for i in ins]
                verts_out.append(np.stack([e[0], e[2], e[1]], 1))
            else:  # 2 in / 2 out -> quad = 2 triangles
                i0, i1 = ins
                o0, o1 = outs
                e00 = _interp(ps[:, i0], ps[:, o0], vv[:, i0], vv[:, o0])
                e01 = _interp(ps[:, i0], ps[:, o1], vv[:, i0], vv[:, o1])
                e10 = _interp(ps[:, i1], ps[:, o0], vv[:, i1], vv[:, o0])
                e11 = _interp(ps[:, i1], ps[:, o1], vv[:, i1], vv[:, o1])
                verts_out.append(np.stack([e00, e10, e11], 1))
                verts_out.append(np.stack([e00, e11, e01], 1))

    tri = np.concatenate(verts_out).astype(np.float32)  # [F, 3, 3]
    V = tri.reshape(-1, 3)
    F = np.arange(len(V), dtype=np.int32).reshape(-1, 3)
    return V, F


def save_mesh_ply(path: str, V: np.ndarray, F: np.ndarray):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(V)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(F)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for p in V:
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}\n")
        for t in F:
            f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
