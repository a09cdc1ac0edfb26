"""Augmented-reality overlay: dominant-plane detection + virtual objects.

TPU-native equivalent of the reference's AR demo layer (reference:
Examples_old/RGB-D/ViewerAR.h:55-96 — ViewerAR::DetectPlane RANSAC-fits a
plane to the tracked map points and draws virtual cubes anchored to it over
the live frame; static mesh overlays come from GlObjectList / ``GlObjects.*``
yaml, src/GlObjectList.cc). Design shift: plane hypotheses are scored as one
batched |pts . n - d| matrix (vmapped over hypotheses) instead of a serial
RANSAC loop, and rendering is the headless numpy rasterizer shared with the
frame drawer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import frame_drawer
from ..geometry import cameras as cam_mod


@jax.jit
def _plane_ransac(pts: jnp.ndarray, valid: jnp.ndarray, key,
                  n_hyp: int = 128, thresh: float = 0.02):
    """Batched plane RANSAC over [N, 3] points.

    Returns (normal [3], d, inlier_mask [N], n_inliers). Plane is
    n . x = d with |n| = 1. (reference: ViewerAR::DetectPlane — 50 RANSAC
    rounds of 3-point planes scored by inlier count.)
    """
    n = pts.shape[0]
    w = jnp.where(valid, 1.0, 0.0)
    idx = jax.random.randint(key, (n_hyp, 3), 0, n)
    p0, p1, p2 = pts[idx[:, 0]], pts[idx[:, 1]], pts[idx[:, 2]]
    nrm = jnp.cross(p1 - p0, p2 - p0)
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nlen, 1e-9)
    d = jnp.sum(nrm * p0, axis=-1)                       # [H]
    dist = jnp.abs(pts @ nrm.T - d[None, :])             # [N, H]
    inl = (dist < thresh) & valid[:, None]
    score = jnp.sum(inl, axis=0)
    # degenerate (collinear) hypotheses score 0
    score = jnp.where(nlen[:, 0] > 1e-6, score, 0)
    best = jnp.argmax(score)
    n_best = nrm[best]
    d_best = d[best]
    inl_best = inl[:, best]
    # least-squares refit on inliers: normal = smallest eigvec of covariance
    wi = jnp.where(inl_best, 1.0, 0.0)
    c = jnp.sum(pts * wi[:, None], 0) / jnp.maximum(wi.sum(), 1.0)
    q = (pts - c) * wi[:, None]
    cov = q.T @ q
    _, vecs = jnp.linalg.eigh(cov)
    n_ref = vecs[:, 0]
    # keep orientation consistent with the RANSAC winner
    n_ref = jnp.where(jnp.dot(n_ref, n_best) < 0, -n_ref, n_ref)
    d_ref = jnp.dot(n_ref, c)
    dist_r = jnp.abs(pts @ n_ref - d_ref)
    inl_r = (dist_r < thresh) & valid
    return n_ref, d_ref, inl_r, jnp.sum(inl_r)


@dataclasses.dataclass
class Plane:
    """A detected support plane: world pose with +z = plane normal."""

    normal: np.ndarray   # [3] unit, world frame
    d: float             # plane offset: normal . x = d
    origin: np.ndarray   # [3] anchor point on the plane (inlier centroid)
    n_inliers: int

    @property
    def Rwp(self) -> np.ndarray:
        """Plane-to-world rotation: columns = in-plane x/y axes + normal."""
        z = self.normal
        a = np.array([1.0, 0.0, 0.0], np.float32)
        if abs(z @ a) > 0.9:
            a = np.array([0.0, 1.0, 0.0], np.float32)
        x = np.cross(a, z)
        x /= np.linalg.norm(x) + 1e-12
        y = np.cross(z, x)
        return np.stack([x, y, z], axis=1).astype(np.float32)


def detect_plane(pts_world: np.ndarray, seed: int = 0,
                 thresh: float = 0.02, min_inliers: int = 30) -> Plane | None:
    """Fit the dominant plane of tracked map points (reference:
    ViewerAR::DetectPlane)."""
    if len(pts_world) < 8:
        return None
    pts = jnp.asarray(pts_world, jnp.float32)
    valid = jnp.ones((len(pts_world),), bool)
    nrm, d, inl, k = _plane_ransac(pts, valid, jax.random.PRNGKey(seed),
                                   thresh=thresh)
    k = int(k)
    if k < min_inliers:
        return None
    inl = np.asarray(inl)
    origin = np.asarray(pts_world)[inl].mean(0).astype(np.float32)
    return Plane(np.asarray(nrm, np.float32), float(d), origin, k)


def cube_vertices(plane: Plane, size: float = 0.1,
                  offset_xy=(0.0, 0.0)) -> np.ndarray:
    """[8, 3] world corners of a cube of side ``size`` resting on the plane
    (reference: ViewerAR virtual cube insertion)."""
    s = size / 2.0
    local = np.array(
        [[x, y, z] for z in (0.0, size) for y in (-s, s) for x in (-s, s)],
        np.float32,
    )
    local[:, 0] += offset_xy[0]
    local[:, 1] += offset_xy[1]
    return (plane.Rwp @ local.T).T + plane.origin


CUBE_EDGES = [
    (0, 1), (1, 3), (3, 2), (2, 0),       # bottom face
    (4, 5), (5, 7), (7, 6), (6, 4),       # top face
    (0, 4), (1, 5), (2, 6), (3, 7),       # pillars
]


def draw_object_overlay(img_rgb: np.ndarray, cam: cam_mod.Camera,
                        Rcw: np.ndarray, tcw: np.ndarray,
                        verts_world: np.ndarray, edges=None,
                        color=(0, 255, 0)) -> np.ndarray:
    """Project a wireframe object into the frame and draw its edges.

    Works for the AR cube (edges=CUBE_EDGES) and for GlObject-style static
    meshes (pass their edge list, or None to draw vertices as squares).
    """
    Xc = (Rcw @ np.asarray(verts_world, np.float32).T).T + tcw
    z = Xc[:, 2]
    uv = np.asarray(cam_mod.project(cam, jnp.asarray(Xc)))
    vis = z > 0.05
    out = img_rgb
    if edges is None:
        out = frame_drawer.draw_squares(out, uv[vis], color, r=2)
        return out
    p0, p1 = [], []
    for a, b in edges:
        if vis[a] and vis[b]:
            p0.append(uv[a])
            p1.append(uv[b])
    if p0:
        out = frame_drawer.draw_segments(out, np.asarray(p0), np.asarray(p1),
                                         color)
    return out


def load_ply_vertices(path: str, max_points: int | None = None) -> np.ndarray:
    """Minimal ascii-PLY vertex reader for static overlay objects
    (reference: GlObjectList loading ply/mesh overlays via ``GlObjects.*``
    yaml, Settings/old/RGB-D-TUM1.yaml:224-228)."""
    with open(path) as f:
        assert f.readline().strip() == "ply"
        n_vert = 0
        while True:
            line = f.readline()
            if not line:
                raise ValueError("bad ply header")
            if line.startswith("element vertex"):
                n_vert = int(line.split()[-1])
            if line.strip() == "end_header":
                break
        pts = []
        for _ in range(n_vert):
            vals = f.readline().split()
            pts.append([float(v) for v in vals[:3]])
    pts = np.asarray(pts, np.float32)
    if max_points and len(pts) > max_points:
        pts = pts[np.random.default_rng(0).choice(len(pts), max_points,
                                                  replace=False)]
    return pts


@dataclasses.dataclass
class GlObject:
    """A static world-anchored overlay object (reference: GlObject —
    ply cloud + pose from yaml)."""

    verts: np.ndarray          # [V, 3] object-frame vertices
    Rwo: np.ndarray            # object-to-world rotation
    two: np.ndarray            # object-to-world translation
    color: tuple = (255, 128, 0)

    @property
    def verts_world(self) -> np.ndarray:
        return (self.Rwo @ self.verts.T).T + self.two


def render_ar_frame(gray: np.ndarray, cam: cam_mod.Camera,
                    Rcw: np.ndarray, tcw: np.ndarray,
                    pts_world: np.ndarray | None = None,
                    plane: Plane | None = None,
                    cube_size: float = 0.1,
                    objects: list[GlObject] = ()) -> np.ndarray:
    """Full AR compositing pass (reference: ViewerAR::Run draw loop):
    camera image + detected-plane cube + static objects."""
    img = frame_drawer.to_rgb(gray)
    if plane is None and pts_world is not None and len(pts_world):
        plane = detect_plane(pts_world)
    if plane is not None:
        cube = cube_vertices(plane, size=cube_size)
        img = draw_object_overlay(img, cam, Rcw, tcw, cube, CUBE_EDGES)
    for obj in objects:
        img = draw_object_overlay(img, cam, Rcw, tcw, obj.verts_world,
                                  None, obj.color)
    return img
