"""Mesh geometry utilities: OBJ parsing and solid voxelization.

Plays the role of the reference's compiled ``PyFleX/core`` geometry tier
(reference: ``PyFleX/core/*.{cpp,h}`` — mesh loading, voxelize, SDF — built
into the pyflex module, ``CMakeLists.txt:21-32``), which FleX scenes use to
fill meshes with particles (e.g. ``by_softbody.h`` CreateSoftBody). Here:
a dependency-free OBJ reader and a ray-parity solid voxelizer producing
particle centers, which seed ``XPBDScene.from_points`` soft bodies.
"""

import numpy as np


def load_obj(path):
    """Minimal OBJ: returns (verts (V, 3) float32, faces (F, 3) int32).
    Polygons are fan-triangulated."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def _ray_tri_intersections(origins, direction, verts, faces, eps=1e-9):
    """Count ray/triangle crossings per origin (Moller-Trumbore, vectorized
    over origins x triangles). direction: (3,). Returns (N,) int counts."""
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    d = np.asarray(direction, np.float64)
    pvec = np.cross(d, e2)  # (F, 3)
    det = np.einsum("fj,fj->f", e1, pvec)
    ok = np.abs(det) > eps
    inv_det = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)

    counts = np.zeros(len(origins), np.int64)
    for i, o in enumerate(origins):
        tvec = o - v0
        u = np.einsum("fj,fj->f", tvec, pvec) * inv_det
        qvec = np.cross(tvec, e1)
        v = np.einsum("j,fj->f", d, qvec) * inv_det
        t = np.einsum("fj,fj->f", e2, qvec) * inv_det
        hit = ok & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > eps)
        counts[i] = int(np.count_nonzero(hit))
    return counts


def voxelize(verts, faces, spacing, jitter=0.0, rng=None):
    """Solid voxelization: particle centers on a ``spacing`` grid whose
    centers are inside the closed mesh (odd ray-crossing parity along +x,
    the reference core/voxelize semantics). Returns (N, 3) float32."""
    verts = np.asarray(verts, np.float64)
    lo = verts.min(axis=0)
    hi = verts.max(axis=0)
    axes = [np.arange(lo[d] + spacing / 2, hi[d], spacing) for d in range(3)]
    if any(len(a) == 0 for a in axes):
        return np.zeros((0, 3), np.float32)
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), axis=-1).reshape(-1, 3)
    counts = _ray_tri_intersections(grid, np.array([1.0, 0.0, 0.0]), verts,
                                    np.asarray(faces, np.int64))
    inside = grid[counts % 2 == 1].astype(np.float32)
    if jitter > 0 and len(inside):
        rng = rng or np.random
        inside = inside + rng.uniform(-jitter, jitter, inside.shape).astype(np.float32)
    return inside


def box_mesh(size=(1.0, 1.0, 1.0), center=(0.0, 0.0, 0.0)):
    """Axis-aligned box mesh for tests/procedural bodies."""
    sx, sy, sz = np.asarray(size, np.float64) / 2
    c = np.asarray(center, np.float64)
    verts = np.array([[x, y, z] for x in (-sx, sx) for y in (-sy, sy)
                      for z in (-sz, sz)]) + c
    faces = np.array([
        [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],  # x faces
        [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],  # y faces
        [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],  # z faces
    ])
    return verts.astype(np.float32), faces.astype(np.int32)
