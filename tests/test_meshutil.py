"""Geometry-tier tests: AABB tree closest-point queries vs a brute-force
oracle, and the grid SDF vs the analytic box distance (reference roles:
``PyFleX/core/aabbtree.cpp`` and ``PyFleX/core/sdf.cpp`` CreateSDF)."""

import numpy as np

from adaptigraph_tpu.sim.meshutil import (AABBTree, _point_tri_dist2, box_mesh,
                                          load_obj, make_sdf, voxelize)


def _brute_dist(points, verts, faces):
    verts = np.asarray(verts, np.float64)
    out = np.full(len(points), np.inf)
    for f in faces:
        d2 = _point_tri_dist2(np.asarray(points, np.float64),
                              verts[f[0]], verts[f[1]], verts[f[2]])
        out = np.minimum(out, d2)
    return np.sqrt(out)


def test_point_tri_dist_regions():
    # one triangle in the xy plane; check face, edge, and vertex regions
    v0, v1, v2 = (np.array([0.0, 0.0, 0.0]), np.array([2.0, 0.0, 0.0]),
                  np.array([0.0, 2.0, 0.0]))
    pts = np.array([
        [0.5, 0.5, 1.0],    # above the face -> dist 1
        [-1.0, -1.0, 0.0],  # beyond vertex v0 -> sqrt(2)
        [1.0, -2.0, 0.0],   # below edge ab -> 2
        [3.0, 0.0, 0.0],    # beyond vertex v1 -> 1
    ])
    d = np.sqrt(_point_tri_dist2(pts, v0, v1, v2))
    np.testing.assert_allclose(d, [1.0, np.sqrt(2.0), 2.0, 1.0], atol=1e-12)


def test_aabbtree_matches_bruteforce():
    rng = np.random.RandomState(0)
    verts = rng.randn(60, 3)
    faces = rng.randint(0, 60, size=(80, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    tree = AABBTree(verts, faces)
    pts = rng.randn(50, 3) * 2.0
    np.testing.assert_allclose(tree.closest_dist(pts),
                               _brute_dist(pts, verts, faces), atol=1e-9)


def test_box_sdf_matches_analytic():
    verts, faces = box_mesh(size=(1.0, 1.0, 1.0))
    sdf, origin, spacing = make_sdf(verts, faces, dims=13, margin=0.25)
    nx, ny, nz = sdf.shape
    ax = [origin[d] + spacing * np.arange(n) for d, n in enumerate((nx, ny, nz))]
    grid = np.stack(np.meshgrid(*ax, indexing="ij"), axis=-1)
    # analytic signed distance to the unit box centered at the origin
    q = np.abs(grid) - 0.5
    outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
    inside = np.minimum(np.max(q, axis=-1), 0.0)
    want = (outside + inside).astype(np.float32)
    np.testing.assert_allclose(sdf, want, atol=1e-5)


def test_sdf_sign_inside_voxelized_body(tmp_path):
    # a voxelized box's particle centers must all have negative SDF
    verts, faces = box_mesh(size=(0.8, 0.6, 0.9))
    pts = voxelize(verts, faces, spacing=0.2)
    assert len(pts) > 0
    tree = AABBTree(verts, faces)
    d = tree.closest_dist(pts)
    assert (d > 0.05).all()  # grid centers sit off the surface

    # OBJ round trip feeds the same pipeline
    obj = tmp_path / "box.obj"
    with open(obj, "w") as f:
        for v in verts:
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")
    v2, f2 = load_obj(str(obj))
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    assert len(f2) == len(faces)
