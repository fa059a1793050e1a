"""Native C++ extension tests against analytic oracles and NumPy fallbacks."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from list_tpu import native
from list_tpu.utils.meshio import Mesh, make_box, make_icosphere


def test_native_built():
    assert native.have_native(), 'C++ extension failed to build'


def test_inside_mesh_box(rng):
    box = make_box(extents=(1, 1, 1))
    pts = rng.uniform(-0.8, 0.8, (2000, 3))
    contains, holes = native.inside_mesh(box.triangles, pts)
    expected = np.all(np.abs(pts) < 0.5, axis=1)
    # surface-adjacent points can go either way; none of ours are on the surface
    np.testing.assert_array_equal(contains, expected)
    assert not holes.any()


def test_inside_mesh_sphere_volume(rng):
    sph = make_icosphere(3, radius=0.4)
    pts = rng.uniform(-0.5, 0.5, (20000, 3))
    contains, _ = native.inside_mesh(sph.triangles, pts)
    vol = contains.mean()  # fraction of the unit cube
    expected = 4.0 / 3.0 * np.pi * 0.4 ** 3
    assert abs(vol - expected) < 0.01


def test_inside_mesh_numpy_fallback_parity(rng):
    box = make_box(extents=(0.8, 0.6, 1.0))
    pts = rng.uniform(-0.7, 0.7, (300, 3))
    c1, h1 = native.inside_mesh(box.triangles, pts)
    c2, h2 = native._inside_mesh_numpy(
        np.ascontiguousarray(box.triangles), np.ascontiguousarray(pts), 512)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(h1, h2)


def test_triangle_hash_class(rng):
    tri2d = rng.uniform(0, 512, (50, 3, 2))
    th = native.TriangleHash(tri2d, 512)
    pts = rng.uniform(0, 512, (100, 2))
    pi, ti = th.query(pts)
    assert len(pi) == len(ti)
    # every reported pair's point falls in a hash cell covered by the tri bbox
    for p, t in zip(pi[:50], ti[:50]):
        lo = np.clip(tri2d[t].min(0).astype(int), 0, 511)
        hi = np.clip(tri2d[t].max(0).astype(int), 0, 511)
        x, y = int(pts[p, 0]), int(pts[p, 1])
        assert lo[0] <= x <= hi[0] and lo[1] <= y <= hi[1]


def test_marching_cubes_sphere():
    """Extract a sphere from its SDF grid; check radius and watertightness."""
    res = 48
    x = np.linspace(-0.5, 0.5, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    r = 0.35
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r  # positive outside
    verts, tris = native.marching_cubes(-sdf, 0.0)  # reference negates
    assert len(verts) > 100 and len(tris) > 100
    # verts in grid-index coords; map back to world
    world = verts / (res - 1) - 0.5
    radii = np.linalg.norm(world, axis=1)
    assert abs(radii.mean() - r) < 0.01
    assert radii.std() < 0.01
    # watertight: every edge shared by exactly 2 triangles
    edges = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_marching_cubes_normals_outward():
    res = 24
    x = np.linspace(-0.5, 0.5, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing='ij')
    sdf = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.3
    verts, tris = native.marching_cubes(-sdf, 0.0)
    m = Mesh(verts / (res - 1) - 0.5, tris)
    centers = m.triangles.mean(1)
    outward = (m.face_normals * centers).sum(1)
    assert (outward > 0).mean() > 0.99


def test_kdtree_nn_matches_scipy(rng):
    src = rng.randn(500, 3)
    dst = rng.randn(800, 3)
    d_ours, i_ours = native.nn_distances(src, dst, return_index=True)
    d_ref, i_ref = cKDTree(dst).query(src)
    np.testing.assert_allclose(d_ours, d_ref, atol=1e-12)
    np.testing.assert_array_equal(i_ours, i_ref)


def test_signed_distance_sphere(rng):
    sph = make_icosphere(4, radius=0.4)
    pts = rng.uniform(-0.5, 0.5, (500, 3))
    sdf = native.signed_distance(pts, sph.vertices, sph.faces)
    expected = np.linalg.norm(pts, axis=1) - 0.4
    # icosphere under-approximates the sphere slightly; loose tolerance
    np.testing.assert_allclose(sdf, expected, atol=5e-3)


def test_unsigned_distance_matches_fallback(rng):
    box = make_box()
    pts = rng.uniform(-1, 1, (50, 3))
    d1 = native.unsigned_distance(pts, box.vertices, box.faces)
    d2 = native._unsigned_distance_numpy(pts, box.vertices.astype(float),
                                         box.faces)
    np.testing.assert_allclose(d1, d2, atol=1e-10)


def test_mesh_sampling_uniform(rng):
    box = make_box(extents=(2, 2, 2))
    pts, idx = box.sample(5000, return_index=True,
                          rng=np.random.RandomState(0))
    assert pts.shape == (5000, 3)
    # all samples on the surface: max |coord| == 1 per point
    on_surface = np.isclose(np.abs(pts).max(1), 1.0, atol=1e-9)
    assert on_surface.all()


def test_mesh_io_roundtrip(tmp_path):
    m = make_icosphere(1, 0.5)
    p_obj = str(tmp_path / 'm.obj')
    p_ply = str(tmp_path / 'm.ply')
    m.export(p_obj)
    m.export(p_ply)
    from list_tpu.utils.meshio import load_mesh
    m2 = load_mesh(p_obj)
    m3 = load_mesh(p_ply)
    np.testing.assert_allclose(m2.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m2.faces, m.faces)
    np.testing.assert_allclose(m3.vertices, m.vertices, atol=1e-5)
    np.testing.assert_array_equal(m3.faces, m.faces)
