import jax
import jax.numpy as jnp
import numpy as np

import kaolin_tpu.ops.mesh as mesh_ops
from kaolin_tpu.metrics.tetmesh import tetrahedron_volume


def _tet():
    verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.], [0., 0., 1.]]])
    faces = jnp.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], dtype=jnp.int32)
    return verts, faces


def test_face_areas():
    verts, faces = _tet()
    areas = mesh_ops.face_areas(verts, faces)
    np.testing.assert_allclose(areas[0, :3], 0.5, rtol=1e-6)
    np.testing.assert_allclose(areas[0, 3], np.sqrt(3) / 2, rtol=1e-6)


def test_face_normals_unit():
    verts, faces = _tet()
    fv = verts[:, faces]
    n = mesh_ops.face_normals(fv, unit=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(n), axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(n[0, 0], [0., 0., 1.], atol=1e-6)


def test_sample_points_on_surface(key):
    verts, faces = _tet()
    pts, choices = mesh_ops.sample_points(verts, faces, 500, key)
    assert pts.shape == (1, 500, 3)
    # all sampled points must lie on one of the 4 planes
    p = np.asarray(pts[0])
    on_x = np.abs(p[:, 0]) < 1e-5
    on_y = np.abs(p[:, 1]) < 1e-5
    on_z = np.abs(p[:, 2]) < 1e-5
    on_diag = np.abs(p.sum(axis=1) - 1) < 1e-5
    assert np.all(on_x | on_y | on_z | on_diag)


def test_sample_points_area_weighting(key):
    """Face with larger area must get proportionally more samples."""
    verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                          [10., 0., 1.], [0., 10., 1.]]])
    faces = jnp.asarray([[0, 1, 2], [0, 3, 4]], dtype=jnp.int32)
    _, choices = mesh_ops.sample_points(verts, faces, 2000, key)
    frac_big = float(np.mean(np.asarray(choices) == 1))
    assert frac_big > 0.95  # area ratio is 100:1


def test_index_vertices_by_faces():
    verts, faces = _tet()
    fv = mesh_ops.index_vertices_by_faces(verts, faces)
    assert fv.shape == (1, 4, 3, 3)
    np.testing.assert_allclose(fv[0, 0, 1], [1., 0., 0.])


def test_adjacency_and_laplacian():
    faces = jnp.asarray([[0, 1, 2]])
    adj = mesh_ops.adjacency_matrix(3, faces)
    expected = np.ones((3, 3)) - np.eye(3)
    np.testing.assert_allclose(adj, expected)
    lap = mesh_ops.uniform_laplacian(3, faces)
    np.testing.assert_allclose(lap, [[-1, .5, .5], [.5, -1, .5], [.5, .5, -1]])


def test_compute_vertex_normals():
    verts, faces = _tet()
    fv = verts[:, faces]
    fn = mesh_ops.face_normals(fv, unit=True)
    # expand to per-face-per-vertex
    fn_pv = jnp.broadcast_to(fn[:, :, None, :], fn.shape[:2] + (3, 3))
    vn = mesh_ops.compute_vertex_normals(faces, fn_pv, num_vertices=4)
    assert vn.shape == (1, 4, 3)
    assert np.isfinite(np.asarray(vn)).all()


def test_check_sign():
    verts, faces = _tet()
    inside = jnp.asarray([[[0.1, 0.1, 0.1], [0.2, 0.2, 0.2], [0.24, 0.24, 0.24]]])
    outside = jnp.asarray([[[1., 1., 1.], [-0.1, 0.0, 0.0], [0.4, 0.4, 0.4]]])
    assert np.all(np.asarray(mesh_ops.check_sign(verts, faces, inside)))
    assert not np.any(np.asarray(mesh_ops.check_sign(verts, faces, outside)))


def test_check_sign_reference_example():
    """Reference docstring example (check_sign.py:85-103)."""
    verts = jnp.asarray([[[0., 0., 0.], [1., 0.5, 1.], [0.5, 1., 1.], [1., 1., 0.5]]])
    faces = jnp.asarray([[0, 3, 1], [0, 1, 2], [0, 2, 3], [3, 2, 1]])
    axis = np.linspace(0.1, 0.9, 3)
    px, py, pz = np.meshgrid(axis + 0.01, axis + 0.02, axis + 0.03, indexing="ij")
    points = jnp.asarray(np.stack([px, py, pz], axis=-1).reshape(1, -1, 3),
                         dtype=jnp.float32)
    got = np.asarray(mesh_ops.check_sign(verts, faces, points))[0]
    want = np.array([True, False, False, False, False, False, False, False, False,
                     False, False, False, False, True, False, False, False, True,
                     False, False, False, False, False, True, False, True, False])
    np.testing.assert_array_equal(got, want)


def test_subdivide_trianglemesh_reference_example():
    """Reference docstring example (trianglemesh.py:510-546)."""
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
    alpha = jnp.zeros((1, 4))
    nv, nf = mesh_ops.subdivide_trianglemesh(vertices, faces, 1, alpha)
    want_v = np.array([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                        [0.0, 0.0, 1.0], [0.375, 0.125, 0.125], [0.125, 0.375, 0.125],
                        [0.125, 0.125, 0.375], [0.375, 0.375, 0.125],
                        [0.375, 0.125, 0.375], [0.125, 0.375, 0.375]]])
    np.testing.assert_allclose(nv, want_v, atol=1e-6)
    assert nf.shape == (16, 3)


def test_subdivide_tetmesh_reference_example():
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float32)
    tets = jnp.asarray([[0, 1, 2, 3]])
    sdf = jnp.asarray([[[-1.], [-1.], [0.5], [0.5]]])
    nv, nt, nsdf = mesh_ops.subdivide_tetmesh(vertices, tets, sdf)
    assert nv.shape == (1, 10, 3)
    assert nt.shape == (8, 4)
    np.testing.assert_allclose(nsdf[0, :, 0],
                               [-1, -1, 0.5, 0.5, -1, -0.25, -0.25, -0.25, -0.25, 0.5])
    # total volume preserved
    tot = tetrahedron_volume(nv[:, nt]).sum()
    np.testing.assert_allclose(abs(float(tot)), 1.0 / 6.0, rtol=1e-5)


def test_inverse_vertices_offset():
    from kaolin_tpu.ops.mesh import inverse_vertices_offset
    tv = jnp.asarray([[[[-0.0500, 0.0000, 0.0500],
                        [-0.0250, -0.0500, 0.0000],
                        [0.0000, 0.0000, 0.0500],
                        [0.5000, 0.5000, 0.4500]]]])
    inv = inverse_vertices_offset(tv)
    want = np.array([[[0.0000, 20.0000, 0.0000],
                      [79.9999, -149.9999, 10.0000],
                      [-99.9999, 159.9998, -10.0000]]])
    np.testing.assert_allclose(inv[0], want, rtol=1e-3, atol=1e-4)
