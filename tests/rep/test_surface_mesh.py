import jax.numpy as jnp
import numpy as np

from kaolin_tpu.rep import SurfaceMesh


def _tet_mesh():
    vertices = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                            [0., 0., 1.]])
    faces = jnp.asarray([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    return SurfaceMesh(vertices=vertices, faces=faces)


def test_basic_attributes():
    mesh = _tet_mesh()
    assert mesh.batching == SurfaceMesh.Batching.NONE
    assert len(mesh) == 1
    assert mesh.vertices.shape == (4, 3)
    assert mesh.get_attributes(only_tensors=True) == ["vertices", "faces"]


def test_auto_compute_face_vertices():
    mesh = _tet_mesh()
    fv = mesh.face_vertices
    assert fv.shape == (4, 3, 3)
    np.testing.assert_allclose(fv[0, 1], [0., 1., 0.])
    # cached
    assert "face_vertices" in mesh.get_attributes()


def test_auto_compute_normals_chain():
    mesh = _tet_mesh()
    fn = mesh.face_normals
    assert fn.shape == (4, 3, 3)
    # outward normal of bottom face (0,2,1) is -z
    np.testing.assert_allclose(fn[0, 0], [0., 0., -1.], atol=1e-6)
    vn = mesh.vertex_normals
    assert vn.shape == (4, 3)
    assert np.isfinite(np.asarray(vn)).all()


def test_unset_returns_none():
    mesh = _tet_mesh()
    assert mesh.uvs is None
    assert mesh.face_uvs is None  # cannot compute without uvs


def test_setattr_invalidates_cache():
    mesh = _tet_mesh()
    _ = mesh.face_vertices
    mesh.vertices = mesh.vertices * 2.0
    fv = mesh.face_vertices
    np.testing.assert_allclose(fv[0, 1], [0., 2., 0.])


def test_to_batched_and_cat():
    mesh = _tet_mesh()
    batched = mesh.to_batched()
    assert batched.batching == SurfaceMesh.Batching.FIXED
    assert batched.vertices.shape == (1, 4, 3)
    assert batched.faces.shape == (4, 3)
    both = SurfaceMesh.cat([mesh, mesh], fixed_topology=True)
    assert len(both) == 2
    assert both.vertices.shape == (2, 4, 3)
    fv = both.face_vertices
    assert fv.shape == (2, 4, 3, 3)


def test_list_batching():
    m1 = _tet_mesh()
    m2 = SurfaceMesh(vertices=jnp.asarray([[0., 0., 0.], [1., 0., 0.],
                                           [0., 1., 0.]]),
                     faces=jnp.asarray([[0, 1, 2]]))
    lst = SurfaceMesh.cat([m1, m2], fixed_topology=False)
    assert lst.batching == SurfaceMesh.Batching.LIST
    assert len(lst) == 2
    fv = lst.face_vertices
    assert isinstance(fv, list) and fv[1].shape == (1, 3, 3)


def test_face_uvs_from_idx():
    mesh = _tet_mesh()
    mesh.uvs = jnp.asarray([[0., 0.], [1., 0.], [0., 1.]])
    mesh.face_uvs_idx = jnp.asarray([[0, 1, 2]] * 4)
    assert mesh.face_uvs.shape == (4, 3, 2)


def test_as_transformed():
    mesh = _tet_mesh()
    m = jnp.eye(4).at[:3, 3].set(jnp.asarray([1.0, 2.0, 3.0]))
    out = mesh.as_transformed(m)
    np.testing.assert_allclose(out.vertices[0], [1., 2., 3.])
    # original untouched
    np.testing.assert_allclose(mesh.vertices[0], [0., 0., 0.])
