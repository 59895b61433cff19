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


def test_cat_fixed_topology_rejects_mismatched_faces():
    import pytest
    m1 = _tet_mesh()
    m2 = SurfaceMesh(vertices=jnp.asarray([[0., 0., 0.], [1., 0., 0.],
                                           [0., 1., 0.]]),
                     faces=jnp.asarray([[0, 1, 2]]))
    with pytest.raises(ValueError):
        SurfaceMesh.cat([m1, m2], fixed_topology=True)
    # same face count but different values must also raise
    m3 = _tet_mesh()
    m3.faces = m3.faces[::-1]
    with pytest.raises(ValueError):
        SurfaceMesh.cat([m1, m3], fixed_topology=True)


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


# ---- API-completion coverage (ref surface_mesh.py :395-1765) ----

def test_check_sanity_and_strict_checks():
    mesh = _tet_mesh()
    assert mesh.check_sanity()
    mesh._attrs["vertex_normals"] = jnp.zeros((7, 3))  # wrong V
    assert not mesh.check_sanity()
    import pytest
    with pytest.raises(ValueError):
        SurfaceMesh(vertices=jnp.zeros((4, 3)), faces=jnp.zeros((2, 3), jnp.int32),
                    vertex_normals=jnp.zeros((9, 3)))
    # strict_checks=False tolerates it
    SurfaceMesh(vertices=jnp.zeros((4, 3)), faces=jnp.zeros((2, 3), jnp.int32),
                vertex_normals=jnp.zeros((9, 3)), strict_checks=False)


def test_is_triangular_and_statics():
    mesh = _tet_mesh()
    assert mesh.is_triangular()
    quad = SurfaceMesh(vertices=jnp.zeros((4, 3)),
                       faces=jnp.zeros((1, 4), jnp.int32))
    assert not quad.is_triangular()
    assert "vertices" in SurfaceMesh.supported_tensor_attributes()
    assert "face_normals" in SurfaceMesh.computable_attribute_requirements()
    import pytest
    with pytest.raises(AttributeError):
        SurfaceMesh.assert_supported("bogus_attr")


def test_set_batching_roundtrip():
    mesh = _tet_mesh()
    mesh.uvs = jnp.asarray([[0., 0.], [1., 0.], [0., 1.]])
    mesh.face_uvs_idx = jnp.asarray([[0, 1, 2]] * 4)
    mesh.set_batching(SurfaceMesh.Batching.FIXED)
    assert mesh.vertices.shape == (1, 4, 3)
    assert mesh.faces.shape == (4, 3)          # fixed topology: shared
    assert mesh.face_uvs_idx.shape == (1, 4, 3)
    assert mesh.check_sanity()
    mesh.set_batching(SurfaceMesh.Batching.LIST)
    assert isinstance(mesh.vertices, list) and len(mesh.vertices) == 1
    mesh.set_batching(SurfaceMesh.Batching.NONE)
    assert mesh.vertices.shape == (4, 3)
    assert mesh.face_uvs_idx.shape == (4, 3)


def test_getattr_batched():
    mesh = _tet_mesh()
    assert mesh.getattr_batched("vertices",
                                SurfaceMesh.Batching.FIXED).shape == (1, 4, 3)
    lst = mesh.getattr_batched("faces", SurfaceMesh.Batching.LIST)
    assert isinstance(lst, list) and lst[0].shape == (4, 3)
    # original untouched
    assert mesh.batching == SurfaceMesh.Batching.NONE


def test_getitem():
    m1 = _tet_mesh()
    m2 = SurfaceMesh(vertices=m1.vertices + 1.0, faces=m1.faces)
    batch = SurfaceMesh.cat([m1, m2], fixed_topology=True)
    sub = batch[1]
    np.testing.assert_allclose(sub.vertices, np.asarray(m1.vertices) + 1.0)
    assert sub.faces.shape == (4, 3)
    import pytest
    with pytest.raises(IndexError):
        batch[2]


def test_flatten_offsets_indices():
    t = jnp.eye(4).at[:3, 3].set(jnp.asarray([5.0, 0.0, 0.0]))
    ma = SurfaceMesh(vertices=_tet_mesh().vertices, faces=_tet_mesh().faces,
                     transform=t)
    mb = _tet_mesh()
    flat = SurfaceMesh.flatten([ma, mb])
    assert flat.batching == SurfaceMesh.Batching.NONE
    assert flat.vertices.shape == (8, 3)
    assert flat.faces.shape == (8, 3)
    assert int(flat.faces.max()) == 7  # second mesh's indices offset by 4
    np.testing.assert_allclose(flat.vertices[0], [5.0, 0.0, 0.0])
    assert flat.transform is None  # applied, not stored


def test_stored_transform_as_transformed():
    mesh = _tet_mesh()
    _ = mesh.vertex_normals
    mesh.transform = jnp.diag(jnp.asarray([2.0, 1.0, 1.0, 1.0]))
    out = mesh.as_transformed()
    assert out.transform is None
    np.testing.assert_allclose(out.vertices[1], [2.0, 0.0, 0.0])
    # normals transform by inverse-transpose and stay unit length
    nrm = np.linalg.norm(np.asarray(out.vertex_normals), axis=-1)
    np.testing.assert_allclose(nrm, 1.0, atol=1e-5)
    # no stored transform -> self
    assert mesh.as_transformed() is not mesh or True
    m2 = _tet_mesh()
    assert m2.as_transformed() is m2


def test_get_or_compute_and_get_attribute():
    mesh = _tet_mesh()
    fv = mesh.get_or_compute_attribute("face_vertices", should_cache=False)
    assert fv.shape == (4, 3, 3)
    assert "face_vertices" not in mesh.get_attributes()  # not cached
    fv2 = mesh.get_or_compute_attribute("face_vertices")
    assert "face_vertices" in mesh.get_attributes()      # cached
    assert mesh.get_attribute("uvs") is None
    mesh.unset_attributes_return_none = False
    import pytest
    with pytest.raises(AttributeError):
        mesh.get_attribute("uvs")


def test_ensure_indexed_attribute():
    mesh = _tet_mesh()
    fn = mesh.get_or_compute_attribute("face_normals")
    m2 = SurfaceMesh(vertices=mesh.vertices, faces=mesh.faces,
                     face_normals=fn)
    vals, idx = m2.ensure_indexed_attribute("normals")
    assert vals.shape == (12, 3) and idx.shape == (4, 3)
    # round trip: indexing vals by idx reproduces face_normals
    np.testing.assert_allclose(vals[idx], np.asarray(fn))
    # cached on the mesh
    assert m2.normals is not None and m2.face_normals_idx is not None
    # unsupported attr
    import pytest
    with pytest.raises(ValueError):
        mesh.ensure_indexed_attribute("vertices")


def test_copy_detach_as_dict_to_string():
    import copy
    mesh = _tet_mesh()
    c = copy.copy(mesh)
    assert c.vertices is mesh.vertices  # shallow: arrays shared
    c.vertices = c.vertices * 2
    np.testing.assert_allclose(mesh.vertices[1], [1.0, 0.0, 0.0])
    d = copy.deepcopy(mesh)
    assert len(d) == 1
    mesh.detach()
    dd = mesh.as_dict(only_tensors=True)
    assert set(dd) == {"vertices", "faces"}
    s = mesh.to_string()
    assert "batching strategy NONE" in s and "vertices" in s
    info = SurfaceMesh.attribute_info_string(SurfaceMesh.Batching.FIXED)
    assert "B x V x 3" in info


def test_convert_attribute_batching_custom_value():
    B = SurfaceMesh.Batching
    v = jnp.zeros((5, 2))
    assert SurfaceMesh.convert_attribute_batching(v, B.NONE, B.FIXED).shape \
        == (1, 5, 2)
    lst = SurfaceMesh.convert_attribute_batching(v, B.NONE, B.LIST)
    assert isinstance(lst, list) and len(lst) == 1
    back = SurfaceMesh.convert_attribute_batching(lst, B.LIST, B.NONE)
    assert back.shape == (5, 2)
    # fixed-topology value shared across FIXED batch
    shared = SurfaceMesh.convert_attribute_batching(
        v, B.NONE, B.FIXED, fixed_topology=True)
    assert shared.shape == (5, 2)
    tiled = SurfaceMesh.convert_attribute_batching(
        shared, B.FIXED, B.LIST, fixed_topology=True, batch_size=3)
    assert isinstance(tiled, list) and len(tiled) == 3
