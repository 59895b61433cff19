"""SurfaceMesh behavior parity vs the reference container (pure torch).

Runs the reference ``kaolin.rep.SurfaceMesh`` side by side with ours on the
same data: auto-compute chains, batching conversions, cat, getitem,
attribute bookkeeping. Ref rep/surface_mesh.py:34.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from kaolin_tpu.rep import SurfaceMesh

from tests.reference_shim import import_reference_kaolin

ref = import_reference_kaolin()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


def _data():
    rng = np.random.RandomState(0)
    v = rng.rand(8, 3).astype(np.float32)
    f = np.array([[0, 1, 2], [2, 3, 4], [4, 5, 6], [6, 7, 0]], np.int64)
    uvs = rng.rand(6, 2).astype(np.float32)
    fuv = np.array([[0, 1, 2]] * 4, np.int64)
    return v, f, uvs, fuv


def _pair(**extra):
    v, f, uvs, fuv = _data()
    theirs = ref.rep.SurfaceMesh(
        vertices=torch.as_tensor(v), faces=torch.as_tensor(f),
        uvs=torch.as_tensor(uvs), face_uvs_idx=torch.as_tensor(fuv), **extra)
    ours = SurfaceMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f),
                       uvs=jnp.asarray(uvs), face_uvs_idx=jnp.asarray(fuv))
    return theirs, ours


def test_autocompute_chain_parity():
    theirs, ours = _pair()
    np.testing.assert_allclose(np.asarray(ours.face_vertices),
                               theirs.face_vertices.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.face_uvs),
                               theirs.face_uvs.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.face_normals),
                               theirs.face_normals.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.vertex_normals),
                               theirs.vertex_normals.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.vertex_tangents),
                               theirs.vertex_tangents.numpy(), atol=1e-4)


def test_attribute_list_parity():
    theirs, ours = _pair()
    # same attribute visibility before compute
    t_attrs = set(theirs.get_attributes(only_tensors=True))
    o_attrs = set(ours.get_attributes(only_tensors=True))
    assert t_attrs == o_attrs
    assert theirs.has_attribute("vertices") == ours.has_attribute("vertices")
    assert theirs.has_attribute("normals") == ours.has_attribute("normals")
    assert (theirs.probably_can_compute_attribute("face_normals")
            == ours.probably_can_compute_attribute("face_normals"))
    assert (theirs.probably_can_compute_attribute("face_colors")
            == ours.probably_can_compute_attribute("face_colors"))
    assert len(theirs) == len(ours) == 1
    assert theirs.is_triangular() == ours.is_triangular() is True


def test_batching_conversion_parity():
    theirs, ours = _pair()
    theirs.to_batched()
    ours.to_batched()
    assert theirs.batching.value == ours.batching.value == "FIXED"
    np.testing.assert_allclose(np.asarray(ours.vertices),
                               theirs.vertices.numpy(), atol=1e-6)
    # faces stay shared under FIXED
    assert tuple(theirs.faces.shape) == tuple(ours.faces.shape)
    theirs.set_batching(ref.rep.SurfaceMesh.Batching.LIST)
    ours.set_batching(SurfaceMesh.Batching.LIST)
    assert theirs.batching.value == ours.batching.value == "LIST"
    assert isinstance(theirs.vertices, list) and isinstance(ours.vertices,
                                                            list)
    np.testing.assert_allclose(np.asarray(ours.vertices[0]),
                               theirs.vertices[0].numpy(), atol=1e-6)


def test_cat_and_getitem_parity():
    t1, o1 = _pair()
    t2, o2 = _pair()
    t_cat = ref.rep.SurfaceMesh.cat([t1, t2], fixed_topology=True)
    o_cat = SurfaceMesh.cat([o1, o2], fixed_topology=True)
    assert len(t_cat) == len(o_cat) == 2
    np.testing.assert_allclose(np.asarray(o_cat.vertices),
                               t_cat.vertices.numpy(), atol=1e-6)
    t_sub = t_cat[1]
    o_sub = o_cat[1]
    np.testing.assert_allclose(np.asarray(o_sub.vertices),
                               t_sub.vertices.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(o_sub.faces),
                                  t_sub.faces.numpy())


def test_unset_semantics_parity():
    theirs, ours = _pair()
    assert theirs.material_assignments is None
    assert ours.material_assignments is None
    # face_colors not computable without vertex_colors
    assert theirs.face_colors is None and ours.face_colors is None
    theirs.unset_attributes_return_none = False
    ours.unset_attributes_return_none = False
    with pytest.raises(AttributeError):
        _ = theirs.material_assignments
    with pytest.raises(AttributeError):
        _ = ours.material_assignments


def test_flatten_parity():
    t1, o1 = _pair()
    t2, o2 = _pair()
    t_flat = ref.rep.SurfaceMesh.flatten([t1, t2])
    o_flat = SurfaceMesh.flatten([o1, o2])
    np.testing.assert_allclose(np.asarray(o_flat.vertices),
                               t_flat.vertices.numpy(), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(o_flat.faces),
                                  t_flat.faces.numpy())
    np.testing.assert_array_equal(np.asarray(o_flat.face_uvs_idx),
                                  t_flat.face_uvs_idx.numpy())
    np.testing.assert_allclose(np.asarray(o_flat.uvs),
                               t_flat.uvs.numpy(), atol=1e-6)


def test_stored_transform_parity():
    v, f, uvs, fuv = _data()
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = np.diag([2.0, 0.5, 1.0]).astype(np.float32)
    t[:3, 3] = [1.0, -2.0, 0.5]
    theirs = ref.rep.SurfaceMesh(vertices=torch.as_tensor(v),
                                 faces=torch.as_tensor(f),
                                 transform=torch.as_tensor(t))
    ours = SurfaceMesh(vertices=jnp.asarray(v), faces=jnp.asarray(f),
                       transform=jnp.asarray(t))
    _ = theirs.vertex_normals
    _ = ours.vertex_normals
    t_out = theirs.as_transformed()
    o_out = ours.as_transformed()
    np.testing.assert_allclose(np.asarray(o_out.vertices),
                               t_out.vertices.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_out.vertex_normals),
                               t_out.vertex_normals.numpy(), atol=1e-4)
    assert t_out.transform is None and o_out.transform is None
