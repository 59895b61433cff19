"""SurfaceMesh behavioral spec, ported from the reference's exhaustive
matrix (ref ``tests/python/kaolin/rep/test_surface_mesh.py``):

* every computable attribute auto-computes from each of its requirement
  sets, under every batching, with correct shapes and caching
  (ref ``test_exhaustive_auto_compute`` :649);
* ``allow_auto_compute=False`` returns the unset value instead
  (ref :649 ``allow_auto_compute`` axis);
* empty meshes (0 faces / 0 vertices) survive construction, batching
  conversion, and auto-compute without NaNs (ref :924, :946);
* gradients flow from auto-computed attributes back to ``vertices``
  (ref ``test_backprop_to_vertices`` :965);
* ``cat`` inputs with differently-cached attributes still concatenate the
  intersection and can compute the rest (ref ``test_cat_autocompute``
  :1572);
* ``float_tensors_to`` converts float attrs only (ref ``test_type_convert``
  :1415).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.rep import SurfaceMesh

B = SurfaceMesh.Batching


def _full_source(seed=0):
    """Mesh with every source attribute a computable attr may require."""
    rng = np.random.RandomState(seed)
    vertices = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                            [0., 0., 1.]])
    faces = jnp.asarray([[0, 2, 1], [0, 1, 3], [0, 3, 2], [1, 2, 3]])
    normals = jnp.asarray(rng.randn(5, 3), jnp.float32)
    uvs = jnp.asarray(rng.rand(6, 2), jnp.float32)
    return dict(
        vertices=vertices, faces=faces,
        normals=normals,
        face_normals_idx=jnp.asarray(rng.randint(0, 5, (4, 3)), jnp.int32),
        uvs=uvs,
        face_uvs_idx=jnp.asarray(rng.randint(0, 6, (4, 3)), jnp.int32),
        vertex_colors=jnp.asarray(rng.rand(4, 3), jnp.float32),
        vertex_features=jnp.asarray(rng.rand(4, 7), jnp.float32),
        face_colors=jnp.asarray(rng.rand(4, 3, 3), jnp.float32),
        face_features=jnp.asarray(rng.rand(4, 3, 7), jnp.float32),
    )


_REQS = SurfaceMesh.computable_attribute_requirements()
_CASES = [(attr, i) for attr, reqs in sorted(_REQS.items())
          for i in range(len(reqs))]


def _mesh_with(attrs, batching):
    m = SurfaceMesh(**attrs)
    if batching != B.NONE:
        m = m.to_batched()
        if batching == B.LIST:
            m.set_batching(B.LIST)
    return m


def _resolve_sources(attr, req, src, depth=0):
    """The source attrs needed for requirement set `req`, recursing into
    requirements that are themselves computed (first path)."""
    out = {}
    for r in req:
        if r in src:
            out[r] = src[r]
        else:
            assert r in _REQS, f"{r} neither source nor computable"
            out.update(_resolve_sources(r, _REQS[r][0], src, depth + 1))
    return out


@pytest.mark.parametrize("batching", [B.NONE, B.FIXED, B.LIST])
@pytest.mark.parametrize("attr,req_i", _CASES,
                         ids=[f"{a}-req{i}" for a, i in _CASES])
def test_exhaustive_auto_compute(attr, req_i, batching):
    src = _full_source()
    req = _REQS[attr][req_i]
    attrs = _resolve_sources(attr, req, src)
    # vertices/faces are universal: realistic meshes always carry them and
    # batching conversion keys off vertices
    attrs.setdefault("faces", src["faces"])
    attrs.setdefault("vertices", src["vertices"])
    mesh = _mesh_with(attrs, batching)

    val = getattr(mesh, attr)
    assert val is not None, f"{attr} failed to auto-compute from {req}"
    assert attr in mesh.get_attributes(), "computed value must be cached"

    exp = SurfaceMesh._expected_shape(attr, batching,
                                      batchsize=len(mesh), numfaces=4,
                                      facesize=3, numverts=4)
    got = val[0].shape if batching == B.LIST else val.shape
    if batching == B.LIST:
        exp = SurfaceMesh._expected_shape(attr, B.NONE, numfaces=4,
                                          facesize=3, numverts=4)
    assert SurfaceMesh._shape_matches(got, exp), \
        f"{attr} {batching}: shape {got} != expected {exp}"
    leaves = val if batching == B.LIST else [val]
    for leaf in leaves:
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("attr,req_i", _CASES[:5],
                         ids=[f"{a}-req{i}" for a, i in _CASES[:5]])
def test_no_auto_compute_returns_unset(attr, req_i):
    src = _full_source()
    attrs = _resolve_sources(attr, _REQS[attr][req_i], src)
    mesh = SurfaceMesh(allow_auto_compute=False, **attrs)
    assert getattr(mesh, attr) is None
    assert attr not in mesh.get_attributes()


@pytest.mark.parametrize("batching", [B.NONE, B.FIXED])
def test_empty_faces(batching):
    mesh = _mesh_with(dict(
        vertices=jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.]]),
        faces=jnp.zeros((0, 3), jnp.int32)), batching)
    fv = mesh.face_vertices
    assert fv.shape[-3:] == (0, 3, 3)
    fn = mesh.face_normals
    assert fn.shape[-3:] == (0, 3, 3)
    vn = mesh.vertex_normals
    assert np.isfinite(np.asarray(vn)).all()
    assert mesh.check_sanity()


def test_empty_vertices():
    mesh = SurfaceMesh(vertices=jnp.zeros((0, 3)),
                       faces=jnp.zeros((0, 3), jnp.int32))
    assert mesh.face_vertices.shape == (0, 3, 3)
    assert mesh.check_sanity()


@pytest.mark.parametrize("through", ["face_normals", "vertex_normals",
                                     "face_vertices"])
def test_backprop_to_vertices(through):
    """Gradients flow through lazily-computed attributes to vertices."""
    src = _full_source()

    def loss(v):
        mesh = SurfaceMesh(vertices=v, faces=src["faces"])
        return jnp.sum(jnp.sin(getattr(mesh, through)))

    g = jax.grad(loss)(src["vertices"])
    assert g.shape == src["vertices"].shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_cat_autocompute_mixed_caches():
    """cat() of meshes with different cached attrs: the result still
    computes derived attributes correctly (ref test_cat_autocompute)."""
    src = _full_source()
    m1 = SurfaceMesh(vertices=src["vertices"], faces=src["faces"])
    _ = m1.face_normals           # cached on m1 only
    m2 = SurfaceMesh(vertices=src["vertices"] + 1.0, faces=src["faces"])
    out = SurfaceMesh.cat([m1, m2], fixed_topology=True)
    assert out.batching == B.FIXED
    assert len(out) == 2
    fn = out.face_normals
    assert fn.shape == (2, 4, 3, 3)
    # translation leaves normals identical across the batch
    np.testing.assert_allclose(np.asarray(fn[0]), np.asarray(fn[1]),
                               atol=1e-6)


def test_cat_list_variable_topology():
    src = _full_source()
    m1 = SurfaceMesh(vertices=src["vertices"], faces=src["faces"])
    m2 = SurfaceMesh(vertices=src["vertices"][:3],
                     faces=jnp.asarray([[0, 1, 2]]))
    out = SurfaceMesh.cat([m1, m2], fixed_topology=False)
    assert out.batching == B.LIST
    assert len(out) == 2
    assert out.faces[0].shape == (4, 3)
    assert out.faces[1].shape == (1, 3)
    fn = out.face_normals
    assert fn[0].shape == (4, 3, 3) and fn[1].shape == (1, 3, 3)


def test_float_tensors_to_converts_floats_only():
    src = _full_source()
    mesh = SurfaceMesh(vertices=src["vertices"], faces=src["faces"],
                       vertex_colors=src["vertex_colors"])
    out = mesh.float_tensors_to(jnp.float16)
    assert out.vertices.dtype == jnp.float16
    assert out.vertex_colors.dtype == jnp.float16
    assert out.faces.dtype in (jnp.int32, jnp.int64)
