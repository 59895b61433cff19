import os

import jax.numpy as jnp
import numpy as np
import pytest

import kaolin_tpu.io as kio
from kaolin_tpu.rep import SurfaceMesh

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()

SAMPLES = "/root/reference/tests/samples"


def test_obj_import_simple():
    mesh = kio.obj.import_mesh(f"{SAMPLES}/simple_obj/model.obj")
    assert mesh.vertices.shape[-1] == 3
    assert mesh.faces.shape[-1] in (3, 4)
    assert mesh.vertices.shape[0] > 0
    tri = kio.obj.import_mesh(f"{SAMPLES}/simple_obj/model.obj",
                              triangulate=True)
    assert tri.faces.shape[-1] == 3


def test_obj_import_parity_with_reference():
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    path = f"{SAMPLES}/rocket.obj"
    ours = kio.obj.import_mesh(path, with_normals=True, triangulate=True)
    theirs = ref_kaolin.io.obj.import_mesh(path, with_normals=True,
                                           triangulate=True)
    np.testing.assert_allclose(ours.vertices, theirs.vertices.numpy(),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.faces),
                                  theirs.faces.numpy())
    if theirs.normals is not None:
        np.testing.assert_allclose(ours.normals, theirs.normals.numpy(),
                                   atol=1e-6)


def test_obj_materials_parity():
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    path = f"{SAMPLES}/colored_sphere.obj"
    ours = kio.obj.import_mesh(path, with_materials=True, triangulate=True)
    theirs = ref_kaolin.io.obj.import_mesh(path, with_materials=True,
                                           triangulate=True)
    assert len(ours.materials) == len(theirs.materials)
    np.testing.assert_array_equal(np.asarray(ours.material_assignments),
                                  theirs.material_assignments.numpy())


def test_obj_heterogeneous_triangulate():
    path = f"{SAMPLES}/simple_obj/model_heterogeneous.obj"
    mesh = kio.obj.import_mesh(path, triangulate=True)
    assert mesh.faces.shape[-1] == 3
    if ref_kaolin is not None:
        theirs = ref_kaolin.io.obj.import_mesh(path, triangulate=True)
        np.testing.assert_array_equal(np.asarray(mesh.faces),
                                      theirs.faces.numpy())


def test_obj_roundtrip(tmp_path):
    mesh = kio.obj.import_mesh(f"{SAMPLES}/simple_obj/model.obj")
    out = str(tmp_path / "out.obj")
    kio.obj.export_mesh(out, mesh=mesh)
    back = kio.obj.import_mesh(out)
    np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(back.faces),
                                  np.asarray(mesh.faces))


def test_gltf_import():
    mesh = kio.gltf.import_mesh(f"{SAMPLES}/rep/armchair.gltf")
    assert mesh.vertices.shape[0] > 0
    assert mesh.faces.shape[-1] == 3
    if ref_kaolin is None:
        return
    theirs_obj = ref_kaolin.io.obj.import_mesh(
        f"{SAMPLES}/rep/armchair.obj", triangulate=True)
    # same geometry up to vertex dedup: compare bounding boxes + counts
    np.testing.assert_allclose(
        np.asarray(mesh.vertices).min(0), theirs_obj.vertices.numpy().min(0),
        atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(mesh.vertices).max(0), theirs_obj.vertices.numpy().max(0),
        atol=1e-3)


def test_off_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3]])
    p = str(tmp_path / "mesh.off")
    kio.off.export_mesh(p, v, f)
    mesh = kio.off.import_mesh(p)
    np.testing.assert_allclose(mesh.vertices, v)
    np.testing.assert_array_equal(np.asarray(mesh.faces), f)


def test_ply_pointcloud_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(50, 3).astype(np.float32)
    colors = rng.rand(50, 3).astype(np.float32)
    p = str(tmp_path / "cloud.ply")
    kio.ply.export_pointcloud(p, pts, colors=colors)
    back_pts, back_colors, _ = kio.ply.import_pointcloud(p)
    np.testing.assert_allclose(back_pts, pts, atol=1e-6)
    np.testing.assert_allclose(back_colors, colors, atol=1e-6)


def test_ply_gaussians_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    n = 20
    pos = rng.randn(n, 3).astype(np.float32)
    opa = rng.randn(n).astype(np.float32)
    scales = rng.randn(n, 3).astype(np.float32)
    rots = rng.randn(n, 4).astype(np.float32)
    sh = rng.randn(n, 4, 3).astype(np.float32)
    p = str(tmp_path / "gs.ply")
    kio.ply.export_gaussians(p, pos, opa, scales, rots, sh)
    g = kio.ply.import_gaussians(p)
    np.testing.assert_allclose(g["positions"], pos, atol=1e-6)
    np.testing.assert_allclose(g["opacities"], opa, atol=1e-6)
    np.testing.assert_allclose(g["scales"], scales, atol=1e-6)
    np.testing.assert_allclose(g["rotations"], rots, atol=1e-6)
    np.testing.assert_allclose(g["sh_coeffs"], sh, atol=1e-6)


def test_usda_mesh_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    f = np.array([[0, 1, 2], [0, 1, 3]])
    p = str(tmp_path / "mesh.usda")
    kio.usd.export_mesh(p, "/World/mesh", v, f)
    mesh = kio.usd.import_mesh(p)
    np.testing.assert_allclose(mesh.vertices, v, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(mesh.faces), f)


def test_usda_import_reference_sample():
    mesh = kio.usd.import_mesh("/root/reference/sample_data/meshes/amsterdam.usda")
    assert mesh.vertices.shape[0] > 0
    assert mesh.faces.shape[-1] >= 3


def test_usda_timesamples(tmp_path):
    p = str(tmp_path / "anim.usda")
    stage = kio.usd.create_stage(p)
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.array([[0, 1, 2]])
    stage.add_mesh("/World/m", v, f, time=0)
    stage.add_mesh("/World/m", v + 1.0, time=1)
    stage.save()
    m0 = kio.usd.import_mesh(p, time=0)
    m1 = kio.usd.import_mesh(p, time=1)
    np.testing.assert_allclose(m0.vertices, v, atol=1e-6)
    np.testing.assert_allclose(m1.vertices, v + 1.0, atol=1e-6)


def test_import_mesh_dispatcher():
    mesh = kio.import_mesh(f"{SAMPLES}/simple_obj/model.obj")
    assert isinstance(mesh, SurfaceMesh)


def test_cached_dataset(tmp_path):
    calls = []

    class Source:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return {"x": np.full((4,), i, dtype=np.float32)}

    def preprocess(item):
        calls.append(1)
        return {"x": item["x"] * 2}

    ds = kio.CachedDataset(Source(), preprocessing_transform=preprocess,
                           cache_dir=str(tmp_path / "cache"))
    a = ds[1]
    b = ds[1]
    np.testing.assert_allclose(a["x"], 2.0)
    np.testing.assert_allclose(np.asarray(b["x"]), np.asarray(a["x"]))
    assert len(calls) == 1  # second access was cached


class _PicklableSource:
    """Module-level so spawn workers can unpickle it."""

    def __len__(self):
        return 6

    def __getitem__(self, i):
        return {"x": np.full((4,), i, dtype=np.float32)}


def _picklable_preprocess(item):
    return {"x": item["x"] * 3}


def test_cached_dataset_parallel_preprocessing(tmp_path):
    """num_workers > 1 preprocesses ahead of time in a spawn process pool
    (ref io/dataset.py:199-201 Pool) — caches exist before first access."""
    cache = tmp_path / "cache_par"
    ds = kio.CachedDataset(_PicklableSource(),
                           preprocessing_transform=_picklable_preprocess,
                           cache_dir=str(cache), num_workers=2)
    cached = sorted(p.name for p in cache.iterdir())
    assert cached == [f"item_{i:08d}.pkl" for i in range(6)]
    for i in range(6):
        np.testing.assert_allclose(np.asarray(ds[i]["x"]), 3.0 * i)


def test_cached_dataset_parallel_fallback_serial(tmp_path):
    """Unpicklable transforms (closures) fall back to the serial loop with a
    warning instead of failing."""
    import warnings
    seen = []

    class Source:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return np.full((2,), i, dtype=np.float32)

    def preprocess(item):  # closure-local: not picklable by spawn
        seen.append(1)
        return item + 1

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ds = kio.CachedDataset(Source(), preprocessing_transform=preprocess,
                               cache_dir=str(tmp_path / "cache_fb"),
                               num_workers=4)
    assert len(seen) == 2  # serial fallback ran everything
    np.testing.assert_allclose(np.asarray(ds[1]), 2.0)


def test_usd_malformed_binary_raises(tmp_path):
    """Truncated/garbage binary containers still fail with a clear error
    (real .usdc/.usdz files are read via the Crate reader, test_usd_crate)."""
    import pytest
    usdc = tmp_path / "model.usdc"
    usdc.write_bytes(b"PXR-USDC" + b"\x00" * 64)
    with pytest.raises(Exception):
        kio.usd.import_meshes(str(usdc))
    usdz = tmp_path / "model.usdz"
    usdz.write_bytes(b"PK\x03\x04" + b"\x00" * 64)
    with pytest.raises(Exception):
        kio.usd.import_meshes(str(usdz))


def test_usd_uv_normal_interpolation_roundtrip(tmp_path):
    """USD meshes with vertex- and faceVarying-interpolated primvars resolve
    into the right SurfaceMesh slots (ref usd/mesh.py:257,279)."""
    usda = tmp_path / "interp.usda"
    usda.write_text('''#usda 1.0

def Mesh "quadThing"
{
    point3f[] points = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    int[] faceVertexCounts = [3, 3]
    int[] faceVertexIndices = [0, 1, 2, 0, 2, 3]
    texCoord2f[] primvars:st = [(0, 0), (1, 0), (1, 1), (0, 1)] (
        interpolation = "vertex"
    )
    normal3f[] normals = [(0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, 1)] (
        interpolation = "vertex"
    )
}
''')
    meshes = kio.usd.import_meshes(str(usda))
    assert len(meshes) == 1
    m = meshes[0]
    assert m.faces.shape == (2, 3)
    assert m.uvs.shape == (4, 2)
    # vertex interpolation: face_uvs_idx == faces
    np.testing.assert_array_equal(np.asarray(m.face_uvs_idx),
                                  np.asarray(m.faces))
    assert m.vertex_normals.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(m.vertex_normals)[:, 2], 1.0)

    facevar = tmp_path / "facevar.usda"
    facevar.write_text('''#usda 1.0

def Mesh "tri"
{
    point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
    texCoord2f[] primvars:st = [(0, 0), (1, 0), (0, 1)] (
        interpolation = "faceVarying"
    )
    normal3f[] normals = [(0, 0, 1), (0, 0, 1), (0, 0, 1)] (
        interpolation = "faceVarying"
    )
}
''')
    m2 = kio.usd.import_meshes(str(facevar))[0]
    np.testing.assert_array_equal(np.asarray(m2.face_uvs_idx), [[0, 1, 2]])
    assert m2.face_normals.shape == (1, 3, 3)


def test_get_face_uvs_idx_semantics():
    from kaolin_tpu.io.usd import get_face_uvs_idx, set_normals
    import pytest
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    uvs = np.zeros((4, 2))
    out = get_face_uvs_idx(faces, [3, 3], uvs, None, "vertex")
    np.testing.assert_array_equal(out, faces)
    out = get_face_uvs_idx(faces, [3, 3], uvs, None, "faceVarying")
    np.testing.assert_array_equal(out, np.arange(6))
    with pytest.raises(NotImplementedError):
        get_face_uvs_idx(faces, [3, 3], uvs, None, "uniform")
    with pytest.raises(ValueError):
        get_face_uvs_idx(faces, [3, 3], None, None, "vertex")
    geo = {"normals": np.zeros((4, 3)), "normals_interpolation": "vertex"}
    set_normals(geo)
    assert "vertex_normals" in geo


def test_usd_uvmap_primvar_fallback(tmp_path):
    """Blender-style primvars:UVMap (no primvars:st) resolves via the
    reference's priority search (ref usd/mesh.py:69)."""
    usda = tmp_path / "blender.usda"
    usda.write_text('''#usda 1.0

def Mesh "blenderThing"
{
    point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
    texCoord2f[] primvars:UVMap = [(0, 0), (1, 0), (0, 1)] (
        interpolation = "faceVarying"
    )
}
''')
    m = kio.usd.import_meshes(str(usda))[0]
    assert m.uvs.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(m.face_uvs_idx), [[0, 1, 2]])
    from kaolin_tpu.io.usd import get_uvmap_primvar
    assert get_uvmap_primvar(usda.read_text()) == "primvars:UVMap"
    assert get_uvmap_primvar("nothing here") is None


def test_usd_normals_without_interpolation_metadata(tmp_path):
    """Per-vertex normals with NO authored interpolation metadata import by
    size inference instead of crashing (regression: the faceVarying default
    reshaped V normals into (F, FSz, 3))."""
    usda = tmp_path / "plainnormals.usda"
    usda.write_text('''#usda 1.0

def Mesh "plain"
{
    point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]
    int[] faceVertexCounts = [3, 3]
    int[] faceVertexIndices = [0, 1, 2, 0, 2, 3]
    normal3f[] normals = [(0, 0, 1), (0, 0, 1), (0, 0, 1), (0, 0, 1)]
    texCoord2f[] primvars:st = [(0, 0), (1, 0), (0, 1), (1, 1)]
}
''')
    m = kio.usd.import_meshes(str(usda))[0]
    assert m.vertex_normals.shape == (4, 3)            # inferred 'vertex'
    np.testing.assert_array_equal(np.asarray(m.face_uvs_idx),
                                  np.asarray(m.faces))  # uvs: V of them
    # face-varying-count normals with no metadata infer 'faceVarying'
    fv = tmp_path / "fvnormals.usda"
    fv.write_text('''#usda 1.0

def Mesh "fv"
{
    point3f[] points = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0, 1, 2]
    normal3f[] normals = [(0, 0, 1), (0, 0, 1), (0, 0, 1)]
}
''')
    m2 = kio.usd.import_meshes(str(fv))[0]
    # 3 normals == num verts == num face-vertices; vertex wins (checked 1st)
    assert m2.vertex_normals is not None or m2.face_normals is not None


def test_usd_import_mesh_scene_path_selects_prim(tmp_path):
    """import_mesh(scene_path=...) must return THAT prim, not the first
    mesh in the stage (regression: the path was ignored), and
    import_meshes(scene_paths=...) must filter AND order by the list."""
    import numpy as np
    import jax.numpy as jnp
    from kaolin_tpu.io import usd

    tri = np.asarray([[0, 1, 2]], np.int32)
    va = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    vb = va + 5.0
    path = str(tmp_path / "two.usda")
    stage = usd.create_stage(path)
    usd.add_mesh(stage, "/World/A", vertices=va, faces=tri)
    usd.add_mesh(stage, "/World/B", vertices=vb, faces=tri)
    stage.save()

    b = usd.import_mesh(path, scene_path="/World/B")
    np.testing.assert_allclose(np.asarray(b.vertices), vb, atol=1e-5)
    a = usd.import_mesh(path, scene_path="/World/A")
    np.testing.assert_allclose(np.asarray(a.vertices), va, atol=1e-5)

    ordered = usd.import_meshes(path, scene_paths=["/World/B", "/World/A"])
    np.testing.assert_allclose(np.asarray(ordered[0].vertices), vb,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ordered[1].vertices), va,
                               atol=1e-5)

    try:
        usd.import_mesh(path, scene_path="/World/Nope")
        raise AssertionError("missing prim must raise")
    except ValueError:
        pass
