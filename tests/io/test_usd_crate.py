"""USD Crate (.usdc) and USDZ reading via the dependency-free Crate reader
(kaolin_tpu/io/usd/crate.py; format per pxr crateFile.cpp, versions 0.7/0.8).

Parity targets: the reference's own sample assets, which ship both binary
and obj/text twins (ref tests/python/kaolin/io/usd/test_mesh.py:840-851
expected mesh counts: fox 1, armchair 3, amsterdam 18)."""

import numpy as np
import pytest

from kaolin_tpu.io import usd as kusd
from kaolin_tpu.io.obj import import_mesh as obj_import

IO = "/root/reference/tests/samples/io"
SAMPLES = "/root/reference/tests/samples"


def test_fox_usdc_matches_obj_twin():
    """fox.usdc geometry must be bit-identical to fox.obj (the reference
    ships both conversions of the same asset)."""
    m_usd = kusd.import_meshes(f"{IO}/fox.usdc")
    assert len(m_usd) == 1
    m_usd = m_usd[0]
    m_obj = obj_import(f"{IO}/fox.obj")
    np.testing.assert_array_equal(np.asarray(m_usd.vertices),
                                  np.asarray(m_obj.vertices))
    np.testing.assert_array_equal(np.asarray(m_usd.faces),
                                  np.asarray(m_obj.faces))
    assert m_usd.uvs is not None and m_usd.face_uvs_idx is not None


def test_mixed_usdc_heterogeneous_triangulation():
    """mixed.usdc (crate 0.8) holds a quad+tri rocket and a quad sphere;
    import triangulates per the heterogeneous handler."""
    meshes = kusd.import_meshes(f"{SAMPLES}/mixed.usdc")
    assert len(meshes) == 2
    for m in meshes:
        f = np.asarray(m.faces)
        assert f.shape[1] == 3
        assert np.asarray(m.vertices).shape[0] > 100


@pytest.mark.parametrize("fname,count", [
    ("armchair.usdc", 3), ("fox.usdc", 1),
    ("amsterdam.usdz", 18), ("fox.usdz", 1), ("ico_flat.usdz", 1),
])
def test_mesh_counts_match_reference(fname, count):
    meshes = kusd.import_meshes(f"{IO}/{fname}")
    assert len(meshes) == count, fname
    for m in meshes:
        v = np.asarray(m.vertices)
        assert v.ndim == 2 and v.shape[1] == 3 and np.isfinite(v).all()


def test_usdz_matches_usdc():
    """The usdz container wraps the same usdc layer — identical geometry."""
    a = kusd.import_meshes(f"{IO}/fox.usdc")[0]
    b = kusd.import_meshes(f"{IO}/fox.usdz")[0]
    np.testing.assert_array_equal(np.asarray(a.vertices),
                                  np.asarray(b.vertices))
    np.testing.assert_array_equal(np.asarray(a.faces), np.asarray(b.faces))


def test_crate_scene_paths_and_pointcloud_api():
    paths = kusd.get_mesh_scene_paths(f"{IO}/armchair.usdc")
    assert len(paths) == 3
    assert all(p.startswith("/") for p in paths)


def test_crate_version_and_sections():
    from kaolin_tpu.io.usd.crate import CrateFile
    c = CrateFile(f"{SAMPLES}/mixed.usdc")
    assert c.version[:2] in ((0, 7), (0, 8))
    for sec in ("TOKENS", "STRINGS", "FIELDS", "FIELDSETS", "PATHS",
                "SPECS"):
        assert sec in c.sections
    assert len(c.tokens) > 10
    assert "/" in c.paths


def test_crate_material_read():
    """UsdPreviewSurface materials inside a crate file parse to PBRMaterial
    (the UsdUVTexture shader prim in the same Material must be skipped)."""
    import numpy as np
    from kaolin_tpu.io.usd.core import read_usd_preview_surface
    m = read_usd_preview_surface(f"{SAMPLES}/mixed.usdc", None)
    np.testing.assert_allclose(float(np.asarray(m.roughness_value)),
                               0.6932139992713928, rtol=1e-5)
    np.testing.assert_allclose(float(np.asarray(m.metallic_value)), 0.0)


# ---------------------------------------------------------------------------
# timeSamples in binary crate files (pxr-written Timelapse checkpoints)
# Ref: kaolin/io/usd/mesh.py:356 (time= params); reference Timelapse tests
# parse these same pxr-written binary sample dirs.

TL = "/root/reference/tests/samples/timelapse/notexture"


def test_crate_authored_time_samples():
    """Authored timeSample keys of a pxr-written binary checkpoint."""
    from kaolin_tpu.io.usd.core import get_authored_time_samples
    ts = get_authored_time_samples(f"{TL}/output/mesh_0.usd")
    assert ts == [float(t) for t in range(0, 101, 10)]


def test_crate_time_varying_mesh_import():
    """Animated vertices materialize per-time; faces are static defaults."""
    ts = [0.0, 100.0]
    meshes = [kusd.import_mesh(f"{TL}/output/mesh_0.usd", time=t)
              for t in ts]
    v0, v1 = (np.asarray(m.vertices) for m in meshes)
    assert v0.shape == v1.shape and v0.shape[1] == 3
    assert not np.array_equal(v0, v1)
    np.testing.assert_array_equal(np.asarray(meshes[0].faces),
                                  np.asarray(meshes[1].faces))


def test_crate_time_varying_pointcloud_import():
    path, = kusd.get_pointcloud_scene_paths(f"{TL}/output/pointcloud_0.usd")
    pts0 = kusd.import_pointcloud(f"{TL}/output/pointcloud_0.usd",
                                  path, time=0)
    pts1 = kusd.import_pointcloud(f"{TL}/output/pointcloud_0.usd",
                                  path, time=100)
    p0, p1 = np.asarray(pts0.points), np.asarray(pts1.points)
    assert p0.shape == p1.shape
    assert not np.array_equal(p0, p1)


def test_timelapse_parser_on_binary_checkpoints():
    """TimelapseParser must read pxr-written binary checkpoint dirs like
    text ones (frame discovery via crate timeSamples)."""
    from kaolin_tpu.visualize import TimelapseParser
    parser = TimelapseParser(TL)
    cats = {c for (c, _) in parser.keys()} if hasattr(parser, "keys") else \
        set(parser.dir_info.keys())
    assert {"mesh", "pointcloud", "voxelgrid"} <= cats
