"""Binary USD (.usdc) EXPORT via the dependency-free crate writer
(kaolin_tpu/io/usd/crate_write.py), closing the io asymmetry with the
reference's pxr-backed binary export (ref kaolin/io/usd/mesh.py:446).

Validation is round-trip through the INDEPENDENT crate reader path
(crate.py -> crate_to_usda -> USDA parser): the writer and reader share no
serialization code, so agreement pins the on-disk format. Raw values are
captured at authoring time, so binary round-trips are bit-exact (the USDA
text path rounds to 6 significant digits)."""

import numpy as np
import pytest

from kaolin_tpu.io import usd as kusd
from kaolin_tpu.io.usd.crate import CrateFile, is_crate
from kaolin_tpu.io.usd.crate_write import _encode_ints, _fast_compress


@pytest.fixture
def mesh_data():
    rng = np.random.RandomState(0)
    return {
        "vertices": rng.rand(100, 3).astype(np.float32),
        "faces": rng.randint(0, 100, (50, 3)).astype(np.int64),
        "uvs": rng.rand(80, 2).astype(np.float32),
        "face_uvs_idx": rng.randint(0, 80, (50, 3)).astype(np.int64),
    }


def test_integer_codec_roundtrip():
    """_encode_ints is the exact inverse of crate._decode_ints, including
    the -1 -> 0xFFFFFFFF uint32 wrap used by FIELDSETS terminators."""
    from kaolin_tpu.io.usd.crate import _decode_ints, _fast_decompress
    for vals in ([], [0], [5, 5, 5], [1, 2, 3, -1, 7, 8, -1],
                 list(np.random.RandomState(1).randint(-1000, 80000, 97))):
        enc = _encode_ints(vals, 4)
        dec = _decode_ints(enc, len(vals), 4)
        np.testing.assert_array_equal(dec, np.asarray(vals, np.int64))


def test_lz4_literal_roundtrip():
    from kaolin_tpu.io.usd.crate import _fast_decompress
    for n in (0, 1, 14, 15, 16, 255 + 15, 5000):
        data = bytes(np.random.RandomState(n % 97).bytes(n))
        assert _fast_decompress(_fast_compress(data), n) == data


def test_mesh_binary_roundtrip_exact(tmp_path, mesh_data):
    path = str(tmp_path / "m.usdc")
    kusd.export_mesh(path, "/World/mesh", **mesh_data)
    with open(path, "rb") as f:
        assert is_crate(f.read(8))
    m = kusd.import_mesh(path)
    np.testing.assert_array_equal(np.asarray(m.vertices),
                                  mesh_data["vertices"])
    np.testing.assert_array_equal(np.asarray(m.faces), mesh_data["faces"])
    np.testing.assert_array_equal(np.asarray(m.uvs), mesh_data["uvs"])


def test_usd_extension_is_binary_usda_is_text(tmp_path, mesh_data):
    p_usd = str(tmp_path / "m.usd")
    p_usda = str(tmp_path / "m.usda")
    kusd.export_mesh(p_usd, "/World/mesh", vertices=mesh_data["vertices"],
                     faces=mesh_data["faces"])
    kusd.export_mesh(p_usda, "/World/mesh", vertices=mesh_data["vertices"],
                     faces=mesh_data["faces"])
    with open(p_usd, "rb") as f:
        assert is_crate(f.read(8))
    with open(p_usda, "rb") as f:
        assert f.read(8).startswith(b"#usda")
    a = kusd.import_mesh(p_usd)
    b = kusd.import_mesh(p_usda)
    # binary is exact; text is %g-rounded — compare at text tolerance
    np.testing.assert_array_equal(np.asarray(a.vertices),
                                  mesh_data["vertices"])
    np.testing.assert_allclose(np.asarray(a.vertices),
                               np.asarray(b.vertices), atol=1e-5)


def test_timesamples_binary_roundtrip(tmp_path, mesh_data):
    path = str(tmp_path / "anim.usd")
    v = mesh_data["vertices"]
    stage = kusd.create_stage(path)
    stage.add_mesh("/W/a", vertices=v, faces=mesh_data["faces"], time=0)
    stage.add_mesh("/W/a", vertices=v * 2, time=7)
    stage.save()
    np.testing.assert_array_equal(
        np.asarray(kusd.import_mesh(path, time=0).vertices), v)
    np.testing.assert_array_equal(
        np.asarray(kusd.import_mesh(path, time=7).vertices), v * 2)
    assert kusd.get_authored_time_samples(path) == [0.0, 7.0]


def test_gaussians_binary_roundtrip_exact(tmp_path):
    rng = np.random.RandomState(3)
    pos = rng.rand(20, 3).astype(np.float32)
    orient = rng.rand(20, 4).astype(np.float32)
    sc = rng.rand(20, 3).astype(np.float32)
    op = rng.rand(20).astype(np.float32)
    sh = rng.rand(20, 4, 3).astype(np.float32)
    path = str(tmp_path / "g.usdc")
    kusd.export_gaussiancloud(path, pos, orient, sc, op, sh)
    g = kusd.import_gaussiancloud(path)
    np.testing.assert_array_equal(np.asarray(g.positions), pos)
    np.testing.assert_array_equal(np.asarray(g.orientations), orient)
    np.testing.assert_array_equal(np.asarray(g.scales), sc)
    np.testing.assert_array_equal(np.asarray(g.opacities), op)
    np.testing.assert_array_equal(np.asarray(g.sh_coeff), sh)


def test_physics_material_binary_roundtrip(tmp_path):
    from kaolin_tpu.physics.simplicits import PhysicsPoints
    rng = np.random.RandomState(5)
    pts = rng.rand(40, 3).astype(np.float32)
    phys = PhysicsPoints(pts=pts, yms=1e4, prs=0.45, rhos=500.0,
                         appx_vol=1.0)
    path = str(tmp_path / "phys.usdc")
    stage = kusd.create_stage(path)
    kusd.add_physics_material(stage, "/World/obj", phys)
    stage.save()
    got = kusd.get_physics_material(path, "/World/obj")
    np.testing.assert_array_equal(np.asarray(got.pts), pts)
    np.testing.assert_allclose(np.asarray(got.yms).reshape(-1)[0], 1e4)


def test_writer_file_parses_with_crate_reader(tmp_path, mesh_data):
    """Structural check: sections, version, paths, spec types."""
    path = str(tmp_path / "m.usdc")
    kusd.export_mesh(path, "/World/mesh", vertices=mesh_data["vertices"],
                     faces=mesh_data["faces"])
    c = CrateFile(path)
    assert c.version == (0, 8, 0)
    for sec in ("TOKENS", "STRINGS", "FIELDS", "FIELDSETS", "PATHS",
                "SPECS"):
        assert sec in c.sections
    assert "/World/mesh" in c.paths
    assert "/World/mesh.points" in c.paths
    types = {p: t for p, t, _ in c.specs}
    assert types["/World/mesh"] == 6       # prim
    assert types["/World/mesh.points"] == 1  # attribute
    assert types["/"] == 7                 # pseudo-root
