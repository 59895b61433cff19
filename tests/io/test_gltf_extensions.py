"""glTF PBR extensions (VERDICT r2 #7).

KHR_materials_transmission: port of reference
``tests/python/kaolin/io/test_gltf.py::TestTransmittanceExtensionGLTF``
against the same modified sample asset. KHR_materials_pbrSpecularGlossiness:
semantic checks on a synthesized asset (no sample ships with the extension),
mirroring reference ``kaolin/io/gltf.py:134-156``.
"""

import base64
import json
import os
import struct

import numpy as np
import pytest

from kaolin_tpu.io import gltf

SAMPLE_DIR = "/root/reference/tests/samples/io"


@pytest.fixture(scope="module")
def expected_transmittance_texture():
    from PIL import Image
    img = Image.open(os.path.join(SAMPLE_DIR, "textures",
                                  "transmit_test_texture14184.jpg"))
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return arr[None, :, :, 0] if arr.ndim == 2 else arr[:, :, 0][None]


def test_transmission_import(expected_transmittance_texture):
    mesh = gltf.import_mesh(os.path.join(SAMPLE_DIR,
                                         "transmission_test.gltf"))
    mats = mesh.materials
    want = expected_transmittance_texture

    assert mats[0].transmittance_value is None
    assert mats[0].transmittance_texture is None

    assert mats[1].transmittance_value is None
    np.testing.assert_allclose(np.asarray(mats[1].transmittance_texture),
                               want, atol=1e-6)

    np.testing.assert_allclose(np.asarray(mats[2].transmittance_value), 1.0)
    assert mats[2].transmittance_texture is None

    assert mats[3].transmittance_value is None
    np.testing.assert_allclose(np.asarray(mats[3].transmittance_texture),
                               want, atol=1e-6)

    np.testing.assert_allclose(np.asarray(mats[4].transmittance_value), 0.83)
    assert mats[4].transmittance_texture is None

    assert mats[5].transmittance_value is None
    np.testing.assert_allclose(np.asarray(mats[5].transmittance_texture),
                               0.5 * want, atol=1e-6)

    np.testing.assert_allclose(np.asarray(mats[6].transmittance_value), 0.0)
    assert mats[6].transmittance_texture is None


def _minimal_gltf(material, tmp_path, textures=()):
    """One-triangle gltf with the given material dict and optional PNG
    textures (written beside it)."""
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [0, 1]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    blob = verts.tobytes() + uvs.tobytes() + idx.tobytes()
    images, texs = [], []
    for i, tex in enumerate(textures):
        from PIL import Image
        p = tmp_path / f"tex{i}.png"
        Image.fromarray(tex).save(p)
        images.append({"uri": p.name})
        texs.append({"source": i})
    doc = {
        "asset": {"version": "2.0"},
        "scenes": [{"nodes": [0]}], "scene": 0,
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "TEXCOORD_0": 1},
            "indices": 2, "material": 0}]}],
        "materials": [material],
        "images": images, "textures": texs,
        "samplers": [{}] if texs else [],
        "buffers": [{"byteLength": len(blob),
                     "uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(blob).decode()}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 24},
            {"buffer": 0, "byteOffset": 60, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC2"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
    }
    path = tmp_path / "asset.gltf"
    path.write_text(json.dumps(doc))
    return str(path)


def test_specular_glossiness_factors(tmp_path):
    mat = {
        "name": "sg",
        "pbrMetallicRoughness": {"baseColorFactor": [0.1, 0.1, 0.1, 1.0]},
        "extensions": {"KHR_materials_pbrSpecularGlossiness": {
            "diffuseFactor": [0.9, 0.5, 0.25, 1.0],
            "specularFactor": [0.2, 0.4, 0.6],
            "glossinessFactor": 0.7,
        }},
    }
    mesh = gltf.import_mesh(_minimal_gltf(mat, tmp_path))
    m = mesh.materials[0]
    assert m.is_specular_workflow   # extension outranks metallic workflow
    np.testing.assert_allclose(np.asarray(m.diffuse_color),
                               [0.9, 0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.specular_color),
                               [0.2, 0.4, 0.6], atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.roughness_value), 0.3, atol=1e-6)
    assert m.metallic_value is None and m.metallic_texture is None


def test_specular_glossiness_textures(tmp_path):
    rng = np.random.RandomState(0)
    diffuse = rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
    sg = rng.randint(0, 255, (8, 8, 4), dtype=np.uint8)
    mat = {
        "name": "sgtex",
        "extensions": {"KHR_materials_pbrSpecularGlossiness": {
            "diffuseTexture": {"index": 0},
            "specularGlossinessTexture": {"index": 1},
            "specularFactor": [1.0, 1.0, 1.0],
            "glossinessFactor": 0.5,
        }},
    }
    mesh = gltf.import_mesh(_minimal_gltf(mat, tmp_path,
                                          textures=(diffuse, sg)))
    m = mesh.materials[0]
    assert m.is_specular_workflow
    np.testing.assert_allclose(np.asarray(m.diffuse_texture),
                               diffuse.transpose(2, 0, 1) / 255.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.specular_texture),
                               sg[..., :3].transpose(2, 0, 1) / 255.0,
                               atol=1e-6)
    # roughness = 1 − glossiness_alpha × factor
    np.testing.assert_allclose(
        np.asarray(m.roughness_texture),
        1.0 - (sg[..., 3:4].transpose(2, 0, 1) / 255.0) * 0.5, atol=1e-6)


def test_import_mesh_scene_selection(tmp_path):
    """``scene=`` restricts import to that scene's node graph (ref :368-392:
    scene index selects an animation-specific frame)."""
    import base64
    import json

    import numpy as np

    from kaolin_tpu.io import gltf as G

    verts0 = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    verts1 = verts0 + 10.0
    tris = np.array([0, 1, 2], np.uint16)
    b = verts0.tobytes() + verts1.tobytes() + tris.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}, {"nodes": [1]}],
        "nodes": [{"mesh": 0}, {"mesh": 1}],
        "meshes": [
            {"primitives": [{"attributes": {"POSITION": 0}, "indices": 2}]},
            {"primitives": [{"attributes": {"POSITION": 1}, "indices": 2}]}],
        "buffers": [{"uri": "data:application/octet-stream;base64,"
                     + base64.b64encode(b).decode(), "byteLength": len(b)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 36},
            {"buffer": 0, "byteOffset": 72, "byteLength": 6}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5123, "count": 3,
             "type": "SCALAR"}],
    }
    p = tmp_path / "two_scenes.gltf"
    p.write_text(json.dumps(doc))
    m0 = G.import_mesh(str(p), scene=0)
    m1 = G.import_mesh(str(p), scene=1)
    assert float(np.asarray(m0.vertices).max()) <= 1.0
    assert float(np.asarray(m1.vertices).min()) >= 10.0
    # default scene = file's "scene" entry
    mdef = G.import_mesh(str(p))
    assert float(np.asarray(mdef.vertices).max()) <= 1.0
