"""Round trips for gaussian-cloud / physics-material / synthetic-view IO.

Reference parity: kaolin/io/gaussians.py:20, io/ply.py:31,143,
io/usd/gaussians.py:83-290, io/usd/physics_materials.py:35,102,173,247,
io/render.py:26.
"""

import json
import os

import numpy as np
import pytest

from kaolin_tpu.io import import_gaussiancloud, import_synthetic_view, ply, usd


@pytest.fixture
def gs_data():
    rng = np.random.RandomState(0)
    n = 50
    pos = rng.randn(n, 3).astype(np.float32)
    ori = rng.randn(n, 4).astype(np.float32)
    ori /= np.linalg.norm(ori, axis=1, keepdims=True)
    scales = np.abs(rng.rand(n, 3)).astype(np.float32) * 0.1 + 0.01
    opac = rng.rand(n).astype(np.float32) * 0.9 + 0.05
    sh = rng.randn(n, 4, 3).astype(np.float32)
    return pos, ori, scales, opac, sh


def test_ply_gaussiancloud_round_trip(tmp_path, gs_data):
    pos, ori, scales, opac, sh = gs_data
    p = str(tmp_path / "gs.ply")
    ply.export_gaussiancloud(p, pos, ori, scales, opac, sh)
    model = import_gaussiancloud(p)
    np.testing.assert_allclose(np.asarray(model.positions), pos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(model.opacities), opac, atol=1e-4)
    np.testing.assert_allclose(np.asarray(model.scales), scales, rtol=1e-4)
    sgn = np.sign(np.asarray(model.orientations)[:, :1] * ori[:, :1])
    np.testing.assert_allclose(np.asarray(model.orientations) * sgn,
                               ori * sgn, atol=1e-4)
    np.testing.assert_allclose(np.asarray(model.sh_coeff), sh, atol=1e-5)
    with pytest.raises(RuntimeError):
        ply.export_gaussiancloud(p, pos, ori, scales, opac, sh)


def test_usd_gaussiancloud_round_trip(tmp_path, gs_data):
    pos, ori, scales, opac, sh = gs_data
    u = str(tmp_path / "gs.usda")
    usd.export_gaussiancloud(u, pos, ori, scales, opac, sh)
    model = import_gaussiancloud(u)
    np.testing.assert_allclose(np.asarray(model.positions), pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(model.orientations), ori, atol=1e-4)
    np.testing.assert_allclose(np.asarray(model.scales), scales, atol=1e-4)
    np.testing.assert_allclose(np.asarray(model.opacities), opac, atol=1e-4)
    np.testing.assert_allclose(np.asarray(model.sh_coeff), sh, atol=1e-4)


def test_usd_physics_material_round_trip(tmp_path, gs_data):
    from kaolin_tpu.physics.simplicits import (PhysicsPoints,
                                               SkinnedPhysicsPoints)
    pos = gs_data[0]
    n = pos.shape[0]
    rng = np.random.RandomState(1)
    f = str(tmp_path / "phys.usda")
    stage = usd.create_stage(f)
    pp = PhysicsPoints(pts=pos, yms=1e4, prs=0.45, rhos=500.0, appx_vol=0.75)
    usd.add_physics_material(stage, "/World/obj", pp)
    sw = rng.rand(n, 5).astype(np.float32)
    dw = rng.randn(n, 5, 3).astype(np.float32)
    spp = SkinnedPhysicsPoints(pts=pos, yms=1e4, prs=0.45, rhos=500.0,
                               appx_vol=0.75, skinning_weights=sw, dwdx=dw)
    usd.add_skinned_physics(stage, "/World/obj2", spp)
    stage.save()

    pp2 = usd.get_physics_material(f)
    np.testing.assert_allclose(np.asarray(pp2.pts), pos, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pp2.yms), 1e4, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pp2.prs), 0.45, rtol=1e-5)
    assert abs(pp2.appx_vol - 0.75) < 1e-6
    spp2 = usd.get_skinned_physics(f)
    np.testing.assert_allclose(np.asarray(spp2.skinning_weights), sw,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(spp2.dwdx), dw, atol=1e-4)


def test_import_synthetic_view(tmp_path):
    from PIL import Image
    rng = np.random.RandomState(2)
    d = str(tmp_path)
    Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(
        os.path.join(d, "0_rgb.png"))
    np.save(os.path.join(d, "0_depth_linear.npy"),
            rng.rand(8, 8).astype(np.float32))
    meta = {"asset_transforms": [[0, np.eye(4).tolist()]],
            "camera_properties": {
                "tf_mat": np.eye(4).tolist(),
                "resolution": {"width": 8, "height": 8},
                "focal_length": 24.0, "horizontal_aperture": 20.955,
                "clipping_range": [0.01, 10000.0]}}
    with open(os.path.join(d, "0_metadata.json"), "w") as fh:
        json.dump(meta, fh)
    out = import_synthetic_view(d, 0, rgb=True, depth_linear=True,
                                bbox_2d_tight=False)
    assert out["rgb"].shape == (8, 8, 3)
    assert out["depth_linear"].shape == (8, 8)
    assert out["metadata"]["cam_proj"].shape == (3, 1)
    assert out["metadata"]["clipping_range"] == [0.01, 10000.0]


def test_usd_preview_surface_round_trip(tmp_path):
    import jax.numpy as jnp
    from kaolin_tpu.io.utils import TextureExporter
    from kaolin_tpu.render.materials import PBRMaterial
    rng = np.random.RandomState(0)
    mat = PBRMaterial(
        material_name="m", diffuse_color=(0.8, 0.2, 0.1),
        roughness_value=0.4, metallic_value=0.9,
        diffuse_texture=jnp.asarray(rng.rand(4, 4, 3).astype(np.float32)))
    f = str(tmp_path / "mat.usda")
    stage = usd.create_stage(f)
    usd.write_usd_preview_surface(mat, stage, "/World/Looks/m",
                                  TextureExporter(str(tmp_path)))
    stage.save()
    back = usd.read_usd_preview_surface(f, texture_root=str(tmp_path))
    np.testing.assert_allclose(np.asarray(back.diffuse_color),
                               [0.8, 0.2, 0.1], atol=1e-5)
    assert abs(back.roughness_value - 0.4) < 1e-6
    assert abs(back.metallic_value - 0.9) < 1e-6
    assert back.diffuse_texture.shape == (4, 4, 3)


def test_usd_plurals_and_queries(tmp_path):
    pcs = [np.random.RandomState(i).rand(10, 3).astype(np.float32)
           for i in range(3)]
    f = str(tmp_path / "pc.usda")
    usd.export_pointclouds(f, pcs)
    back = usd.import_pointclouds(f)
    assert len(back) == 3
    np.testing.assert_allclose(np.asarray(back[1].points), pcs[1], atol=1e-4)
    assert len(usd.get_pointcloud_scene_paths(f)) == 3

    vg = np.zeros((8, 8, 8), bool)
    vg[2:5, 3:6, 1:4] = True
    f2 = str(tmp_path / "vg.usda")
    usd.export_voxelgrids(f2, [vg, vg])
    back_vgs = usd.import_voxelgrids(f2)
    assert len(back_vgs) == 2
    assert np.array_equal(np.asarray(back_vgs[0]), vg)


def test_usd_geom_subsets_round_trip(tmp_path):
    import jax.numpy as jnp
    f = str(tmp_path / "subset.usda")
    v = np.random.RandomState(0).rand(6, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [2, 3, 4], [3, 4, 5], [1, 2, 3]], np.int32)
    stage = usd.create_stage(f)
    usd.add_mesh(stage, "/World/mesh", v, faces)
    usd.add_subset(stage, "/World/mesh", "part_a", np.array([0, 2]),
                   family_name="part")
    usd.add_subset(stage, "/World/mesh", "mat_x", np.array([1, 3]),
                   family_name="materialBind")
    stage.save()

    # the mesh still imports (subsets nested inside its block)
    mesh = usd.import_mesh(f)
    assert np.asarray(mesh.vertices).shape == (6, 3)
    assert np.asarray(mesh.faces).shape == (4, 3)

    subsets = usd.import_subsets(f, "/World/mesh")
    assert np.asarray(subsets["part_a"]["indices"]).tolist() == [0, 2]
    assert np.asarray(subsets["mat_x"]["indices"]).tolist() == [1, 3]
    assert {k: v["family_name"] for k, v in subsets.items()} == {
        "part_a": "part", "mat_x": "materialBind"}
    only_mat = usd.import_subsets(f, "/World/mesh",
                                  family_name="materialBind")
    assert list(only_mat) == ["mat_x"]

    # scene paths reflect the hierarchy
    assert usd.get_mesh_scene_paths(f) == ["/World/mesh"]
    assert "/World/mesh/part_a" in usd.get_scene_paths(
        f, prim_types="GeomSubset")
