"""USD round-trip tests for the non-mesh prim families, mirroring the
reference's coverage (reference tests/python/kaolin/io/usd/test_pointcloud.py,
test_voxelgrid.py, test_gaussians.py, test_physics_materials.py, and the
subset/transform helpers in test_mesh.py): pointclouds (+colors, time
samples, multi-cloud files), voxelgrids, gaussian clouds, physics materials,
skinned physics, geom subsets, and local-to-world transforms — all through
the dependency-free text-USDA writer/parser.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.io import usd


@pytest.fixture
def pts():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(50, 3).astype(np.float32))


class TestPointcloud:
    def test_roundtrip_with_colors(self, tmp_path, pts):
        path = str(tmp_path / "pc.usda")
        colors = jnp.asarray(
            np.random.RandomState(1).rand(50, 3).astype(np.float32))
        usd.export_pointcloud(path, pts, colors=colors)
        out = usd.import_pointcloud(path)
        back_pts, back_colors = out.points, out.colors
        assert out.normals is None and out.transform is None
        np.testing.assert_allclose(np.asarray(back_pts), np.asarray(pts),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(back_colors),
                                   np.asarray(colors), atol=1e-5)

    def test_multiple_clouds(self, tmp_path, pts):
        path = str(tmp_path / "pcs.usda")
        usd.export_pointclouds(path, [pts, pts * 2.0],
                               scene_paths=["/World/a", "/World/b"])
        paths = usd.get_pointcloud_scene_paths(path)
        assert set(paths) == {"/World/a", "/World/b"}
        clouds = usd.import_pointclouds(path)
        got = sorted(float(jnp.abs(c.points).sum()) for c in clouds)
        expect = sorted([float(jnp.abs(pts).sum()),
                         float(jnp.abs(pts * 2).sum())])
        np.testing.assert_allclose(got, expect, rtol=1e-4)

    def test_time_samples_and_bracketing(self, tmp_path, pts):
        path = str(tmp_path / "anim.usda")
        stage = usd.create_stage(path)
        usd.add_pointcloud(stage, "/World/pc", pts, time=0)
        usd.add_pointcloud(stage, "/World/pc", pts + 1.0, time=10)
        stage.save()
        times = usd.get_authored_time_samples(path)
        assert 0 in times and 10 in times
        lo, hi = usd.get_pointcloud_bracketing_time_samples(
            path, "/World/pc", 5)
        assert (lo, hi) == (0, 10)
        later = usd.import_pointcloud(path, time=10).points
        np.testing.assert_allclose(np.asarray(later), np.asarray(pts) + 1.0,
                                   atol=1e-5)

    def test_import_by_scene_path(self, tmp_path, pts):
        path = str(tmp_path / "two.usda")
        usd.export_pointclouds(path, [pts, pts * 3.0],
                               scene_paths=["/World/x", "/World/y"])
        cloud = usd.import_pointcloud(path, scene_path="/World/y").points
        np.testing.assert_allclose(np.asarray(cloud), np.asarray(pts) * 3.0,
                                   atol=1e-4)


class TestVoxelgrid:
    def test_roundtrip(self, tmp_path):
        vg = np.zeros((8, 8, 8), bool)
        vg[2:5, 3:6, 1:7] = True
        path = str(tmp_path / "vg.usda")
        usd.export_voxelgrid(path, jnp.asarray(vg))
        back = usd.import_voxelgrid(path)
        np.testing.assert_array_equal(np.asarray(back).astype(bool), vg)

    def test_multiple_grids(self, tmp_path):
        a = np.zeros((4, 4, 4), bool)
        a[0, 0, 0] = True
        b = np.zeros((4, 4, 4), bool)
        b[3, 3, 3] = True
        path = str(tmp_path / "vgs.usda")
        usd.export_voxelgrids(path, [jnp.asarray(a), jnp.asarray(b)])
        grids = usd.import_voxelgrids(path)
        assert len(grids) == 2
        got = {tuple(np.argwhere(np.asarray(g).astype(bool))[0]) for g in grids}
        assert got == {(0, 0, 0), (3, 3, 3)}


class TestGaussians:
    def test_roundtrip(self, tmp_path):
        rng = np.random.RandomState(2)
        n = 20
        positions = jnp.asarray(rng.randn(n, 3).astype(np.float32))
        orientations = jnp.asarray(rng.randn(n, 4).astype(np.float32))
        orientations = orientations / jnp.linalg.norm(orientations, axis=1,
                                                      keepdims=True)
        scales = jnp.asarray(rng.rand(n, 3).astype(np.float32))
        opacities = jnp.asarray(rng.rand(n).astype(np.float32))
        path = str(tmp_path / "gs.usda")
        usd.export_gaussiancloud(path, positions, orientations, scales,
                                 opacities)
        assert usd.get_gaussiancloud_scene_paths(path)
        out = usd.import_gaussiancloud(path)
        np.testing.assert_allclose(np.asarray(out.positions),
                                   np.asarray(positions), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.scales),
                                   np.asarray(scales), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.opacities).reshape(-1),
                                   np.asarray(opacities), atol=1e-5)
        # __getitem__ is boolean-mask selection (ref rep/gaussians.py:400-414)
        # -- string keys must raise like the reference, not crash inside jnp
        with pytest.raises(TypeError):
            out["positions"]
        keep = np.zeros(n, bool)
        keep[:5] = True
        sub = out[keep]
        assert len(sub) == 5
        np.testing.assert_allclose(np.asarray(sub.positions),
                                   np.asarray(out.positions)[:5], atol=0)


class TestPhysicsMaterials:
    def test_material_roundtrip(self, tmp_path, pts):
        from kaolin_tpu.physics.simplicits.training import PhysicsPoints
        phys = PhysicsPoints(pts, yms=2e4, prs=0.4, rhos=750.0, appx_vol=1.5)
        path = str(tmp_path / "phys.usda")
        stage = usd.create_stage(path)
        usd.add_pointcloud(stage, "/World/obj", pts)
        usd.add_physics_material(stage, "/World/obj", phys,
                                 material_name="rubber")
        stage.save()
        names = usd.get_physics_materials_instance_names(path, "/World/obj")
        assert "rubber" in names
        back = usd.get_physics_material(path, "/World/obj",
                                        material_name="rubber")
        np.testing.assert_allclose(np.asarray(back.yms), 2e4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(back.prs), 0.4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(back.rhos), 750.0, rtol=1e-5)

    def test_skinned_physics_roundtrip(self, tmp_path, pts):
        from kaolin_tpu.physics.simplicits.training import (
            PhysicsPoints, SimplicitsObject)
        phys = PhysicsPoints(pts, yms=1e4, prs=0.45, rhos=500.0, appx_vol=1.0)
        obj = SimplicitsObject.create_from_function(
            phys, lambda x: x[:, :2] ** 2)
        baked = obj.bake(num_qps=16)
        path = str(tmp_path / "skinned.usda")
        stage = usd.create_stage(path)
        usd.add_pointcloud(stage, "/World/obj", pts)
        usd.add_skinned_physics(stage, "/World/obj", baked,
                                instance_name="bake0")
        stage.save()
        assert "bake0" in usd.get_skinned_physics_instance_names(
            path, "/World/obj")
        back = usd.get_skinned_physics(path, "/World/obj",
                                       instance_name="bake0")
        np.testing.assert_allclose(np.asarray(back.skinning_weights),
                                   np.asarray(baked.skinning_weights),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(back.dwdx),
                                   np.asarray(baked.dwdx), atol=1e-5)


class TestSubsetsAndTransforms:
    def test_geom_subsets(self, tmp_path):
        verts = jnp.asarray([[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                             [0., 0., 1.]])
        faces = jnp.asarray([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]],
                            dtype=jnp.int32)
        path = str(tmp_path / "subset.usda")
        stage = usd.create_stage(path)
        usd.add_mesh(stage, "/World/tet", vertices=verts, faces=faces)
        usd.add_subset(stage, "/World/tet", "top", jnp.asarray([0, 2]))
        usd.add_subset(stage, "/World/tet", "bottom", jnp.asarray([1, 3]))
        stage.save()
        subsets = usd.import_subsets(path, "/World/tet")
        assert set(subsets) == {"top", "bottom"}
        np.testing.assert_array_equal(
            np.asarray(subsets["top"]["indices"]), [0, 2])
        np.testing.assert_array_equal(
            np.asarray(subsets["bottom"]["indices"]), [1, 3])
        assert subsets["top"]["family_name"] == "part"

    def test_local_to_world_transform(self, tmp_path, pts):
        path = str(tmp_path / "xform.usda")
        stage = usd.create_stage(path)
        usd.add_pointcloud(stage, "/World/pc", pts)
        xf = np.eye(4)
        xf[:3, 3] = [1.0, 2.0, 3.0]
        usd.set_local_to_world_transform(stage, "/World/pc",
                                         jnp.asarray(xf, jnp.float32))
        stage.save()
        back = usd.get_local_to_world_transform(path, "/World/pc")
        np.testing.assert_allclose(np.asarray(back).reshape(4, 4), xf,
                                   atol=1e-5)
