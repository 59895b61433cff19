"""Tutorial: authoring and reading multi-object USD scenes.

TPU-native analog of the reference's ``examples/tutorial/usd_kitchenset.py``:
author a USD stage holding several meshes, a pointcloud, and a voxelgrid
under distinct scene paths, enumerate the stage with ``get_scene_paths``,
re-import every mesh, and round-trip the same scene through the binary
``.usdc`` Crate writer — all with the dependency-free USD backend
(``kaolin_tpu/io/usd``; no ``pxr`` required).

Run: python examples/tutorial_usd_scene.py   (CPU or TPU)
"""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.io import usd
from kaolin_tpu.ops.mesh import sample_points

from tutorial_camera_rasterization import make_icosphere


def _box(center, half):
    c = np.asarray(center, np.float32)
    v = np.asarray([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                    for z in (-1, 1)], np.float32) * half + c
    f = np.asarray([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                    [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                    [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]], np.int32)
    return v, f


def main(smoke=False):
    import jax
    sphere_v, sphere_f = make_icosphere(1 if smoke else 2)
    table_v, table_f = _box([0.0, -0.6, 0.0], 0.5)
    cup_v, cup_f = _box([0.3, -0.05, 0.1], 0.08)
    meshes = {
        "/World/Sphere": (np.asarray(sphere_v), np.asarray(sphere_f)),
        "/World/Table": (table_v, table_f),
        "/World/Cup": (cup_v, cup_f),
    }
    pts, _ = sample_points(jnp.asarray(sphere_v)[None],
                           jnp.asarray(sphere_f), 128 if smoke else 1024,
                           key=jax.random.PRNGKey(0))
    vox = np.zeros((8, 8, 8), bool)
    vox[2:6, 2:6, 2:6] = True

    with tempfile.TemporaryDirectory() as d:
        for ext in (("usda",) if smoke else ("usda", "usdc")):
            path = os.path.join(d, f"kitchen.{ext}")
            # one stage, many prims
            stage = usd.create_stage(path)
            for scene_path, (v, f) in meshes.items():
                usd.add_mesh(stage, scene_path, vertices=v, faces=f)
            usd.add_pointcloud(stage, "/World/Crumbs",
                               np.asarray(pts[0]))
            usd.add_voxelgrid(stage, "/World/IceBlock", vox)
            stage.save()

            # enumerate prims by type
            mesh_paths = usd.get_scene_paths(path, prim_types=["Mesh"])
            assert set(mesh_paths) >= set(meshes), mesh_paths

            # bulk re-import and per-path spot checks
            back = usd.import_meshes(path)
            assert len(back) >= len(meshes)
            one = usd.import_mesh(path, scene_path="/World/Cup")
            np.testing.assert_allclose(np.asarray(one.vertices), cup_v,
                                       atol=1e-5)
            sph = usd.import_mesh(path, scene_path="/World/Sphere")
            assert sph.faces.shape[0] == sphere_f.shape[0]
        print("usd_scene:", {"prims": len(mesh_paths) + 2,
                             "formats": "usda" if smoke else "usda+usdc"})


if __name__ == "__main__":
    main()
