"""Tutorial: SurfaceMesh + one-call rendering (easy_render).

TPU-native port of the reference notebooks
``examples/tutorial/working_with_meshes.ipynb`` and
``easy_mesh_render.ipynb``: wrap raw arrays in a
:class:`~kaolin_tpu.rep.SurfaceMesh` (auto-computing normals on access),
attach a PBR material, and render all passes with one
:func:`~kaolin_tpu.render.easy_render.render_mesh` call under default
camera + SG lighting.

Run: python examples/tutorial_easy_mesh_render.py   (CPU or TPU)
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.render.easy_render import (default_camera, default_lighting,
                                           default_material, render_mesh)
from kaolin_tpu.rep import SurfaceMesh

from tutorial_camera_rasterization import make_icosphere


def main(smoke=False):
    res = 48 if smoke else 256
    vertices, faces = make_icosphere(1 if smoke else 2)

    # --- SurfaceMesh: batching + attribute auto-compute -------------------
    mesh = SurfaceMesh(vertices=vertices, faces=faces)
    print(mesh)                              # summary like the notebook
    assert mesh.vertices.shape[0] == vertices.shape[0]

    # accessing face_normals triggers auto-compute from vertices+faces
    # (per-face-per-vertex (F, 3, 3), the reference convention)
    fn = mesh.face_normals
    assert fn.shape == (faces.shape[0], 3, 3)
    print("auto-computed face_normals:", fn.shape)
    # vertex normals are area-averaged from face normals
    vn = mesh.vertex_normals
    assert vn.shape == vertices.shape

    # uvs for texture mapping: spherical projection (notebook builds its own)
    u = 0.5 + jnp.arctan2(vertices[:, 2], vertices[:, 0]) / (2 * np.pi)
    v = 0.5 - jnp.arcsin(jnp.clip(vertices[:, 1], -1, 1)) / np.pi
    mesh.uvs = jnp.stack([u, v], axis=1)
    mesh.face_uvs_idx = faces

    # attach a default PBR material (diffuse color) to every face
    mesh.materials = [default_material(jnp.asarray([0.8, 0.3, 0.2]))]
    mesh.material_assignments = jnp.zeros((faces.shape[0],), jnp.int16)

    # --- one-call render ---------------------------------------------------
    camera = default_camera(res)
    passes = render_mesh(camera, mesh, lighting=default_lighting())
    img = passes["render"]
    face_idx = passes["face_idx"]
    covered = int(jnp.sum(face_idx >= 0))
    print(f"render passes: {sorted(passes.keys())}")
    print(f"covered pixels: {covered}/{res * res}, "
          f"mean lit value {float(jnp.mean(img)):.4f}")
    assert covered > res * res * 0.05
    assert np.isfinite(np.asarray(img)).all()
    assert float(jnp.max(img)) > 0

    # the albedo pass carries the material color on covered pixels
    albedo = passes["albedo"]
    lit = np.asarray(albedo.reshape(-1, 3)[np.asarray(face_idx).reshape(-1)
                                           >= 0])
    np.testing.assert_allclose(lit.max(0), [0.8, 0.3, 0.2], atol=0.05)
    print("done")
    return np.asarray(img)


if __name__ == "__main__":
    main()
