"""Tutorial: working with meshes (`SurfaceMesh`).

TPU-native port of the reference notebook
``examples/tutorial/working_with_meshes.ipynb``: import a mesh, tour the
``SurfaceMesh`` attribute system (lazy auto-compute, batching modes,
``cat``), run common ops (surface sampling, subdivision, normals), and
export the result.

Run: python examples/tutorial_working_with_meshes.py   (CPU or TPU)
"""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from kaolin_tpu.io import obj
from kaolin_tpu.ops.mesh import (sample_points, subdivide_trianglemesh)
from kaolin_tpu.rep import SurfaceMesh

from tutorial_camera_rasterization import make_icosphere


def main(smoke=False):
    vertices, faces = make_icosphere(1 if smoke else 2)

    # 1. construct a SurfaceMesh and let the lazy attribute graph work:
    # face_vertices / face_normals / vertex_normals are computed (and
    # cached) on first access
    mesh = SurfaceMesh(vertices=jnp.asarray(vertices),
                       faces=jnp.asarray(faces))
    assert mesh.batching == SurfaceMesh.Batching.NONE
    assert not mesh.has_attribute("face_normals")
    fn = mesh.face_normals
    assert fn.shape == (faces.shape[0], 3, 3) or fn.shape == (
        faces.shape[0], 3), fn.shape
    vn = mesh.vertex_normals
    assert vn.shape == (vertices.shape[0], 3)
    # unit sphere: vertex normals point along vertices
    cos = np.asarray(jnp.sum(vn * mesh.vertices, axis=-1)
                     / jnp.linalg.norm(mesh.vertices, axis=-1)
                     / jnp.clip(jnp.linalg.norm(vn, axis=-1), 1e-6))
    assert (cos > 0.9).all(), "sphere vertex normals must be radial"

    # 2. batching: FIXED stacks same-topology meshes; cat() builds it
    batched = SurfaceMesh.cat([mesh, mesh], fixed_topology=True)
    assert batched.batching == SurfaceMesh.Batching.FIXED
    assert batched.vertices.shape == (2,) + tuple(mesh.vertices.shape)

    # 3. ops: area-weighted surface sampling and loop subdivision
    pts, _ = sample_points(mesh.vertices[None], mesh.faces,
                           256 if smoke else 4096,
                           key=jax.random.PRNGKey(0))
    r = np.asarray(jnp.linalg.norm(pts[0], axis=-1))
    assert abs(float(r.mean()) - 1.0) < 0.1, "samples lie on the unit sphere"

    sub_v, sub_f = subdivide_trianglemesh(mesh.vertices[None],
                                          mesh.faces, iterations=1)
    assert sub_f.shape[0] == 4 * mesh.faces.shape[0]

    # 4. round-trip through OBJ
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sphere.obj")
        obj.export_mesh(path, vertices=np.asarray(mesh.vertices),
                        faces=np.asarray(mesh.faces))
        back = obj.import_mesh(path)
        np.testing.assert_allclose(np.asarray(back.vertices),
                                   np.asarray(mesh.vertices), atol=1e-5)
    print("working_with_meshes:",
          {"V": int(mesh.vertices.shape[0]), "F": int(mesh.faces.shape[0]),
           "subdivided_F": int(sub_f.shape[0])})
    return mesh


if __name__ == "__main__":
    main()
