"""Mesh → voxelgrid / SPC conversions. Ref
``kaolin/ops/conversions/trianglemesh.py`` (trianglemeshes_to_voxelgrids :29,
unbatched_mesh_to_spc :112 — the latter backed by the CUDA
``mesh_to_spc_cuda.cu`` hierarchical triangle/voxel subdivision)."""

import jax.numpy as jnp
import numpy as np

__all__ = ["trianglemeshes_to_voxelgrids", "unbatched_mesh_to_spc"]


def _subdivide_to_resolution(vertices, faces, resolution):
    """Midpoint-subdivide triangles until max edge² <= ((res-1)/res²)²,
    accumulating vertices (reference ``_unbatched_subdivide_vertices``,
    ops/mesh/trianglemesh.py:340). Host-side numpy."""
    verts = np.asarray(vertices)
    faces_np = np.asarray(faces)
    min_edge = ((resolution - 1) / resolution ** 2) ** 2
    v1 = verts[faces_np[:, 0]]
    v2 = verts[faces_np[:, 1]]
    v3 = verts[faces_np[:, 2]]
    all_pts = [verts]
    while True:
        e = np.stack([((v1 - v2) ** 2).sum(1), ((v2 - v3) ** 2).sum(1),
                      ((v3 - v1) ** 2).sum(1)], axis=1)
        keep = e.max(axis=1) > min_edge
        if not keep.any():
            break
        v1, v2, v3 = v1[keep], v2[keep], v3[keep]
        v4 = (v1 + v3) / 2
        v5 = (v1 + v2) / 2
        v6 = (v2 + v3) / 2
        all_pts.extend([v4, v5, v6])
        v1 = np.concatenate([v1, v2, v4, v3])
        v2 = np.concatenate([v4, v5, v5, v4])
        v3 = np.concatenate([v5, v6, v6, v6])
    return np.unique(np.concatenate(all_pts, axis=0), axis=0)


def trianglemeshes_to_voxelgrids(vertices, faces, resolution, origin=None,
                                 scale=None, return_sparse=False):
    """Surface voxelization by vertex upsampling + box test → (B, R, R, R).
    Ref :29."""
    if not isinstance(resolution, int):
        raise TypeError(f"expected int resolution, got {type(resolution)}")
    from kaolin_tpu.ops.conversions.pointcloud import _base_points_to_voxelgrids
    if origin is None:
        origin = jnp.min(vertices, axis=1)
    if scale is None:
        scale = jnp.max(jnp.max(vertices, axis=1) - origin, axis=1)
    batched = (vertices - origin[:, None, :]) / scale.reshape(-1, 1, 1)
    grids = []
    for i in range(vertices.shape[0]):
        pts = _subdivide_to_resolution(batched[i], faces, resolution)
        grids.append(_base_points_to_voxelgrids(
            jnp.asarray(pts)[None], resolution))
    return jnp.concatenate(grids, axis=0)


def unbatched_mesh_to_spc(face_vertices, level):
    """Mesh in [-1, 1] → SPC octree at ``level`` by surface voxelization.

    Returns (octree, points at leaf level). Ref :112 (hierarchical
    triangle/voxel overlap in CUDA; here: sample-based surface coverage —
    triangles supersampled well below voxel size then quantized).
    """
    from kaolin_tpu.ops.spc import (
        morton_to_points,
        points_to_morton,
        unbatched_points_to_octree,
    )
    fv = np.asarray(face_vertices)  # (F, 3, 3)
    res = 2 ** level
    # supersample each triangle to cover voxels: subdivision density by
    # longest edge in voxel units
    v1, v2, v3 = fv[:, 0], fv[:, 1], fv[:, 2]
    edge = np.sqrt(max(((v1 - v2) ** 2).sum(1).max(),
                       ((v2 - v3) ** 2).sum(1).max(),
                       ((v3 - v1) ** 2).sum(1).max()))
    n = int(np.clip(np.ceil(edge * res * 1.5), 1, 256))
    # barycentric lattice samples
    a = np.linspace(0, 1, n + 1)
    u, v = np.meshgrid(a, a)
    mask = (u + v) <= 1.0 + 1e-9
    u, v = u[mask], v[mask]
    w = 1.0 - u - v
    pts = (v1[:, None] * u[None, :, None] + v2[:, None] * v[None, :, None]
           + v3[:, None] * w[None, :, None]).reshape(-1, 3)
    q = np.floor(np.clip((pts + 1.0) * (res / 2.0), 0, res - 1)).astype(np.int64)
    morton = np.unique(np.asarray(points_to_morton(q)))
    points = morton_to_points(jnp.asarray(morton))
    octree = unbatched_points_to_octree(np.asarray(points), level, sorted=True)
    return octree, points
