"""Voxelgrid → mesh conversions: cubic meshes and marching cubes.

TPU-native analog of reference ``kaolin/ops/conversions/voxelgrid.py``
(voxelgrids_to_cubic_meshes :56, voxelgrids_to_trianglemeshes :169 — the
latter backed by the CUDA Lorensen kernel
``csrc/ops/conversions/unbatched_mcube``).

Mesh extraction produces inherently dynamic shapes, so these run as
vectorized host/numpy passes (construction-time ops); the classic MC lookup
tables live in ``_mc_tables.py``.
"""

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions._mc_tables import MC_EDGE_TABLE, MC_TRI_TABLE

__all__ = ["voxelgrids_to_cubic_meshes", "voxelgrids_to_trianglemeshes"]

# cube corners in the classic Lorensen ordering (x, y, z)
_MC_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], dtype=np.int64)
# the 12 cube edges as (corner_a, corner_b)
_MC_EDGES = np.array([
    [0, 1], [1, 2], [2, 3], [3, 0],
    [4, 5], [5, 6], [6, 7], [7, 4],
    [0, 4], [1, 5], [2, 6], [3, 7],
], dtype=np.int64)


def _marching_cubes_single(vals, iso_value):
    """vals: padded (X, Y, Z) float lattice samples. Returns (verts, faces)
    numpy. Vectorized classic marching cubes."""
    nx, ny, nz = vals.shape
    # lattice cells
    cx, cy, cz = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    cells = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # (C, 3)
    corner_coords = cells[:, None, :] + _MC_CORNERS[None]  # (C, 8, 3)
    corner_vals = vals[corner_coords[..., 0], corner_coords[..., 1],
                       corner_coords[..., 2]]  # (C, 8)
    inside = corner_vals > iso_value
    cube_index = np.sum(inside.astype(np.int64) << np.arange(8), axis=-1)
    active = (cube_index != 0) & (cube_index != 255)
    if not active.any():
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    cells = cells[active]
    corner_vals = corner_vals[active]
    cube_index = cube_index[active]

    # global edge ids: edge = (axis, lattice coord of lower corner)
    corner_global = cells[:, None, :] + _MC_CORNERS[None]  # (A, 8, 3)
    ea = _MC_EDGES[:, 0]
    eb = _MC_EDGES[:, 1]
    pa = corner_global[:, ea]  # (A, 12, 3)
    pb = corner_global[:, eb]
    lower = np.minimum(pa, pb)
    axis = np.argmax(np.abs(pa - pb), axis=-1)  # (A, 12)
    edge_key = (((lower[..., 0] * ny + lower[..., 1]) * nz + lower[..., 2]) * 3
                + axis)  # (A, 12)

    edge_bits = MC_EDGE_TABLE[cube_index]  # (A,)
    edge_used = ((edge_bits[:, None] >> np.arange(12)) & 1) == 1  # (A, 12)

    used_keys = edge_key[edge_used]
    va = corner_vals[:, ea][edge_used]
    vb = corner_vals[:, eb][edge_used]
    pa_u = pa[edge_used].astype(np.float64)
    pb_u = pb[edge_used].astype(np.float64)
    t = (iso_value - va) / np.where(np.abs(vb - va) > 1e-12, vb - va, 1e-12)
    t = np.clip(t, 0.0, 1.0)
    pos = pa_u + t[:, None] * (pb_u - pa_u)

    uniq_keys, first_idx = np.unique(used_keys, return_index=True)
    verts = pos[first_idx].astype(np.float32)
    edge_vert = np.searchsorted(uniq_keys, edge_key)  # (A, 12); valid where used

    tri_rows = MC_TRI_TABLE[cube_index]  # (A, 16)
    faces = []
    for k in range(0, 15, 3):
        rows = tri_rows[:, k]
        sel = rows >= 0
        if not sel.any():
            break
        e0 = tri_rows[sel, k]
        e1 = tri_rows[sel, k + 1]
        e2 = tri_rows[sel, k + 2]
        idx = np.arange(tri_rows.shape[0])[sel]
        faces.append(np.stack([edge_vert[idx, e0], edge_vert[idx, e1],
                               edge_vert[idx, e2]], axis=-1))
    faces = (np.concatenate(faces, axis=0) if faces
             else np.zeros((0, 3), np.int64))
    return verts, faces


def voxelgrids_to_trianglemeshes(voxelgrids, iso_value=0.5):
    """Marching cubes over batched voxelgrids (B, X, Y, Z) → lists of
    (vertices, faces). Grid values sampled at voxel centers, 1-voxel zero
    padding like the reference (:228). Ref :169."""
    vg = np.asarray(voxelgrids).astype(np.float32)
    vg = np.pad(vg, ((0, 0), (1, 1), (1, 1), (1, 1)))
    vertices_list, faces_list = [], []
    for i in range(vg.shape[0]):
        v, f = _marching_cubes_single(vg[i], iso_value)
        vertices_list.append(jnp.asarray(v))
        faces_list.append(jnp.asarray(f))
    return vertices_list, faces_list


_FACE_NEIGHBORS = np.array([
    [-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1],
])
# quad corner offsets for each face direction (outward-facing order)
_FACE_QUADS = {
    0: [[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0]],
    1: [[1, 0, 0], [1, 1, 0], [1, 1, 1], [1, 0, 1]],
    2: [[0, 0, 0], [1, 0, 0], [1, 0, 1], [0, 0, 1]],
    3: [[0, 1, 0], [0, 1, 1], [1, 1, 1], [1, 1, 0]],
    4: [[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]],
    5: [[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]],
}


def voxelgrids_to_cubic_meshes(voxelgrids, is_trimesh=True):
    """Convert binary voxelgrids to (quad or triangle) surface meshes of the
    voxel cubes, emitting only exposed faces. Ref :56."""
    vg = np.asarray(voxelgrids).astype(bool)
    vertices_list, faces_list = [], []
    for b in range(vg.shape[0]):
        grid = np.pad(vg[b], 1)
        occ = np.stack(np.nonzero(vg[b]), axis=-1)  # (N, 3)
        verts_map = {}
        verts = []
        faces = []
        for d in range(6):
            n = _FACE_NEIGHBORS[d]
            nb = occ + n
            exposed = ~grid[nb[:, 0] + 1, nb[:, 1] + 1, nb[:, 2] + 1]
            for v in occ[exposed]:
                quad = []
                for off in _FACE_QUADS[d]:
                    key = tuple(v + off)
                    if key not in verts_map:
                        verts_map[key] = len(verts)
                        verts.append(key)
                    quad.append(verts_map[key])
                if is_trimesh:
                    faces.append([quad[0], quad[1], quad[2]])
                    faces.append([quad[0], quad[2], quad[3]])
                else:
                    faces.append(quad)
        vertices_list.append(jnp.asarray(np.asarray(verts, dtype=np.float32)
                                         if verts else
                                         np.zeros((0, 3), np.float32)))
        faces_list.append(jnp.asarray(np.asarray(faces, dtype=np.int64)
                                      if faces else
                                      np.zeros((0, 3 if is_trimesh else 4),
                                               np.int64)))
    return vertices_list, faces_list
