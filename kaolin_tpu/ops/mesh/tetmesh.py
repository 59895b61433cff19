"""Tetrahedral-mesh ops. Ref ``kaolin/ops/mesh/tetmesh.py`` (inverse_vertices_offset
:41, subdivide_tetmesh :85). Topology host-side; geometry differentiable.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["inverse_vertices_offset", "subdivide_tetmesh"]

_BASE_TET_EDGES = np.array([0, 1, 0, 2, 0, 3, 1, 2, 1, 3, 2, 3])


def inverse_vertices_offset(tet_vertices):
    """Inverse of the per-tet offset matrix [B-A; C-A; D-A] → (B, T, 3, 3).
    Ref :41."""
    a = tet_vertices[..., 0:1, :]
    offset = jnp.concatenate([tet_vertices[..., 1:2, :] - a,
                              tet_vertices[..., 2:3, :] - a,
                              tet_vertices[..., 3:4, :] - a], axis=-2)
    return jnp.linalg.inv(offset)


def subdivide_tetmesh(vertices, tetrahedrons, features=None):
    """Subdivide every tet into 8 by edge midpoints; features averaged on
    edges. Returns (new_vertices, new_tets[, new_features]). Ref :85."""
    tets = np.asarray(tetrahedrons)
    all_edges = tets[:, _BASE_TET_EDGES].reshape(-1, 2)
    all_edges = np.sort(all_edges, axis=-1)
    unique_edges, idx_map = np.unique(all_edges, axis=0, return_inverse=True)
    idx_map = idx_map + vertices.shape[1]

    pos_feature = (jnp.concatenate([vertices, features], -1)
                   if features is not None else vertices)
    mid = pos_feature[:, unique_edges.reshape(-1)].reshape(
        pos_feature.shape[0], -1, 2, pos_feature.shape[-1]).mean(axis=2)
    new_pos_feature = jnp.concatenate([pos_feature, mid], axis=1)
    new_pos, new_features = new_pos_feature[..., :3], new_pos_feature[..., 3:]

    ia, ib, ic, id_ = [tets[:, i] for i in range(4)]
    edges6 = idx_map.reshape(-1, 6)
    iab, iac, iad, ibc, ibd, icd = [edges6[:, i] for i in range(6)]

    new_tets = np.concatenate([
        np.stack([ia, iab, iac, iad], 1),
        np.stack([ib, ibc, iab, ibd], 1),
        np.stack([ic, iac, ibc, icd], 1),
        np.stack([id_, iad, icd, ibd], 1),
        np.stack([iab, iac, iad, ibd], 1),
        np.stack([iab, iac, ibd, ibc], 1),
        np.stack([icd, iac, ibd, iad], 1),
        np.stack([icd, iac, ibc, ibd], 1),
    ], axis=0)
    new_tets = jnp.asarray(new_tets)
    if features is None:
        return new_pos, new_tets
    return new_pos, new_tets, new_features
