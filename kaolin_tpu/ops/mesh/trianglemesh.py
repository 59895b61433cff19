"""Triangle-mesh ops: areas, sampling, normals, subdivision, tangents.

TPU-native analog of reference ``kaolin/ops/mesh/trianglemesh.py`` (face_areas
:98, sample_points :159, packed variants :246, face_normals :314,
subdivide_trianglemesh :482, vertex_tangents :614).

Conventions: geometry (vertices) is a traced JAX array and everything is
differentiable; topology (faces) is host-static (numpy or concrete) so
derived connectivity can be precomputed without dynamic shapes.
Random sampling takes an explicit ``jax.random`` key (functional PRNG)
instead of torch's global generator.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.batch import get_first_idx, tile_to_packed

__all__ = [
    "face_areas",
    "packed_face_areas",
    "sample_points",
    "packed_sample_points",
    "face_normals",
    "subdivide_trianglemesh",
    "vertex_tangents",
    "uniform_laplacian_smoothing",
]


def _base_face_areas(v0, v1, v2):
    """Heron-free triangle area via cross product norm / 2."""
    return 0.5 * jnp.linalg.norm(jnp.cross(v1 - v0, v2 - v0), axis=-1)


def _doctest_anchor():
    """
    Example:
        >>> import jax.numpy as jnp
        >>> v = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0],
        ...                   [0.0, 1.0, 0.0]]])
        >>> f = jnp.asarray([[0, 1, 2]])
        >>> print(face_areas(v, f))
        [[0.5]]
    """


def face_areas(vertices, faces):
    """Areas of each face. (B, V, 3) x (F, 3) → (B, F). Ref :98."""
    faces = jnp.asarray(faces)
    fv = vertices[:, faces]  # (B, F, 3, 3)
    return _base_face_areas(fv[..., 0, :], fv[..., 1, :], fv[..., 2, :])


def packed_face_areas(vertices, first_idx_vertices, faces, num_faces_per_mesh):
    """Areas over packed meshes → (F_total,). Ref :125."""
    offset = tile_to_packed(jnp.asarray(np.asarray(first_idx_vertices)[:-1],
                                        dtype=jnp.int64),
                            num_faces_per_mesh)
    merged = jnp.asarray(faces) + offset
    fv = vertices[merged]  # (F_total, 3, 3)
    return _base_face_areas(fv[:, 0], fv[:, 1], fv[:, 2])


def _sample_barycentric(key, shape, dtype):
    """w0/w1/w2 with the reference's sqrt trick for uniform density (:68-86)."""
    ku, kv = jax.random.split(key)
    u = jnp.sqrt(jax.random.uniform(ku, shape, dtype=dtype))
    v = jax.random.uniform(kv, shape, dtype=dtype)
    return 1.0 - u, u * (1.0 - v), u * v


def sample_points(vertices, faces, num_samples, key, areas=None, face_features=None):
    """Uniformly sample points on mesh surfaces, area-weighted per face.

    Args:
        vertices: (B, V, 3).
        faces: (F, 3) int.
        num_samples: static int.
        key: jax PRNG key.
        areas: optional precomputed (B, F).
        face_features: optional (B, F, 3, D) to interpolate.

    Returns:
        (points (B, S, 3), face_choices (B, S) int32[, features (B, S, D)]).
        Ref :159.
    """
    faces = jnp.asarray(faces)
    fv = vertices[:, faces]  # (B, F, 3, 3)
    if areas is None:
        areas = _base_face_areas(fv[..., 0, :], fv[..., 1, :], fv[..., 2, :])
    b = vertices.shape[0]
    kc, kb = jax.random.split(key)
    logits = jnp.log(jnp.clip(areas, 1e-30, None))
    face_choices = jax.random.categorical(kc, logits[:, None, :],
                                          shape=(b, num_samples)).astype(jnp.int32)
    sel = jnp.take_along_axis(fv, face_choices[..., None, None], axis=1)  # (B,S,3,3)
    w0, w1, w2 = _sample_barycentric(kb, (b, num_samples, 1), vertices.dtype)
    points = w0 * sel[..., 0, :] + w1 * sel[..., 1, :] + w2 * sel[..., 2, :]
    if face_features is not None:
        ff = jnp.take_along_axis(face_features, face_choices[..., None, None], axis=1)
        feats = w0 * ff[..., 0, :] + w1 * ff[..., 1, :] + w2 * ff[..., 2, :]
        return points, face_choices, feats
    return points, face_choices


def packed_sample_points(vertices, first_idx_vertices, faces,
                         num_faces_per_mesh, num_samples, key, areas=None):
    """Sample points over packed meshes → fixed (B, S, 3) batch. Ref :246."""
    from kaolin_tpu.ops.batch import packed_to_padded
    nf = np.asarray(num_faces_per_mesh)
    b = nf.shape[0]
    offset = tile_to_packed(jnp.asarray(np.asarray(first_idx_vertices)[:-1],
                                        dtype=jnp.int64), nf)
    merged = jnp.asarray(faces) + offset
    fv = vertices[merged]  # (F_total, 3, 3)
    if areas is None:
        areas = _base_face_areas(fv[:, 0], fv[:, 1], fv[:, 2])
    first_idx_faces = get_first_idx(nf)
    padded_areas = packed_to_padded(areas.reshape(-1, 1), nf.reshape(-1, 1),
                                    first_idx_faces, 0.0).squeeze(-1)
    kc, kb = jax.random.split(key)
    logits = jnp.log(jnp.clip(padded_areas, 1e-30, None))
    face_choices = jax.random.categorical(kc, logits[:, None, :],
                                          shape=(b, num_samples)).astype(jnp.int32)
    merged_choices = face_choices + jnp.asarray(first_idx_faces[:-1],
                                                dtype=jnp.int32).reshape(-1, 1)
    sel = fv[merged_choices.reshape(-1)].reshape(b, num_samples, 3, 3)
    w0, w1, w2 = _sample_barycentric(kb, (b, num_samples, 1), vertices.dtype)
    points = w0 * sel[..., 0, :] + w1 * sel[..., 1, :] + w2 * sel[..., 2, :]
    return points, merged_choices


def face_normals(face_vertices, unit=False):
    """Normals of faces (B, F, 3, 3) → (B, F, 3); left-hand rule. Ref :314."""
    e0 = face_vertices[:, :, 1] - face_vertices[:, :, 0]
    e1 = face_vertices[:, :, 2] - face_vertices[:, :, 0]
    n = jnp.cross(e0, e1)
    if unit:
        n = n / (jnp.linalg.norm(n, axis=2, keepdims=True) + 1e-10)
    return n


def _get_alpha(n):
    """Loop-subdivision weight per vertex valence. Ref :487."""
    alpha = (5.0 / 8 - (3.0 / 8 + 1.0 / 4 * np.cos(2 * math.pi / n)) ** 2) / n
    return np.where(n == 3, 3.0 / 16.0, alpha)


def subdivide_trianglemesh(vertices, faces, iterations, alpha=None):
    """Loop subdivision with optional learnable per-vertex alpha.

    Topology (edge extraction, valences, new faces) runs host-side in numpy —
    it is static given ``faces``. Vertex positions stay traced JAX arrays so
    gradients flow through the (1-alpha)·v + alpha/n·Σneighbors update and the
    edge-point averages, matching reference :482-611 (used by DMTet).

    Returns (new_vertices (B, V', 3), new_faces (F·4^it, 3) numpy).
    """
    init_alpha = alpha  # auto alpha is recomputed from degrees each
    # iteration; only a user-provided alpha carries over (ref :551-553)
    for _ in range(iterations):
        if init_alpha is None:
            alpha = None
        faces_np = np.asarray(faces)
        b, v = vertices.shape[0], vertices.shape[1]
        f = faces_np.shape[0]

        edges = faces_np[:, [[0, 1], [1, 2], [2, 0]]].reshape(-1, 2)
        edges_sorted = np.sort(edges, axis=-1)
        all_edges_face_idx = np.repeat(np.arange(f), 3)
        edges_ex2, inverse_indices, counts = np.unique(
            edges_sorted, axis=0, return_inverse=True, return_counts=True)
        e = edges_ex2.shape[0]

        # vertex adjacency (host): rows i with neighbors j
        adj_idx = np.concatenate([edges_ex2, edges_ex2[:, ::-1]], axis=0)
        adj_idx = np.unique(adj_idx, axis=0)
        n_neighbors = np.bincount(adj_idx[:, 0], minlength=v).astype(np.float64)

        if alpha is None:
            alpha_v = jnp.asarray((_get_alpha(np.clip(n_neighbors, 1, None))
                                   * n_neighbors)[None, :, None],
                                  dtype=vertices.dtype)
        else:
            alpha_v = alpha[..., None] if alpha.ndim == 2 else alpha

        # neighbor sum via segment_sum over adjacency edges
        nbr_vals = vertices[:, adj_idx[:, 1], :]
        adj_sum = jax.vmap(
            lambda nv: jax.ops.segment_sum(nv, jnp.asarray(adj_idx[:, 0]),
                                           num_segments=v))(nbr_vals)
        n_dev = jnp.asarray(np.clip(n_neighbors, 1, None)[None, :, None],
                            dtype=vertices.dtype)
        vertices_new = (1 - alpha_v) * vertices + alpha_v / n_dev * adj_sum

        # edge points
        mask_e = counts == 2
        mid = jnp.mean(vertices[:, edges_ex2.reshape(-1), :].reshape(b, e, 2, 3), axis=2)
        alpha_mid = jnp.mean(alpha_v[:, edges_ex2.reshape(-1), :].reshape(b, e, 2, 1), axis=2)

        edge_points = mid
        alpha_points = alpha_mid
        if mask_e.any():
            # interior edges: average of the 6 verts of the 2 adjacent faces
            # plus the 2 edge endpoints (ref :594-604)
            sel_rows = np.where(mask_e[inverse_indices])[0]
            order = np.argsort(inverse_indices[sel_rows], kind="stable")
            grouped = all_edges_face_idx[sel_rows][order]
            edges_face_idx = np.stack([grouped[::2], grouped[1::2]], axis=-1)
            interior_edge_ids = np.where(mask_e)[0]
            faces_of_edges = faces_np[edges_face_idx.reshape(-1)].reshape(-1, 6)
            vert8 = np.concatenate([faces_of_edges, edges_ex2[mask_e]], axis=1)  # (E2, 8)
            ev = vertices[:, vert8.reshape(-1), :].reshape(b, -1, 8, 3).mean(axis=2)
            eav = alpha_v[:, vert8.reshape(-1), :].reshape(b, -1, 8, 1).mean(axis=2)
            edge_points = edge_points.at[:, interior_edge_ids].set(ev)
            alpha_points = alpha_points.at[:, interior_edge_ids].set(eav)

        vertices = jnp.concatenate([vertices_new, edge_points], axis=1)
        alpha = jnp.concatenate([alpha_v, alpha_points], axis=1)[..., 0]

        edges_fx3 = inverse_indices.reshape(f, 3) + v
        faces6 = np.concatenate([faces_np, edges_fx3], axis=1)
        faces = faces6[:, [[1, 4, 3], [0, 3, 5], [2, 5, 4], [5, 3, 4]]].reshape(-1, 3)
    return vertices, jnp.asarray(faces)


def vertex_tangents(faces, face_vertices, face_uvs, vertex_normals):
    """Per-vertex tangents from UVs, for normal mapping. Ref :614.

    faces (F,3) int, face_vertices (F,3,3), face_uvs (F,3,2),
    vertex_normals (V,3) → (V,3).
    """
    faces = jnp.asarray(faces)
    uve1 = face_uvs[:, 1] - face_uvs[:, 0]
    uve2 = face_uvs[:, 2] - face_uvs[:, 0]
    pe1 = face_vertices[:, 1] - face_vertices[:, 0]
    pe2 = face_vertices[:, 2] - face_vertices[:, 0]
    nom = pe1 * uve2[..., 1:2] - pe2 * uve1[..., 1:2]
    denom = uve1[..., 0] * uve2[..., 1] - uve1[..., 1] * uve2[..., 0]
    denom = jnp.where(denom > 0.0, jnp.clip(denom, 1e-6, None),
                      jnp.clip(denom, None, -1e-6))
    tang = nom / denom[..., None]
    v = vertex_normals.shape[0]
    tangents = jnp.zeros_like(vertex_normals)
    for i in range(3):
        tangents = tangents.at[faces[:, i]].add(tang)
    tangents = tangents / jnp.clip(jnp.linalg.norm(tangents, axis=1, keepdims=True),
                                   1e-12, None)
    tangents = tangents - jnp.sum(tangents * vertex_normals, axis=-1,
                                  keepdims=True) * vertex_normals
    return tangents / jnp.clip(jnp.linalg.norm(tangents, axis=1, keepdims=True),
                               1e-12, None)


def uniform_laplacian_smoothing(vertices, faces):
    """Convenience re-export (see metrics.trianglemesh)."""
    from kaolin_tpu.metrics.trianglemesh import uniform_laplacian_smoothing as f
    return f(vertices, faces)
