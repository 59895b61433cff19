"""General mesh ops: indexing, adjacency, laplacian, vertex normals.

TPU-native analog of reference ``kaolin/ops/mesh/mesh.py`` (index_vertices_by_faces
:54, adjacency_matrix :78, uniform_laplacian :116, compute_vertex_normals :154).
Adjacency is built host-side (topology is static); per-vertex averages use
``segment_sum`` instead of scatter_add.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "index_vertices_by_faces",
    "adjacency_matrix",
    "uniform_laplacian",
    "compute_vertex_normals",
    "average_face_vertex_features",
]


def index_vertices_by_faces(vertices_features, faces):
    """Per-vertex (B, V, D) → per-vertex-per-face (B, F, FSz, D). Ref :54."""
    assert vertices_features.ndim == 3
    faces = jnp.asarray(faces)
    assert faces.ndim == 2
    return vertices_features[:, faces]


def _unique_edges(faces, num_vertices):
    faces = np.asarray(faces)
    rolled = np.roll(faces, 1, axis=-1)
    fwd = np.stack([faces, rolled], axis=-1).reshape(-1, 2)
    bwd = np.stack([rolled, faces], axis=-1).reshape(-1, 2)
    idx = np.unique(np.concatenate([fwd, bwd], axis=0), axis=0)
    return idx


def adjacency_matrix(num_vertices, faces, sparse=False):
    """Vertex adjacency matrix (V, V). ``sparse`` returns (indices, values)
    COO pair instead of a dense array (JAX has no sparse tensor type at this
    layer). Ref :78."""
    idx = _unique_edges(faces, num_vertices)
    if sparse:
        return jnp.asarray(idx.T), jnp.ones(idx.shape[0], dtype=jnp.float32)
    adj = np.zeros((num_vertices, num_vertices), dtype=np.float32)
    adj[idx[:, 0], idx[:, 1]] = 1.0
    return jnp.asarray(adj)


def uniform_laplacian(num_vertices, faces):
    """Uniform laplacian: L[i,j]=1/deg(i) for neighbors, −1 diagonal. Ref :116."""
    adj = np.zeros((num_vertices, num_vertices), dtype=np.float32)
    idx = _unique_edges(faces, num_vertices)
    adj[idx[:, 0], idx[:, 1]] = 1.0
    deg = adj.sum(axis=1, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        lap = np.where(deg > 0, adj / deg, 0.0)
    np.fill_diagonal(lap, -1.0)
    return jnp.asarray(lap)


def average_face_vertex_features(faces, face_features, num_vertices=None):
    """Average per-face-vertex features into per-vertex features (B, V, D).
    Ref :175; scatter_add → segment_sum."""
    faces = np.asarray(faces)
    if num_vertices is None:
        num_vertices = int(faces.max()) + 1
    fsz = faces.shape[1]
    seg = jnp.asarray(faces.reshape(-1))  # (F*FSz,)

    def one(ff):
        flat = ff.reshape(-1, ff.shape[-1])  # (F*FSz, D)
        sums = jax.ops.segment_sum(flat, seg, num_segments=num_vertices)
        counts = jax.ops.segment_sum(jnp.ones((flat.shape[0],), dtype=ff.dtype),
                                     seg, num_segments=num_vertices)
        return sums / jnp.clip(counts, 1.0, None)[:, None]

    return jax.vmap(one)(face_features)


def compute_vertex_normals(faces, face_normals, num_vertices=None):
    """Per-vertex normals by averaging incident face normals. Ref :154."""
    return average_face_vertex_features(faces, face_normals, num_vertices)


def unindex_vertices_by_faces(face_vertices):
    """Inverse of :func:`index_vertices_by_faces`: flatten per-face vertices
    into unique-per-corner vertices + trivial faces. Ref ``mesh.py``
    (unindex_vertices_by_faces)."""
    import jax.numpy as jnp
    b_shape = face_vertices.shape[:-3]
    nf = face_vertices.shape[-3]
    vertices = face_vertices.reshape(b_shape + (nf * 3,)
                                     + face_vertices.shape[-1:])
    faces = jnp.arange(nf * 3, dtype=jnp.int64).reshape(nf, 3)
    return vertices, faces
