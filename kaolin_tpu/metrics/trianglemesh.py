"""Triangle-mesh metrics: point→mesh distance, edge length, laplacian smoothing.

TPU-native analog of reference ``kaolin/metrics/trianglemesh.py``
(point_to_mesh_distance :20, backed by
``csrc/metrics/unbatched_triangle_distance_cuda.cu``; the semantics here match
the reference's naive oracle ``_unbatched_naive_point_to_mesh_distance`` :151
which doubles as its own test reference).

Distance-type codes: 0 face, 1/2/3 vertex v0/v1/v2, 4 edge01, 5 edge12,
6 edge20.
"""

import functools

import jax
import jax.numpy as jnp
from kaolin_tpu.ops.mesh.mesh import uniform_laplacian  # noqa: F401

__all__ = [
    "point_to_mesh_distance",
    "average_edge_length",
    "uniform_laplacian_smoothing",
]

_TILE = 512


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _closest_on_tri(points, v1, v2, v3):
    """Squared distance, closest point and type code for each (point, tri) pair.

    points: (..., 3); v1/v2/v3: (..., 3) broadcastable against points.
    Returns (dist (...,), type (...,) int32, closest (..., 3)).
    Mirrors the region tests of the reference oracle (:186-200) including its
    priority order (the later type's assignment wins on overlap).
    """
    e21 = v2 - v1
    e32 = v3 - v2
    e13 = v1 - v3
    normals = -jnp.cross(e21, e13)

    def proj(vert, edge):
        return _dot(points - vert, edge) / jnp.clip(_dot(edge, edge), 1e-12, None)

    uab = proj(v1, e21)
    ubc = proj(v2, e32)
    uca = proj(v3, e13)

    def not_above(vert, edge):
        edge_norm = jnp.cross(normals, edge)
        return _dot(edge_norm, points - vert) <= 0

    is1 = (uca > 1.) & (uab < 0.)
    is2 = (uab > 1.) & (ubc < 0.)
    is3 = (ubc > 1.) & (uca < 0.)
    is4 = (uab >= 0.) & (uab <= 1.) & not_above(v1, e21)
    is5 = (ubc >= 0.) & (ubc <= 1.) & not_above(v2, e32)
    is6 = (uca >= 0.) & (uca <= 1.) & not_above(v3, e13)

    unit_n = normals / jnp.clip(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12, None)
    plane_pt = points - unit_n * _dot(points - v1, unit_n)[..., None]

    closest = plane_pt
    tcode = jnp.zeros(uab.shape, dtype=jnp.int32)
    for cond, pt, code in (
            (is1, v1, 1),
            (is2, v2, 2),
            (is3, v3, 3),
            (is4, v1 + e21 * uab[..., None], 4),
            (is5, v2 + e32 * ubc[..., None], 5),
            (is6, v3 + e13 * uca[..., None], 6)):
        closest = jnp.where(cond[..., None], pt, closest)
        tcode = jnp.where(cond, code, tcode)
    dist = _dot(closest - points, closest - points)
    return dist, tcode, closest


@functools.partial(jax.jit, static_argnames=("tile",))
def _nearest_face(points, face_vertices, tile=_TILE):
    """(N,3) x (F,3,3) → (face_idx (N,) int32). Scan over face tiles."""
    f = face_vertices.shape[0]
    num_tiles = -(-f // tile)
    fv = jnp.pad(face_vertices, ((0, num_tiles * tile - f), (0, 0), (0, 0)))
    fv_tiles = fv.reshape(num_tiles, tile, 3, 3)

    def body(carry, inp):
        best_d, best_i = carry
        fv_t, t_idx = inp
        p = points[:, None, :]  # (N, 1, 3)
        d, _, _ = _closest_on_tri(p, fv_t[None, :, 0], fv_t[None, :, 1], fv_t[None, :, 2])
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + t_idx * tile
        d = jnp.where(col < f, d, jnp.inf)
        tmin = jnp.min(d, axis=1)
        targ = jnp.argmin(d, axis=1).astype(jnp.int32) + t_idx * tile
        take = tmin < best_d
        return (jnp.where(take, tmin, best_d), jnp.where(take, targ, best_i)), None

    init = (jnp.full((points.shape[0],), jnp.inf, dtype=points.dtype),
            jnp.zeros((points.shape[0],), dtype=jnp.int32))
    (_, best_i), _ = jax.lax.scan(
        body, init, (fv_tiles, jnp.arange(num_tiles, dtype=jnp.int32)))
    return best_i


def point_to_mesh_distance(pointclouds, face_vertices):
    """Squared unsigned distance from each point to its nearest triangle.

    Args:
        pointclouds: (B, N, 3).
        face_vertices: (B, F, 3, 3).

    Returns:
        (distance (B, N), face_idx (B, N) int32, dist_type (B, N) int32).
        Differentiable w.r.t. both inputs (gradient restricted to the winning
        face, matching the reference's recompute trick :237-276). Ref :20.
    """
    idx = jax.vmap(_nearest_face)(jax.lax.stop_gradient(pointclouds),
                                  jax.lax.stop_gradient(face_vertices))
    sel = jnp.take_along_axis(face_vertices, idx[..., None, None], axis=1)
    dist, tcode, _ = _closest_on_tri(
        pointclouds, sel[..., 0, :], sel[..., 1, :], sel[..., 2, :])
    return dist, idx, tcode


def average_edge_length(vertices, faces):
    """Average of the three edge lengths per face → (B, F). Ref :279."""
    fv = vertices[:, faces]  # (B, F, 3, 3)
    v1, v2, v3 = fv[..., 0, :], fv[..., 1, :], fv[..., 2, :]
    l1 = jnp.linalg.norm(v2 - v1, axis=-1)
    l2 = jnp.linalg.norm(v3 - v2, axis=-1)
    l3 = jnp.linalg.norm(v1 - v3, axis=-1)
    return (l1 + l2 + l3) / 3.0


def uniform_laplacian_smoothing(vertices, faces):
    """Smoothed vertices via the uniform laplacian L·V + V. Ref :318."""
    from kaolin_tpu.ops.mesh import uniform_laplacian
    lap = uniform_laplacian(vertices.shape[1], faces)
    return jnp.einsum("nm,bmc->bnc", lap + jnp.eye(vertices.shape[1], dtype=vertices.dtype),
                      vertices)
