"""SPC point utilities: morton codes, quantization, octree construction,
corners, trilinear interpolation.

TPU-native analog of reference ``kaolin/ops/spc/points.py`` (quantize_points
:35, unbatched_points_to_octree :53, points_to_morton :79, morton_to_points
:107, points_to_corners :133, unbatched_interpolate_trilinear :248,
coords_to_trilinear_coeffs :313) backed by
``csrc/ops/spc/point_utils_cuda.cu``.

Morton convention (matches reference): interleave (x, y, z) with z in the
least-significant bit of each triplet — [0,0,1]→1, [0,1,0]→2, [1,0,0]→4.

Octree *construction* runs host-side in numpy (variable-length byte output —
inherently dynamic; done once per asset). Queries and interpolation are
jittable device code; interpolation gradients come from plain AD through the
gathers (replacing the reference's custom VJP).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "coords_to_trilinear",
    "quantize_points",
    "unbatched_points_to_octree",
    "points_to_morton",
    "morton_to_points",
    "morton_to_octree",
    "points_to_corners",
    "coords_to_trilinear_coeffs",
    "unbatched_interpolate_trilinear",
    "create_dense_spc",
]


def _spread_bits_np(x):
    """Spread 16-bit ints so bits occupy every 3rd position (numpy int64)."""
    x = x.astype(np.int64) & 0xFFFF
    x = (x | (x << 16)) & 0x0000FF0000FF
    x = (x | (x << 8)) & 0x00F00F00F00F
    x = (x | (x << 4)) & 0x0C30C30C30C3
    x = (x | (x << 2)) & 0x249249249249
    return x


def _compact_bits_np(x):
    x = x.astype(np.int64) & 0x249249249249
    x = (x | (x >> 2)) & 0x0C30C30C30C3
    x = (x | (x >> 4)) & 0x00F00F00F00F
    x = (x | (x >> 8)) & 0x0000FF0000FF
    x = (x | (x >> 16)) & 0x0000FFFF
    return x


def quantize_points(x, level):
    """[-1, 1] floats → integer grid coords in [0, 2^level − 1]. Ref :35."""
    res = 2 ** level
    return jnp.floor(jnp.clip(res * (x + 1.0) / 2.0, 0, res - 1.0)).astype(jnp.int16)


def points_to_morton(points):
    """(N, 3) int coords → (N,) int64 morton codes. Ref :79."""
    pts = np.asarray(points).astype(np.int64)
    shape = pts.shape[:-1]
    pts = pts.reshape(-1, 3)
    m = (_spread_bits_np(pts[:, 0]) << 2 | _spread_bits_np(pts[:, 1]) << 1
         | _spread_bits_np(pts[:, 2]))
    return jnp.asarray(m.reshape(shape))


def _doctest_anchor():
    """
    Example:
        >>> import jax.numpy as jnp
        >>> pts = jnp.asarray([[0, 0, 0], [1, 1, 1], [2, 0, 3]], jnp.int16)
        >>> m = points_to_morton(pts)
        >>> print(m)
        [ 0  7 41]
        >>> print(morton_to_points(m))
        [[0 0 0]
         [1 1 1]
         [2 0 3]]
    """


def morton_to_points(morton):
    """(N,) morton codes → (N, 3) int16 coords. Ref :107."""
    m = np.asarray(morton).astype(np.int64)
    shape = m.shape + (3,)
    m = m.reshape(-1)
    x = _compact_bits_np(m >> 2)
    y = _compact_bits_np(m >> 1)
    z = _compact_bits_np(m)
    return jnp.asarray(np.stack([x, y, z], axis=-1).astype(np.int16).reshape(shape))


def unbatched_points_to_octree(points, level, sorted=False):
    """Quantized points at ``level`` → byte-packed octree (host-side; the
    native C++ builder when available, numpy otherwise).
    Ref :53 (CUDA ``points_to_octree``)."""
    pts = np.asarray(points).astype(np.int64)
    if not sorted:
        from kaolin_tpu import native
        oc = native.points_to_octree(pts, int(level)) \
            if native.is_available() else None
        if oc is not None:
            return jnp.asarray(oc)
        m = np.unique(_morton_np(pts))
    else:
        m = _morton_np(pts)
    octree_levels = []
    for _ in range(level, 0, -1):
        parent = m >> 3
        octant = m & 7
        # group children by parent (m sorted → parents sorted)
        uniq_parent, start = np.unique(parent, return_index=True)
        bytes_l = np.zeros(uniq_parent.shape[0], dtype=np.uint8)
        np.bitwise_or.at(bytes_l, np.searchsorted(uniq_parent, parent),
                         (1 << octant).astype(np.uint8))
        octree_levels.append(bytes_l)
        m = uniq_parent
    octree_levels.reverse()
    return jnp.asarray(np.concatenate(octree_levels))


def _morton_np(pts):
    pts = np.asarray(pts).astype(np.int64)
    return np.sort(_spread_bits_np(pts[:, 0]) << 2
                   | _spread_bits_np(pts[:, 1]) << 1
                   | _spread_bits_np(pts[:, 2]))


def morton_to_octree(morton, level):
    """Sorted unique morton codes at ``level`` → octree bytes. Ref points.py."""
    return unbatched_points_to_octree(
        np.asarray(morton_to_points(morton)), level, sorted=True)


def points_to_corners(points):
    """Each point's 8 cell corners, z fastest → (..., 8, 3). Ref :133."""
    points = jnp.asarray(points)
    c = jnp.arange(8)
    offs = jnp.stack([(c >> 2) & 1, (c >> 1) & 1, c & 1], axis=-1).astype(points.dtype)
    return points[..., None, :] + offs


def coords_to_trilinear_coeffs(coords, points, level):
    """Trilinear interpolation coefficients of [-1,1] coords inside the cells
    given by ``points`` (quantized cell origins) → (..., 8). Ref :313."""
    coords = jnp.asarray(coords)
    points = jnp.asarray(points).astype(coords.dtype)
    res = 2 ** level
    x = (coords + 1.0) * (res / 2.0) - points  # local in [0, 1]
    xp = 1.0 - x
    cx = jnp.stack([xp[..., 0], xp[..., 0], xp[..., 0], xp[..., 0],
                    x[..., 0], x[..., 0], x[..., 0], x[..., 0]], axis=-1)
    cy = jnp.stack([xp[..., 1], xp[..., 1], x[..., 1], x[..., 1],
                    xp[..., 1], xp[..., 1], x[..., 1], x[..., 1]], axis=-1)
    cz = jnp.stack([xp[..., 2], x[..., 2], xp[..., 2], x[..., 2],
                    xp[..., 2], x[..., 2], xp[..., 2], x[..., 2]], axis=-1)
    return cx * cy * cz


def unbatched_interpolate_trilinear(coords, pidx, point_hierarchy, trinkets,
                                    feats, level):
    """Trilinearly interpolate per-corner features at query coords.

    Args:
        coords: (N, S, 3) in [-1, 1] (S samples per query point).
        pidx: (N,) global indices into point_hierarchy (from
            :func:`unbatched_query`); -1 for misses (zeros returned).
        point_hierarchy: (num_points, 3) int16.
        trinkets: (num_points, 8) int corner indices into the dual features.
        feats: (num_corners, D).
        level: octree level of the query.

    Returns:
        (N, S, D). Differentiable in coords and feats. Ref :248 (CUDA fwd +
        custom VJP; AD through the gathers here is the same math).
    """
    valid = pidx >= 0
    safe = jnp.where(valid, pidx, 0)
    cell = point_hierarchy[safe].astype(coords.dtype)  # (N, 3)
    coeffs = coords_to_trilinear_coeffs(coords, cell[:, None, :], level)  # (N,S,8)
    corner_feats = feats[trinkets[safe]]  # (N, 8, D)
    out = jnp.einsum("nsc,ncd->nsd", coeffs,
                     corner_feats.astype(coords.dtype))
    return jnp.where(valid[:, None, None], out, 0.0)


def create_dense_spc(level, **kwargs):
    """Fully dense octree at ``level`` → (octree, lengths). Ref :344."""
    num_bytes = sum(8 ** l for l in range(level))
    octree = jnp.full((num_bytes,), 255, dtype=jnp.uint8)
    lengths = jnp.asarray([num_bytes], dtype=jnp.int32)
    return octree, lengths


def coords_to_trilinear(coords, points, level):
    """Deprecated alias of :func:`coords_to_trilinear_coeffs`. Ref
    ``points.py`` (coords_to_trilinear)."""
    import warnings
    warnings.warn("coords_to_trilinear is deprecated, "
                  "use coords_to_trilinear_coeffs", DeprecationWarning)
    return coords_to_trilinear_coeffs(coords, points, level)
