"""SPC core: octree scanning, point generation, queries, duals, dense bridges.

TPU-native analog of reference ``kaolin/ops/spc/spc.py`` (scan_octrees :43,
generate_points :87, to_dense :138, feature_grids_to_spc :189,
unbatched_query :268, unbatched_make_dual :343, unbatched_make_trinkets :419)
backed by ``csrc/ops/spc/spc_cuda.cu``/``query_cuda.cu``.

Layout (identical to reference): byte-packed morton-BFS octrees, pyramids
(B, 2, max_level+2) with per-level counts/offsets, exsum = per-octree
inclusive popcount sum. Construction/scan runs host-side numpy (once per
asset, variable-length outputs); ``unbatched_query`` and ``to_dense`` are
jittable device code.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.spc.points import points_to_corners, points_to_morton

__all__ = [
    "scan_octrees",
    "generate_points",
    "to_dense",
    "feature_grids_to_spc",
    "unbatched_query",
    "unbatched_get_level_points",
    "unbatched_make_dual",
    "unbatched_make_trinkets",
]

_POPCOUNT_TABLE = np.array([bin(i).count("1") for i in range(256)],
                           dtype=np.int32)


def _scan_single(octree_np):
    """Per-octree: (max_level, counts-per-level list, exsum)."""
    popc = _POPCOUNT_TABLE[octree_np]
    exsum = np.cumsum(popc).astype(np.int32)
    counts = [1]
    consumed = 0
    while consumed < octree_np.shape[0]:
        n_bytes = counts[-1]
        counts.append(int(popc[consumed:consumed + n_bytes].sum()))
        consumed += n_bytes
    max_level = len(counts) - 1
    return max_level, counts, exsum


def scan_octrees(octrees, lengths, legacy_exsum=False):
    """(octrees uint8 packed, lengths (B,)) → (max_level, pyramids
    (B, 2, max_level+2) int32, exsum). Ref :43."""
    octrees_np = np.asarray(octrees)
    lengths_np = np.asarray(lengths)
    offsets = np.concatenate([[0], np.cumsum(lengths_np)])
    results = [_scan_single(octrees_np[offsets[i]:offsets[i + 1]])
               for i in range(lengths_np.shape[0])]
    max_level = max(r[0] for r in results)
    b = len(results)
    pyramids = np.zeros((b, 2, max_level + 2), dtype=np.int32)
    exsums = []
    for i, (ml, counts, exsum) in enumerate(results):
        counts = counts + [0] * (max_level + 1 - len(counts))
        pyramids[i, 0, :max_level + 1] = counts
        pyramids[i, 1, 1:] = np.cumsum(counts)
        exsums.append(exsum)
    exsum = np.concatenate(exsums)
    if legacy_exsum:
        parts = []
        for i, e in enumerate(exsums):
            parts.append(np.concatenate([[0], e]))
        exsum = np.concatenate(parts)
    return max_level, jnp.asarray(pyramids), jnp.asarray(exsum.astype(np.int32))


def generate_points(octrees, pyramids, exsum):
    """Decode octrees → packed point hierarchies (num_points, 3) int16.
    Ref :87."""
    octrees_np = np.asarray(octrees)
    pyramids_np = np.asarray(pyramids)
    b = pyramids_np.shape[0]
    byte_lengths = pyramids_np[:, 1, -2]  # bytes per octree = points up to level L-1
    offsets = np.concatenate([[0], np.cumsum(byte_lengths)])
    all_points = []
    corner_offs = np.stack([(np.arange(8) >> 2) & 1, (np.arange(8) >> 1) & 1,
                            np.arange(8) & 1], axis=-1)
    for i in range(b):
        bo = octrees_np[offsets[i]:offsets[i + 1]]
        pts = [np.zeros((1, 3), dtype=np.int64)]
        consumed = 0
        cur = pts[0]
        while consumed < bo.shape[0]:
            n_bytes = cur.shape[0]
            bytes_l = bo[consumed:consumed + n_bytes]
            bits = (bytes_l[:, None] >> np.arange(8)[None]) & 1  # (n, 8)
            par_idx, oct_idx = np.nonzero(bits)
            children = cur[par_idx] * 2 + corner_offs[oct_idx]
            pts.append(children)
            cur = children
            consumed += n_bytes
        all_points.append(np.concatenate(pts, axis=0))
    return jnp.asarray(np.concatenate(all_points).astype(np.int16))


def unbatched_get_level_points(point_hierarchy, pyramid, level):
    """Points of one level. Ref :323."""
    pyramid = np.asarray(pyramid)
    start = int(pyramid[1, level])
    num = int(pyramid[0, level])
    return point_hierarchy[start:start + num]


def unbatched_query(octree, exsum, query_coords, level, with_parents=False):
    """Walk the octree to find point-hierarchy indices of query coords;
    -1 for empty space. Jittable device code. Ref :268.

    query_coords: float (N, 3) in [-1, 1] or int (N, 3) in [0, 2^level].
    """
    octree = jnp.asarray(octree)
    exsum = jnp.asarray(exsum)
    if jnp.issubdtype(query_coords.dtype, jnp.floating):
        coords = jnp.floor(
            jnp.clip((query_coords + 1.0) * (2 ** level / 2.0),
                     0, 2 ** level - 1)).astype(jnp.int32)
    else:
        coords = query_coords.astype(jnp.int32)

    n = coords.shape[0]
    ord_ = jnp.zeros((n,), dtype=jnp.int32)
    alive = jnp.ones((n,), dtype=bool)
    # in-bounds check
    res = 2 ** level
    alive = alive & jnp.all((coords >= 0) & (coords < res), axis=-1)
    parents = [jnp.where(alive, ord_, -1)]

    for l in range(1, level + 1):
        shift = level - l
        o = (((coords[:, 0] >> shift) & 1) * 4
             + ((coords[:, 1] >> shift) & 1) * 2
             + ((coords[:, 2] >> shift) & 1)).astype(jnp.int32)
        byte = octree[ord_].astype(jnp.int32)
        has_child = ((byte >> o) & 1) == 1
        below = byte & ((1 << o) - 1)
        popc_below = jax.lax.population_count(below.astype(jnp.uint32)).astype(jnp.int32)
        base = jnp.where(ord_ > 0, exsum[jnp.clip(ord_ - 1, 0, None)], 0)
        child = base + popc_below + 1
        alive = alive & has_child
        ord_ = jnp.where(alive, child, ord_)
        parents.append(jnp.where(alive, ord_, -1))

    if with_parents:
        return jnp.stack(parents, axis=-1)
    return jnp.where(alive, ord_, -1)


def to_dense(point_hierarchies, pyramids, input, level=-1, **kwargs):
    """Scatter level features into a dense grid (B, feature_dim, G, G, G).
    Differentiable in ``input``. Ref :138."""
    pyramids_np = np.asarray(pyramids)
    if level < 0:
        max_level = pyramids_np.shape[2] - 2
        level = max_level + 1 + level
    g = 2 ** level
    b = pyramids_np.shape[0]
    feat_dim = input.shape[-1]
    # per-batch point offsets in the packed hierarchy
    batch_sizes = pyramids_np[:, 1, -1]
    batch_offsets = np.concatenate([[0], np.cumsum(batch_sizes)])
    out = jnp.zeros((b, g, g, g, feat_dim), dtype=input.dtype)
    in_off = 0
    for i in range(b):
        start = batch_offsets[i] + int(pyramids_np[i, 1, level])
        num = int(pyramids_np[i, 0, level])
        pts = point_hierarchies[start:start + num].astype(jnp.int32)
        feats = input[in_off:in_off + num]
        out = out.at[i, pts[:, 0], pts[:, 1], pts[:, 2]].set(feats)
        in_off += num
    return jnp.transpose(out, (0, 4, 1, 2, 3))


def feature_grids_to_spc(feature_grids, masks=None):
    """Dense (B, C, X, Y, Z) grids → (octrees, lengths, packed features).
    Ref :189."""
    import math
    fg = np.asarray(feature_grids)
    b, c = fg.shape[:2]
    dims = fg.shape[2:]
    level = max(1, math.ceil(math.log2(max(dims))))
    g = 2 ** level
    padded = np.zeros((b, g, g, g, c), dtype=fg.dtype)
    padded[:, :dims[0], :dims[1], :dims[2]] = np.transpose(fg, (0, 2, 3, 4, 1))
    if masks is None:
        masks_np = np.any(padded != 0, axis=-1)
    else:
        masks_np = np.zeros((b, g, g, g), dtype=bool)
        masks_np[:, :dims[0], :dims[1], :dims[2]] = np.asarray(masks)

    from kaolin_tpu.ops.spc.points import unbatched_points_to_octree
    octrees, lengths, feats = [], [], []
    for i in range(b):
        coords = np.stack(np.nonzero(masks_np[i]), axis=-1)
        if coords.shape[0] == 0:
            octrees.append(np.zeros((1,), dtype=np.uint8))
            lengths.append(1)
            continue
        octree = np.asarray(unbatched_points_to_octree(coords, level))
        octrees.append(octree)
        lengths.append(octree.shape[0])
        m = np.asarray(points_to_morton(coords))
        order = np.argsort(m)
        feats.append(padded[i][tuple(coords[order].T)])
    features = (np.concatenate(feats, axis=0) if feats
                else np.zeros((0, c), dtype=fg.dtype))
    return (jnp.asarray(np.concatenate(octrees)),
            jnp.asarray(np.asarray(lengths, dtype=np.int32)),
            jnp.asarray(features))


def unbatched_make_dual(point_hierarchy, pyramid):
    """Dual octree (voxel corners) hierarchy + pyramid. Ref :343."""
    pyramid_np = np.asarray(pyramid)
    levels = pyramid_np.shape[1] - 1
    dual_points = []
    pyramid_dual = np.zeros_like(pyramid_np)
    for i in range(levels):
        pts = np.asarray(unbatched_get_level_points(point_hierarchy, pyramid_np, i))
        corners = np.asarray(points_to_corners(jnp.asarray(pts))).reshape(-1, 3)
        uniq = np.unique(corners, axis=0)
        m = np.asarray(points_to_morton(uniq))
        uniq = uniq[np.argsort(m)]
        dual_points.append(uniq)
        pyramid_dual[0, i] = uniq.shape[0]
        if i > 0:
            pyramid_dual[1, i] = pyramid_dual[0, i - 1] + pyramid_dual[1, i - 1]
    pyramid_dual[1, levels] = pyramid_dual[0, levels - 1] + pyramid_dual[1, levels - 1]
    return (jnp.asarray(np.concatenate(dual_points).astype(np.int16)),
            jnp.asarray(pyramid_dual))


def unbatched_make_trinkets(point_hierarchy, pyramid, point_hierarchy_dual,
                            pyramid_dual):
    """Indices from primary nodes to their 8 dual (corner) nodes, plus
    parent pointers. Ref :419."""
    pyramid_np = np.asarray(pyramid)
    pyramid_dual_np = np.asarray(pyramid_dual)
    levels = pyramid_np.shape[1] - 1
    trinkets = []
    parents = []
    for lvl in range(levels):
        pts = np.asarray(unbatched_get_level_points(point_hierarchy, pyramid_np, lvl))
        dual_pts = np.asarray(unbatched_get_level_points(
            point_hierarchy_dual, pyramid_dual_np, lvl))
        dual_m = np.asarray(points_to_morton(dual_pts))
        corners = np.asarray(points_to_corners(jnp.asarray(pts))).reshape(-1, 3)
        corner_m = np.asarray(points_to_morton(corners))
        idx = np.searchsorted(dual_m, corner_m)
        trinkets.append(idx.reshape(-1, 8) + pyramid_dual_np[1, lvl])
        # parents: points at lvl-1 that contain each point
        if lvl == 0:
            parents.append(np.full((pts.shape[0],), -1, dtype=np.int64))
        else:
            parent_pts = pts // 2
            prev = np.asarray(unbatched_get_level_points(
                point_hierarchy, pyramid_np, lvl - 1))
            prev_m = np.asarray(points_to_morton(prev))
            pm = np.asarray(points_to_morton(parent_pts))
            parents.append(np.searchsorted(prev_m, pm) + pyramid_np[1, lvl - 1])
    return (jnp.asarray(np.concatenate(trinkets).astype(np.int32)),
            jnp.asarray(np.concatenate(parents).astype(np.int32)))
