"""Bayesian-Fusion reconstruction of 3-state octrees from calibrated RGBD.

TPU-native analog of reference ``kaolin/ops/spc/bf_recon.py:27-429`` and the
CUDA kernels in ``csrc/ops/spc/bf_cuda.cu`` / ``recon_cuda.cu`` (oracleB :129,
oracleB_final :260, process_final_voxels :348, colorsB_final :407,
merge_empty :532, bq_merge :595, bq_extract :739, bq_touch :818, build_mip2d
recon_cuda.cu:149).

Algorithm (3DV 2016, "A Closed-Form Bayesian Fusion Equation Using Occupancy
Probabilities"): each calibrated depth map is carved into an octree whose
leaves carry occupancy probabilities from a quadratic-B-spline noise profile;
per-voxel state is one of {0: observed-empty, 1: unseen, 2: occupied}. The
octree is stored as paired byte tensors ``(octree, empty)``: octree bit set →
occupied; empty bit set (octree clear) → unseen; both clear → known empty.
Frames fuse pairwise with the closed-form probability product.

Design: the per-voxel math (projection, mip interval tests, profile curve,
probability fusion) runs vectorized in jnp (padded to power-of-2 sizes to
bound recompilation); the inherently sequential coarse-to-fine subdivision
and bottom-up byte assembly run host-side in numpy — the TPU analog of the
reference's many small CUDA launches driven from Python.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.spc.points import morton_to_points
from kaolin_tpu.ops.spc.spc import scan_octrees

__all__ = [
    "build_mip2d",
    "bf_recon",
    "process_frame",
    "fuse_bf",
    "extract_bq",
    "unbatched_query",
    "bq_profile",
    "dbq_profile",
]

_NEAR_CLIPPING = 0.15

# Bezier ordinates of the quadratic-B-spline CDF profile curve, packed as
# little-endian uchar4 per segment (bf.cpp SetupProfileCurve :150-163).
_BPS_VALS = np.array([
    0x02000000, 0x10080402, 0x30241810, 0x4f483c30, 0x5658564f,
    0x484e5456, 0x383c4248, 0x31323438, 0x30303031], dtype=np.uint32)
_BPS_TABLE = np.stack([(_BPS_VALS >> s) & 0xFF for s in (0, 8, 16, 24)],
                      axis=-1).astype(np.float32) / 255.0
_PC_SCALE = 2.65625  # 255/96


def bq_profile(x):
    """Bayesian-fusion profile curve (occupancy probability vs normalized
    signed distance). 0 for x<=-3, 0.5 for x>=6, cubic Bezier between.
    Kernel BQ, bf_cuda.cu:45."""
    table = jnp.asarray(_BPS_TABLE)
    u = x + 3.0
    iu = jnp.clip(jnp.trunc(u), 0, 8).astype(jnp.int32)
    t = jnp.clip(u - iu, 0.0, 1.0)
    s = 1.0 - t
    c = table[iu]
    val = _PC_SCALE * (s * s * (s * c[..., 0] + 3 * t * c[..., 1])
                       + t * t * (3 * s * c[..., 2] + t * c[..., 3]))
    return jnp.where(x <= -3.0, 0.0, jnp.where(x >= 6.0, 0.5, val))


def dbq_profile(x):
    """Derivative of the profile curve (de Casteljau). Kernel DBQ :71."""
    table = jnp.asarray(_BPS_TABLE)
    u = x + 3.0
    iu = jnp.clip(jnp.trunc(u), 0, 8).astype(jnp.int32)
    t = jnp.clip(u - iu, 0.0, 1.0)
    s = 1.0 - t
    c = table[iu]
    c10 = s * c[..., 0] + t * c[..., 1]
    c11 = s * c[..., 1] + t * c[..., 2]
    c12 = s * c[..., 2] + t * c[..., 3]
    c20 = s * c10 + t * c11
    c21 = s * c11 + t * c12
    val = _PC_SCALE * 3.0 * (c21 - c20)
    return jnp.where((x <= -3.0) | (x >= 6.0), 0.0, val)


def build_mip2d(depth_map, intrinsics, mip_levels, max_depth, true_depth=True):
    """Depth min/max mip pyramid. Ref recon_cuda.cu:149 (build_mip2d).

    Args:
        depth_map: (H, W) float ray depths (or z-depths if not true_depth).
        intrinsics: (4, 4) camera intrinsic matrix (row-vector convention:
            fx=In[0,0], fy=In[1,1], cx=In[2,0], cy=In[2,1]).
        mip_levels: number of pyramid levels.
        max_depth: sentinel for missed rays (kept unscaled).
        true_depth: if True, convert ray depth → z-depth via the per-pixel
            1/sqrt(u²+v²+1) factor before mipping.

    Returns:
        (adjusted_depth (H, W), mips): ``mips[l]`` for l=0..mip_levels-1 is
        (H/2^(l+1), W/2^(l+1), 2) with [min, max] per texel.
    """
    depth_map = jnp.asarray(depth_map, dtype=jnp.float32)
    h, w = depth_map.shape
    intrinsics = np.asarray(intrinsics, dtype=np.float32)
    fx, fy = float(intrinsics[0, 0]), float(intrinsics[1, 1])
    cx, cy = float(intrinsics[2, 0]), float(intrinsics[2, 1])

    if true_depth:
        xs = (jnp.arange(w, dtype=jnp.float32) - cx) / fx
        ys = (jnp.arange(h, dtype=jnp.float32) - cy) / fy
        u, v = jnp.meshgrid(xs, ys, indexing="xy")
        scale = jax.lax.rsqrt(u * u + v * v + 1.0)
        depth_map = jnp.where(depth_map == max_depth, depth_map,
                              depth_map * scale)

    mips = []
    cur_min = cur_max = depth_map
    for _ in range(mip_levels):
        hh, ww = cur_min.shape
        mn = cur_min.reshape(hh // 2, 2, ww // 2, 2).min(axis=(1, 3))
        mx = cur_max.reshape(hh // 2, 2, ww // 2, 2).max(axis=(1, 3))
        mips.append(jnp.stack([mn, mx], axis=-1))
        cur_min, cur_max = mn, mx
    return depth_map, tuple(mips)


def _camera_T(cam, level, dtype=np.float32):
    """T = M(level) @ Cam: voxel integer coords → pixel-homogeneous
    (row-vector convention). bf.cpp:247-253."""
    scale = 2.0 / (2.0 ** level)
    m = np.diag([scale, scale, scale, 1.0]).astype(dtype)
    m[3, :3] = -1.0
    return jnp.asarray(m @ np.asarray(cam, dtype=dtype))


def _transform_corners(points, t_mat):
    """(N, 3) int voxel coords → (N, 8, 3) pixel-space (x, y, z) of the 8
    corners, corner order i=(x<<2|y<<1|z). spc_math.h:485 (but projected)."""
    pts = points.astype(t_mat.dtype)
    base = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1) @ t_mat
    axes = t_mat[:3]  # rows X, Y, Z
    offs = jnp.asarray([[i >> 2, (i >> 1) & 1, i & 1] for i in range(8)],
                       dtype=t_mat.dtype)
    corners = base[:, None, :] + offs @ axes  # (N, 8, 4)
    z = corners[..., 2]
    return jnp.stack([corners[..., 0] / z, corners[..., 1] / z, z], axis=-1)


def _pad_pow2(n):
    p = 1
    while p < n:
        p *= 2
    return p


@functools.partial(jax.jit, static_argnames=("h", "w", "mip_levels"))
def _oracle_b_jit(points, t_mat, sigma, depth_map, mips_flat, mip_offsets,
                  mip_strides, h, w, mip_levels):
    q = _transform_corners(points, t_mat)          # (N, 8, 3)
    mn = jnp.min(q, axis=1)
    mx = jnp.max(q, axis=1)

    fully_in = ((mn[:, 0] >= 0.0) & (mx[:, 0] < w) & (mn[:, 1] >= 0.0)
                & (mx[:, 1] < h) & (mn[:, 2] > _NEAR_CLIPPING))
    fully_out = ((mx[:, 0] < 0.0) | (mn[:, 0] > w) | (mx[:, 1] < 0.0)
                 | (mn[:, 1] > h) | (mx[:, 2] < _NEAR_CLIPPING))

    ext = jnp.maximum(mx[:, 0] - mn[:, 0], mx[:, 1] - mn[:, 1])
    miplevel = jnp.maximum(jnp.ceil(jnp.log2(jnp.maximum(ext, 1e-20))),
                           0.0).astype(jnp.int32)
    ml = jnp.clip(miplevel, 0, mip_levels)
    adapt_inv = jnp.exp2(-ml.astype(jnp.float32))

    xmin = (adapt_inv * mn[:, 0]).astype(jnp.int32)
    ymin = (adapt_inv * mn[:, 1]).astype(jnp.int32)
    xmax = (adapt_inv * mx[:, 0]).astype(jnp.int32)
    ymax = (adapt_inv * mx[:, 1]).astype(jnp.int32)
    stride = mip_strides[ml]
    off = mip_offsets[ml]

    def texel(yy, xx):
        idx = off + yy * stride + xx
        return mips_flat[jnp.clip(idx, 0, mips_flat.shape[0] - 1)]

    d00 = texel(ymin, xmin)
    d10 = texel(ymin, xmax)
    d01 = texel(ymax, xmin)
    d11 = texel(ymax, xmax)
    z0 = jnp.minimum(jnp.minimum(d00[:, 0], d10[:, 0]),
                     jnp.minimum(d01[:, 0], d11[:, 0])) - sigma
    z1 = jnp.maximum(jnp.maximum(d00[:, 1], d10[:, 1]),
                     jnp.maximum(d01[:, 1], d11[:, 1])) + 2.0 * sigma
    v0 = mn[:, 2]
    v1 = mx[:, 2]

    in_band = (z0 <= v1) & (v0 <= z1)
    state_in = jnp.where(z0 > v1, 0, jnp.where(z1 < v0, 1, 2))
    occ_in = in_band.astype(jnp.int32)
    too_high = miplevel > mip_levels
    occ_in = jnp.where(too_high, 1, occ_in)
    state_in = jnp.where(too_high, 2, state_in)

    occ = jnp.where(fully_in, occ_in, jnp.where(fully_out, 0, 1))
    state = jnp.where(fully_in, state_in, jnp.where(fully_out, 1, 2))
    return occ.astype(jnp.int32), state.astype(jnp.int32)


def _oracle_b(points_np, level, sigma, cam, depth_map, mips):
    """Voxel visibility classification against the depth mip. Kernel
    d_OracleB (bf_cuda.cu:129). Returns numpy (occupancies, states)."""
    n = points_np.shape[0]
    npad = _pad_pow2(n)
    pts = np.zeros((npad, 3), dtype=np.int32)
    pts[:n] = points_np
    h, w = depth_map.shape
    mip_levels = len(mips)
    # flat buffer: level 0 = full-res depth (min=max=d), then mips[0..L-1]
    flats = [jnp.stack([depth_map, depth_map], -1).reshape(-1, 2)]
    offsets = [0]
    strides = [w]
    acc = flats[0].shape[0]
    for i, m in enumerate(mips):
        offsets.append(acc)
        strides.append(m.shape[1])
        flats.append(m.reshape(-1, 2))
        acc += flats[-1].shape[0]
    mips_flat = jnp.concatenate(flats, axis=0)
    occ, state = _oracle_b_jit(
        jnp.asarray(pts), _camera_T(cam, level), float(sigma),
        jnp.asarray(depth_map), mips_flat,
        jnp.asarray(offsets, dtype=jnp.int32),
        jnp.asarray(strides, dtype=jnp.int32), h, w, mip_levels)
    return np.asarray(occ)[:n], np.asarray(state)[:n]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _oracle_b_final_jit(points, t_mat, one_over_sigma, depth_map, h, w):
    q = _transform_corners(points, t_mat)  # (N, 8, 3)
    x = q[..., 0]
    y = q[..., 1]
    z = q[..., 2]
    inb = (x >= 0.0) & (x < w) & (y >= 0.0) & (y < h) & (z > _NEAR_CLIPPING)
    xi = jnp.clip(x.astype(jnp.int32), 0, w - 1)
    yi = jnp.clip(y.astype(jnp.int32), 0, h - 1)
    d = depth_map[yi, xi]
    prob = jnp.where(inb, bq_profile(one_over_sigma * (z - d)), 0.5)
    pmin = jnp.min(prob, axis=1)
    pmax = jnp.max(prob, axis=1)
    p0 = prob[:, 0]
    empty = pmax == 0.0
    unseen = (pmin == 0.5) & (pmax == 0.5)
    occ = jnp.where(empty | unseen, 0, 1).astype(jnp.int32)
    state = jnp.where(empty, 0, jnp.where(unseen, 1, 2)).astype(jnp.int32)
    return occ, state, p0


def _oracle_b_final(points_np, level, sigma, cam, depth_map):
    """Final-level probability classification. Kernel d_OracleBFinal :260."""
    n = points_np.shape[0]
    npad = _pad_pow2(n)
    pts = np.zeros((npad, 3), dtype=np.int32)
    pts[:n] = points_np
    h, w = depth_map.shape
    occ, state, probs = _oracle_b_final_jit(
        jnp.asarray(pts), _camera_T(cam, level), 3.0 / float(sigma),
        jnp.asarray(depth_map), h, w)
    return np.asarray(occ)[:n], np.asarray(state)[:n], np.asarray(probs)[:n]


@functools.partial(jax.jit, static_argnames=("h", "w"))
def _colors_b_final_jit(points, t_mat, one_over_sigma, image, depth_map,
                        probs, h, w):
    pts = points.astype(t_mat.dtype)
    base = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=1) @ t_mat
    qx = base[:, 0] / base[:, 2]
    qy = base[:, 1] / base[:, 2]
    qz = base[:, 2]
    x = qx.astype(jnp.int32)
    y = qy.astype(jnp.int32)
    inb = (x > 0) & (x < w - 1) & (y > 0) & (y < h - 1) \
        & (qz > _NEAR_CLIPPING)
    xs = jnp.clip(x, 1, w - 2)
    ys = jnp.clip(y, 1, h - 2)

    color = image[ys, xs]  # (N, 3) rgb in [0,1]
    d00 = depth_map[ys, xs]
    du = 0.5 * (depth_map[ys, xs + 1] - depth_map[ys, xs - 1])
    dv = 0.5 * (depth_map[ys + 1, xs] - depth_map[ys - 1, xs])
    dprob = dbq_profile(one_over_sigma * (qz - d00))
    zi = 1.0 / qz
    wgt = one_over_sigma * dprob * zi
    hx = -wgt * du
    hy = -wgt * dv
    hz = wgt * zi * (qz * qz + base[:, 0] * du + base[:, 1] * dv)
    hvec = jnp.stack([hx, hy, hz, jnp.zeros_like(hx)], axis=-1)
    grad = (t_mat @ hvec.T).T[:, :3]  # f = T * h (col-vector), kernel :483
    norm = jnp.linalg.norm(grad, axis=-1, keepdims=True)
    normal = grad / jnp.where(norm > 0, norm, 1.0)

    valid = inb & (probs != 0.0) & (probs != 0.5)
    gray = inb & (probs == 0.5)
    bgr = jnp.stack([color[:, 2], color[:, 1], color[:, 0],
                     jnp.zeros_like(color[:, 0])], axis=-1)
    colors_u8 = jnp.where(
        valid[:, None], (255.0 * bgr).astype(jnp.uint8),
        jnp.where((gray | ~inb)[:, None], jnp.uint8(64), jnp.uint8(0)))
    zero_col = inb & (probs == 0.0)
    colors_u8 = jnp.where(zero_col[:, None], jnp.uint8(0), colors_u8)
    normals = jnp.where(valid[:, None], normal, 0.0)
    return colors_u8, normals


def _colors_b_final(points_np, level, cam, sigma, image, depth_map, probs_np):
    """Per-voxel color + depth-gradient normal. Kernel d_ColorsBFinal :407."""
    n = points_np.shape[0]
    npad = _pad_pow2(n)
    pts = np.zeros((npad, 3), dtype=np.int32)
    pts[:n] = points_np
    probs = np.zeros((npad,), dtype=np.float32)
    probs[:n] = probs_np
    h, w = depth_map.shape
    colors, normals = _colors_b_final_jit(
        jnp.asarray(pts), _camera_T(cam, level), 3.0 / float(sigma),
        jnp.asarray(image, dtype=jnp.float32),
        jnp.asarray(depth_map, dtype=jnp.float32), jnp.asarray(probs), h, w)
    return np.asarray(colors)[:n], np.asarray(normals)[:n]


# ---------------------------------------------------------------------------
# 3-state octree walk
# ---------------------------------------------------------------------------

def identify_empty(octree, empty, exsum, coords, level):
    """Empty-aware octree walk (spc_utils.cuh:106): index >= 0 for occupied
    leaves, -1 for observed-empty space, -2-depth for unseen space (depth is
    the level below which the walk stopped). Jittable."""
    octree = jnp.asarray(octree)
    empty_t = jnp.asarray(empty)
    exsum = jnp.asarray(exsum)
    coords = coords.astype(jnp.int32)
    n = coords.shape[0]
    res = 2 ** level
    in_bounds = jnp.all((coords >= 0) & (coords < res), axis=-1)

    ord_ = jnp.zeros((n,), dtype=jnp.int32)
    result = jnp.where(in_bounds, jnp.int32(-(2 ** 30)), jnp.int32(-1))
    done = ~in_bounds
    for l in range(1, level + 1):
        shift = level - l
        o = (((coords[:, 0] >> shift) & 1) * 4
             + ((coords[:, 1] >> shift) & 1) * 2
             + ((coords[:, 2] >> shift) & 1)).astype(jnp.int32)
        byte = octree[ord_].astype(jnp.int32)
        ebyte = empty_t[ord_].astype(jnp.int32)
        has_child = ((byte >> o) & 1) == 1
        below = byte & ((1 << o) - 1)
        popc = jax.lax.population_count(below.astype(jnp.uint32)) \
            .astype(jnp.int32)
        base = jnp.where(ord_ > 0, exsum[jnp.clip(ord_ - 1, 0, None)], 0)
        child = base + popc + 1
        miss_val = jnp.where(((ebyte >> o) & 1) == 1,
                             jnp.int32(-2 - shift), jnp.int32(-1))
        result = jnp.where(~done & ~has_child, miss_val, result)
        done = done | ~has_child
        ord_ = jnp.where(~done, child, ord_)
    result = jnp.where(~done, ord_, result)
    return result


def unbatched_query(octree, empty, exsum, query_coords, level):
    """3-state query: returns hierarchy index if occupied, -1 if outside
    (observed empty), < -1 if inside/unseen. Ref bf_recon.py:388."""
    query_coords = jnp.asarray(query_coords)
    if jnp.issubdtype(query_coords.dtype, jnp.floating):
        coords = jnp.floor((query_coords + 1.0) * (2 ** level / 2.0)) \
            .astype(jnp.int32)
    else:
        coords = query_coords.astype(jnp.int32)
    return identify_empty(octree, empty, exsum, coords, level)


# ---------------------------------------------------------------------------
# bottom-up assembly (host): process_final_voxels + compactify_nodes
# ---------------------------------------------------------------------------

def _assemble(states, occ_idx, level):
    """Bottom-up build of (octree, empty) bytes from per-level voxel states.

    states[l]: (N_l,) int {0 empty, 1 unseen, 2 occupied} for enumerated
    voxels at level l (8 children per occupied level-(l-1) voxel, in order;
    level 0 has the single root). occ_idx[l]: indices into states[l] of the
    voxels that were subdivided (spawned the level-(l+1) groups).

    Kernel d_ProcessFinalVoxels (bf_cuda.cu:348) + compactify_nodes.
    Mutates states (parent promotion/demotion), returns (octree, empty).
    """
    oct_bytes = [None] * level   # bytes for nodes at levels 0..level-1
    emp_bytes = [None] * level
    keep_parent = [None] * level
    for l in range(level, 0, -1):
        s = states[l].reshape(-1, 8)          # (K, 8), K = len(occ_idx[l-1])
        bits = (s == 2).astype(np.uint8)
        ebits = (s >= 1).astype(np.uint8)
        weights = (1 << np.arange(8, dtype=np.uint8))
        ob = (bits * weights).sum(axis=1).astype(np.uint8)
        eb = (ebits * weights).sum(axis=1).astype(np.uint8)
        node_occ = bits.any(axis=1)
        parent_state = np.where(node_occ, 2, np.where(eb > 0, 1, 0))
        states[l - 1][occ_idx[l - 1]] = parent_state
        oct_bytes[l - 1] = ob
        emp_bytes[l - 1] = eb
        keep_parent[l - 1] = occ_idx[l - 1]
    # keep a node's byte iff its parent voxel is (still) occupied
    out_o, out_e = [], []
    for l in range(level):
        keep = states[l][keep_parent[l]] == 2
        out_o.append(oct_bytes[l][keep])
        out_e.append(emp_bytes[l][keep])
    return np.concatenate(out_o), np.concatenate(out_e)


def _child_points(points, occ):
    """Subdivide occupied voxels → children at next level (morton order) +
    parent indices. CUDA subdivide."""
    occ_idx = np.nonzero(occ)[0]
    parents = points[occ_idx]
    offs = np.array([[i >> 2, (i >> 1) & 1, i & 1] for i in range(8)],
                    dtype=points.dtype)
    children = (2 * parents[:, None, :] + offs[None]).reshape(-1, 3)
    return children, occ_idx


class BFReconstructionTerminatedException(Exception):
    """Raised internally when fusion degenerates (no occupied voxels)."""


def _finalize(states, occ_idx, level, probs, colors, normals):
    final_keep = states[level] == 2
    octree, empty = _assemble(states, occ_idx, level)
    if octree.size == 0 or int(octree[0]) == 0:
        raise BFReconstructionTerminatedException()
    out_level, pyramid, exsum = scan_octrees(
        jnp.asarray(octree), np.array([len(octree)], dtype=np.int32))
    return {
        "octree": octree,
        "empty": empty,
        "level": int(out_level),
        "pyramid": np.asarray(pyramid)[0],
        "exsum": np.asarray(exsum),
        "probabilities": probs[final_keep],
        "colors": colors[final_keep],
        "normals": normals[final_keep],
    }


def process_frame(batch, level, sigma):
    """Carve one calibrated RGBD frame into a 3-state SPC. Ref :27."""
    (image, depth_map, cam, intrinsics, max_depth, mip_levels, true_depth,
     start_level, points) = batch[:9]
    image = np.asarray(image, dtype=np.float32)
    cam = np.asarray(cam, dtype=np.float32)
    points = np.asarray(points, dtype=np.int32)

    depth_adj, mips = build_mip2d(depth_map, intrinsics, mip_levels,
                                  float(max_depth), bool(true_depth))
    depth_np = np.asarray(depth_adj)

    states = []
    occ_idx = []
    for l in range(start_level):
        states.append(np.full((8 ** l,), 2, dtype=np.int32))
        occ_idx.append(np.arange(8 ** l, dtype=np.int64))

    for l in range(start_level, level):
        occ, st = _oracle_b(points, l, sigma, cam, depth_np, mips)
        if occ.sum() == 0:
            raise BFReconstructionTerminatedException()
        states.append(st.astype(np.int32))
        points, oi = _child_points(points, occ)
        occ_idx.append(oi)

    occ, st, probs = _oracle_b_final(points, level, sigma, cam, depth_np)
    if occ.sum() == 0:
        raise BFReconstructionTerminatedException()
    states.append(st.astype(np.int32))

    kept = np.nonzero(occ)[0]
    probs_kept = probs[kept]
    colors_kept, normals_kept = _colors_b_final(
        points[kept], level, cam, sigma, image, depth_np, probs_kept)
    # expand back to full final-level enumeration for _finalize masking
    probs_full = np.zeros((points.shape[0],), dtype=np.float32)
    probs_full[kept] = probs_kept
    colors_full = np.zeros((points.shape[0], 4), dtype=np.uint8)
    colors_full[kept] = colors_kept
    normals_full = np.zeros((points.shape[0], 3), dtype=np.float32)
    normals_full[kept] = normals_kept

    return _finalize(states, occ_idx, level, probs_full, colors_full,
                     normals_full)


@functools.partial(jax.jit, static_argnames=("level",))
def _merge_states_jit(points, octree0, empty0, exsum0, octree1, empty1,
                      exsum1, level):
    id0 = identify_empty(octree0, empty0, exsum0, points, level)
    id1 = identify_empty(octree1, empty1, exsum1, points, level)
    any_empty = (id0 == -1) | (id1 == -1)
    both_unseen = (id0 < -1) & (id1 < -1)
    occ = jnp.where(any_empty | both_unseen, 0, 1).astype(jnp.int32)
    state = jnp.where(any_empty, 0,
                      jnp.where(both_unseen, 1, 2)).astype(jnp.int32)
    return occ, state, id0, id1


def _merge_level(points_np, level, spc0, spc1):
    n = points_np.shape[0]
    npad = _pad_pow2(n)
    pts = np.full((npad, 3), -1, dtype=np.int32)
    pts[:n] = points_np
    occ, st, id0, id1 = _merge_states_jit(
        jnp.asarray(pts), jnp.asarray(spc0["octree"]),
        jnp.asarray(spc0["empty"]), jnp.asarray(spc0["exsum"]),
        jnp.asarray(spc1["octree"]), jnp.asarray(spc1["empty"]),
        jnp.asarray(spc1["exsum"]), level)
    return (np.asarray(occ)[:n], np.asarray(st)[:n],
            np.asarray(id0)[:n], np.asarray(id1)[:n])


def fuse_bf(spc0, spc1, start_level=4):
    """Fuse two 3-state SPCs with the closed-form Bayesian product. Ref :129
    (fuseBF) + kernels d_MergeEmpty :532, d_BQMerge :595."""
    level = spc0["level"]
    points = np.asarray(morton_to_points(
        jnp.arange(8 ** start_level)), dtype=np.int32)

    states = []
    occ_idx = []
    for l in range(start_level):
        states.append(np.full((8 ** l,), 2, dtype=np.int32))
        occ_idx.append(np.arange(8 ** l, dtype=np.int64))

    for l in range(start_level, level):
        occ, st, _, _ = _merge_level(points, l, spc0, spc1)
        if occ.max(initial=0) == 0:
            raise BFReconstructionTerminatedException()
        states.append(st.astype(np.int32))
        points, oi = _child_points(points, occ)
        occ_idx.append(oi)

    occ, st, id0, id1 = _merge_level(points, level, spc0, spc1)
    if occ.max(initial=0) == 0:
        raise BFReconstructionTerminatedException()
    states.append(st.astype(np.int32))

    # bq_merge probability fusion + feature selection (kernel :595)
    off0 = int(spc0["pyramid"][1, level])
    off1 = int(spc1["pyramid"][1, level])
    i0p = np.clip(id0 - off0, 0, max(0, len(spc0["probabilities"]) - 1))
    i1p = np.clip(id1 - off1, 0, max(0, len(spc1["probabilities"]) - 1))
    p0 = np.where(id0 >= 0, spc0["probabilities"][i0p],
                  np.where(id0 < -1, 0.5, 0.0)).astype(np.float32)
    p1 = np.where(id1 >= 0, spc1["probabilities"][i1p],
                  np.where(id1 < -1, 0.5, 0.0)).astype(np.float32)
    denom = p0 * p1 + (1.0 - p0) * (1.0 - p1)
    probs = np.where(denom > 0, p0 * p1 / np.where(denom > 0, denom, 1.0),
                     0.0)
    use0 = id0 >= 0
    i0 = np.clip(id0 - off0, 0, max(0, len(spc0["colors"]) - 1))
    i1 = np.clip(id1 - off1, 0, max(0, len(spc1["colors"]) - 1))
    colors = np.where(use0[:, None], spc0["colors"][i0], spc1["colors"][i1])
    normals = np.where(use0[:, None], spc0["normals"][i0],
                       spc1["normals"][i1])
    probs = np.where(st == 2, probs, 0.0).astype(np.float32)

    return _finalize(states, occ_idx, level, probs,
                     colors.astype(np.uint8), normals.astype(np.float32))


def extract_bq(spcd):
    """Extract the iso-surface voxels (probability 0.5 crossings of the dual
    grid) from a fused 3-state SPC. Ref :232 (extractBQ) + kernels
    d_BQTouch :818, d_BQExtract :739."""
    level = spcd["level"]
    octree = np.asarray(spcd["octree"])
    empty = np.asarray(spcd["empty"])
    exsum = np.asarray(spcd["exsum"])
    pyramid = np.asarray(spcd["pyramid"])
    probs_in = np.asarray(spcd["probabilities"])

    states = [np.full((1,), 2, dtype=np.int32)]
    occ_idx = [np.arange(1, dtype=np.int64)]
    points = np.asarray(morton_to_points(jnp.arange(8)), dtype=np.int32)

    # descent via bq_touch: states of the 8 children of each occupied node
    for l in range(1, level + 1):
        # bytes for nodes at level l-1 live at hierarchy positions of the
        # occupied level-(l-1) voxels; byte index == hierarchy index
        start = int(pyramid[1, l - 1])
        num = int(pyramid[0, l - 1])
        idx = np.arange(start, start + num)
        obits = octree[idx]
        ebits = empty[idx]
        child_i = np.arange(8)
        o = (obits[:, None] >> child_i[None]) & 1
        e = (ebits[:, None] >> child_i[None]) & 1
        st = np.where(o == 1, 2, np.where(e == 1, 1, 0)).astype(np.int32)
        st = st.reshape(-1)
        occ = (st == 2).astype(np.int32)
        if l < level:
            states.append(st)
            points, oi = _child_points(points, occ)
            occ_idx.append(oi)
        else:
            kept = np.nonzero(occ)[0]
            vox = points[kept]
            # bq_extract on occupied final voxels: dual-cell prob crossing
            n = vox.shape[0]
            npad = _pad_pow2(max(n, 1))
            pts = np.full((npad, 3), -1, dtype=np.int32)
            pts[:n] = vox
            offs = np.array([[i >> 2, (i >> 1) & 1, i & 1]
                             for i in range(8)], dtype=np.int32)
            corner_pts = (pts[:, None, :] + offs[None]).reshape(-1, 3)
            ids = np.asarray(identify_empty(
                jnp.asarray(octree), jnp.asarray(empty), jnp.asarray(exsum),
                jnp.asarray(corner_pts), level)).reshape(npad, 8)[:n]
            off = int(pyramid[1, level])
            pr = np.where(
                ids >= 0,
                probs_in[np.clip(ids - off, 0, max(0, len(probs_in) - 1))],
                np.where(ids == -1, 0.0, 0.5)).astype(np.float32)
            pmin = pr.min(axis=1)
            pmax = pr.max(axis=1)
            surf = (pmin < 0.5) & (0.5 < pmax)
            new_st = np.where(surf, 2,
                              np.where(pmax <= 0.5, 0, 1)).astype(np.int32)
            if not surf.any():
                raise BFReconstructionTerminatedException()
            full_st = st.copy()
            full_st[kept] = new_st
            states.append(full_st)
            colors = np.asarray(spcd["colors"])[surf]
            normals = np.asarray(spcd["normals"])[surf]

    out_octree, out_empty = _assemble(states, occ_idx, level)
    return out_octree, out_empty, colors, normals


def bf_recon(input_dataset, final_level, sigma):
    """Reconstruct a 3-state SPC from calibrated RGBD views. Ref :321.

    Args:
        input_dataset: iterable of frame batches (see RayTracedSPCDataset);
            batch[9] is the any-ray-hit flag.
        final_level: octree depth.
        sigma: depth noise level.

    Returns:
        (octree uint8, empty uint8, colors (n,4) uint8, normals (n,3) f32)
        or (None, None, None, None) if fusion degenerates.
    """
    try:
        spc0 = None
        for batch in input_dataset:
            if not bool(batch[9]):
                continue
            frame = process_frame(batch, final_level, sigma)
            spc0 = frame if spc0 is None else fuse_bf(spc0, frame)
        if spc0 is None:
            return None, None, None, None
        return (spc0["octree"], spc0["empty"], spc0["colors"],
                spc0["normals"])
    except BFReconstructionTerminatedException:
        return None, None, None, None


# reference camelCase aliases (bf_recon.py:27,129,232)
processFrame = process_frame
fuseBF = fuse_bf
extractBQ = extract_bq

from kaolin_tpu.ops.spc.exsum_compat import ensure_current_exsum  # noqa: F401,E402
