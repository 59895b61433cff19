"""SPC octree raytracing + packed ray operations.

TPU-native analog of reference ``kaolin/render/spc/raytrace.py`` backed by
``csrc/render/spc/raytrace_cuda.cu:505-630``.

The reference runs a breadth-first per-level loop {ray/AABB decide kernel →
CUB scan → subdivide/compactify}; the same algorithm here uses
capacity-bounded nugget buffers (SURVEY §7): each level expands active
(ray, node) pairs into their 8 children visited in per-ray front-to-back
octant order (bit-XOR traversal-order trick), then compacts with
``jnp.nonzero(..., size=capacity)``. Order is preserved, so emitted nuggets
are depth-sorted per ray exactly like the CUDA kernel.

Packed ray ops (mark_pack_boundaries, diff, sum/prod_reduce, cumsum, cumprod)
are segment operations over boundary masks: segment_sum and a segmented
associative scan replace the custom CUDA kernels, fully differentiable.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "unbatched_raytrace",
    "raytrace_overflow_report",
    "mark_pack_boundaries",
    "diff",
    "sum_reduce",
    "prod_reduce",
    "cumsum",
    "cumprod",
    "exponential_integration",
]


# ---------------------------------------------------------------------------
# raytracing
# ---------------------------------------------------------------------------

def _ray_aabb(origin, inv_dir, bmin, bmax):
    """Slab test. origin/inv_dir (..., 3); bmin/bmax (..., 3).
    Returns (hit, t_entry, t_exit)."""
    t0 = (bmin - origin) * inv_dir
    t1 = (bmax - origin) * inv_dir
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    return hit, tmin, tmax


@functools.partial(jax.jit,
                   static_argnames=("level", "capacity", "return_exit"))
def _raytrace_fixed(octree, exsum, origin, direction, level, capacity,
                    return_exit=False):
    """Jittable fixed-capacity traversal. Returns (ridx, pidx, t_entry,
    t_exit, valid, level_counts, overflowed):

    - ``level_counts`` (level,) int32 — TRUE number of surviving (ray, node)
      candidates after each level's decide step (exact up to and including
      the first overflowing level);
    - ``overflowed`` bool — some level produced more candidates than
      ``capacity`` and truncated (results are incomplete)."""
    num_rays = origin.shape[0]
    dtype = origin.dtype
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) > 1e-12, direction,
                              jnp.where(direction >= 0, 1e-12, -1e-12))
    # per-ray front-to-back octant visit order: o ^ mask, mask bits set where
    # the ray direction is negative along (x, y, z)
    neg_mask = ((direction[:, 0] < 0).astype(jnp.int32) * 4
                + (direction[:, 1] < 0).astype(jnp.int32) * 2
                + (direction[:, 2] < 0).astype(jnp.int32))  # (R,)

    octant = jnp.arange(8, dtype=jnp.int32)
    octant_off = jnp.stack([(octant >> 2) & 1, (octant >> 1) & 1, octant & 1],
                           axis=-1).astype(jnp.int32)  # (8, 3)

    # initial level-0 state: every ray against the root cell [-1, 1]^3
    root_hit, _, _ = _ray_aabb(origin, inv_dir,
                               jnp.full((num_rays, 3), -1.0, dtype),
                               jnp.full((num_rays, 3), 1.0, dtype))
    cap0 = num_rays
    ridx = jnp.arange(num_rays, dtype=jnp.int32)
    nidx = jnp.zeros((num_rays,), dtype=jnp.int32)   # byte/point index
    coords = jnp.zeros((num_rays, 3), dtype=jnp.int32)
    valid = root_hit

    level_counts = []
    overflowed = jnp.asarray(False)
    for l in range(level):
        c = ridx.shape[0]
        cell = 2.0 / (2 ** (l + 1))  # child cell size in [-1, 1] space
        byte = octree[nidx].astype(jnp.int32)  # (C,)
        # front-to-back child octants per entry: (C, 8)
        child_oct = octant[None, :] ^ neg_mask[ridx][:, None]
        has_child = ((byte[:, None] >> child_oct) & 1) == 1
        child_coords = (coords[:, None, :] * 2
                        + jnp.stack([(child_oct >> 2) & 1,
                                     (child_oct >> 1) & 1,
                                     child_oct & 1], axis=-1))  # (C, 8, 3)
        bmin = child_coords.astype(dtype) * cell - 1.0
        bmax = bmin + cell
        o = origin[ridx][:, None, :]
        idir = inv_dir[ridx][:, None, :]
        hit, t_in, t_out = _ray_aabb(o, idir, bmin, bmax)
        cand_valid = valid[:, None] & has_child & hit  # (C, 8)

        below = byte[:, None] & ((1 << child_oct) - 1)
        popc = jax.lax.population_count(below.astype(jnp.uint32)).astype(jnp.int32)
        base = jnp.where(nidx > 0, exsum[jnp.clip(nidx - 1, 0, None)], 0)
        child_nidx = base[:, None] + popc + 1  # (C, 8)

        flat_valid = cand_valid.reshape(-1)
        true_count = jnp.sum(flat_valid.astype(jnp.int32))
        new_cap = min(capacity, c * 8)
        overflowed = overflowed | (true_count > new_cap)
        level_counts.append(true_count)
        sel = jnp.nonzero(flat_valid, size=new_cap, fill_value=c * 8)[0]
        in_range = sel < c * 8
        sel_safe = jnp.where(in_range, sel, 0)
        parent = sel_safe // 8

        ridx = jnp.where(in_range, ridx[parent], 0)
        nidx = jnp.where(in_range, child_nidx.reshape(-1)[sel_safe], 0)
        coords = jnp.where(in_range[:, None],
                           child_coords.reshape(-1, 3)[sel_safe], 0)
        valid = in_range

    # final depths
    cell = 2.0 / (2 ** level)
    bmin = coords.astype(dtype) * cell - 1.0
    bmax = bmin + cell
    _, t_in, t_out = _ray_aabb(origin[ridx], inv_dir[ridx], bmin, bmax)
    return (ridx, nidx, t_in, t_out, valid,
            jnp.stack(level_counts) if level_counts
            else jnp.zeros((0,), jnp.int32), overflowed)


@functools.partial(jax.jit, static_argnames=("level", "capacity"))
def _raytrace_frontier(octree, exsum, origin, direction, level, capacity):
    """Global compacted-frontier BFS traversal.

    Dispatch policy: :func:`unbatched_raytrace` with ``max_nuggets=None``
    uses THIS path whenever its packed-int32 guards hold (level <= 10,
    ``8 * num_nodes < 2**23``), growing the capacity on overflow, and falls
    back to ``_raytrace_perray`` otherwise. ``max_nuggets=<int>`` always
    selects ``_raytrace_fixed`` (the explicit-capacity oracle).

    Work per level is proportional to the TRUE active (ray, node) count (the
    reference CUDA loop's property, ``raytrace_cuda.cu:505-630``), not to
    ``num_rays × slots`` (``_raytrace_perray``) nor to padded capacity
    blow-ups (``_raytrace_fixed``).  Measured v5-lite profile notes that
    shaped this formulation (512² rays, level-9 shell, ~860k active/level):

    * every state channel is a flat ``(C,)`` int32/f32 array — NO trailing
      small dims anywhere.  ``(C, 8)`` / ``(C, 8, 3)`` intermediates tile to
      ``(8, 128)`` TPU lanes at 16-42x memory waste and measured 170
      ms/level in ``_raytrace_fixed``; per-octant ``(C,)`` arrays from an
      unrolled 8-step loop fuse cleanly instead.
    * packed fields: cell coords ride ``x | y<<10 | z<<20`` in one int32
      (valid for level ≤ 10), ray id and octant-visit mask share
      ``rstate = ridx << 3 | neg``, and the per-node record
      ``prev_exsum << 8 | child_byte`` makes the octree lookup ONE gather.
    * compaction is one 8C-element token scatter (token = parent slot ×8 +
      octant) + three C-element parent gathers, instead of a
      ``jnp.nonzero`` + per-channel gathers over (C, 8)-padded buffers.
    * the slab test is recomputed from integer coords each level (exact —
      carrying t-intervals through the subdivision averages catastrophic
      cancellation into them for axis-aligned rays).

    Returns (ridx, nidx, t_in, t_out, valid, level_counts, overflowed) with
    nuggets ray-major and front-to-back per ray (the visit order
    ``child = v XOR neg`` enumerates children near-to-far along the ray).
    """
    num_rays = origin.shape[0]
    dtype = origin.dtype
    c = int(capacity)
    if level > 10:
        raise NotImplementedError("packed coords support level <= 10")
    if 8 * octree.shape[0] >= (1 << 23) or c >= (1 << 26):
        # c < 2^26 keeps the scatter sentinel 9c + 8c below int32 range
        raise NotImplementedError("octree/capacity too large for packed "
                                  "int32 records")

    inv_dir = 1.0 / jnp.where(jnp.abs(direction) > 1e-12, direction,
                              jnp.where(direction >= 0, 1e-12, -1e-12))
    neg_mask = ((direction[:, 0] < 0).astype(jnp.int32) * 4
                + (direction[:, 1] < 0).astype(jnp.int32) * 2
                + (direction[:, 2] < 0).astype(jnp.int32))  # (R,)
    # flat per-ray channels for the per-level re-fetch
    ox, oy, oz = origin[:, 0], origin[:, 1], origin[:, 2]
    ix, iy, iz = inv_dir[:, 0], inv_dir[:, 1], inv_dir[:, 2]

    oc = octree.astype(jnp.int32) & 0xFF
    prev_ex = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), exsum[:-1].astype(jnp.int32)])
    node_tab = (prev_ex << 8) | oc

    # initial frontier: every ray against the root cell, ray-major order
    root_hit, _, _ = _ray_aabb(origin, inv_dir,
                               jnp.full((num_rays, 3), -1.0, dtype),
                               jnp.full((num_rays, 3), 1.0, dtype))
    if c < num_rays:
        raise ValueError(f"capacity {c} < num_rays {num_rays}")
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0).squeeze(-1)
    pad = (0, c - num_rays)
    pc = jnp.zeros((c,), jnp.int32)
    nidx = jnp.zeros((c,), jnp.int32)
    rstate = jnp.pad((jnp.arange(num_rays, dtype=jnp.int32) << 3) | neg_mask,
                     pad)
    mask = jnp.pad(root_hit, pad)

    level_counts = []
    overflowed = jnp.asarray(False)
    for l in range(level):
        cellw = 2.0 / (2 ** (l + 1))
        nt = node_tab[nidx]                                  # (C,) gather
        byte = nt & 0xFF
        neg = rstate & 7
        ridx = rstate >> 3
        rox, roy, roz = ox[ridx], oy[ridx], oz[ridx]         # 6 (C,) gathers
        rix, riy, riz = ix[ridx], iy[ridx], iz[ridx]

        # pass 1: candidate masks per visit position (front-to-back)
        cands = []
        for v in range(8):
            child = jnp.int32(v) ^ neg                       # (C,)
            has = ((byte >> child) & 1) == 1
            child_off = (((child >> 2) & 1) | (((child >> 1) & 1) << 10)
                         | ((child & 1) << 20))
            cpc = (pc << 1) + child_off
            bx = (cpc & 1023).astype(dtype) * cellw - 1.0
            by = ((cpc >> 10) & 1023).astype(dtype) * cellw - 1.0
            bz = (cpc >> 20).astype(dtype) * cellw - 1.0
            tx0 = (bx - rox) * rix
            tx1 = (bx + cellw - rox) * rix
            ty0 = (by - roy) * riy
            ty1 = (by + cellw - roy) * riy
            tz0 = (bz - roz) * riz
            tz1 = (bz + cellw - roz) * riz
            tmin = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                           jnp.minimum(ty0, ty1)),
                               jnp.minimum(tz0, tz1))
            tmax = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                           jnp.maximum(ty0, ty1)),
                               jnp.maximum(tz0, tz1))
            hit = tmax >= jnp.maximum(tmin, 0.0)
            cands.append(mask & has & hit)

        cnt = cands[0].astype(jnp.int32)
        for v in range(1, 8):
            cnt = cnt + cands[v].astype(jnp.int32)
        off = jnp.cumsum(cnt) - cnt                          # exclusive
        total = off[-1] + cnt[-1]
        level_counts.append(total)
        overflowed = overflowed | (total > c)

        # pass 2: token scatter (token = slot*8 + visit pos; +1 so 0 = empty).
        # Inactive lanes get DISTINCT out-of-range destinations (c + lane id)
        # so the unique_indices promise genuinely holds — mode="drop"
        # discards them all, but duplicated sentinels would be UB.
        wr = jnp.zeros((c,), jnp.int32)
        dests, tokens = [], []
        for v in range(8):
            cv = cands[v]
            lane = (iota_c << 3) | v
            # active overflow dests reach at most 8c; 9c + lane stays clear
            dests.append(jnp.where(cv, off + wr, 9 * c + lane))
            tokens.append(lane)
            wr = wr + cv.astype(jnp.int32)
        token_buf = jnp.zeros((c,), jnp.int32).at[
            jnp.concatenate(dests)].set(
            jnp.concatenate([t + 1 for t in tokens]),
            mode="drop", unique_indices=True)

        new_mask = iota_c < jnp.minimum(total, c)
        tok = jnp.where(new_mask, token_buf - 1, 0)
        p = tok >> 3
        vpos = tok & 7
        pc_p = pc[p]                                         # 3 (C,) gathers
        nt_p = nt[p]
        rstate_p = rstate[p]
        child = vpos ^ (rstate_p & 7)
        child_off = (((child >> 2) & 1) | (((child >> 1) & 1) << 10)
                     | ((child & 1) << 20))
        pc = (pc_p << 1) + child_off
        below = (nt_p & 0xFF) & ((1 << child) - 1)
        popc = jax.lax.population_count(below.astype(jnp.uint32)) \
            .astype(jnp.int32)
        nidx = (nt_p >> 8) + popc + 1
        rstate = rstate_p
        mask = new_mask

    # final depths (exact slab from integer coords)
    cellw = 2.0 / (2 ** level)
    ridx = rstate >> 3
    rox, roy, roz = ox[ridx], oy[ridx], oz[ridx]
    rix, riy, riz = ix[ridx], iy[ridx], iz[ridx]
    bx = (pc & 1023).astype(dtype) * cellw - 1.0
    by = ((pc >> 10) & 1023).astype(dtype) * cellw - 1.0
    bz = (pc >> 20).astype(dtype) * cellw - 1.0
    tx0 = (bx - rox) * rix
    tx1 = (bx + cellw - rox) * rix
    ty0 = (by - roy) * riy
    ty1 = (by + cellw - roy) * riy
    tz0 = (bz - roz) * riz
    tz1 = (bz + cellw - roz) * riz
    t_in = jnp.maximum(jnp.maximum(jnp.minimum(tx0, tx1),
                                   jnp.minimum(ty0, ty1)),
                       jnp.minimum(tz0, tz1))
    t_out = jnp.minimum(jnp.minimum(jnp.maximum(tx0, tx1),
                                    jnp.maximum(ty0, ty1)),
                        jnp.maximum(tz0, tz1))
    return (ridx, nidx, t_in, t_out, mask,
            jnp.stack(level_counts) if level_counts
            else jnp.zeros((0,), jnp.int32), overflowed)


@functools.partial(jax.jit, static_argnames=("level", "slots", "compaction"))
def _raytrace_perray(octree, exsum, origin, direction, level, slots,
                     compaction="sort"):
    """Per-ray fixed-slot BFS traversal — the fallback when
    ``_raytrace_frontier``'s packed-int32 guards don't hold (level > 10 or
    huge octrees), and the path of record for (R, K)-shaped consumers like
    ``bench.py``'s depth render.

    The capacity-buffer formulation above compacts ALL rays' candidates with
    one global ``jnp.nonzero`` per level (a full-capacity scan + scatter,
    ~8x capacity elements touched per level). Here every ray owns ``slots``
    (K) active-node slots: each level expands (R, K) nodes to (R, K*8)
    children and compacts *within each row* — no cross-ray communication,
    no global scans, work ∝ R*K*8 per level with tiny constants. For closed
    surfaces a ray pierces O(1) cells per level, so K stays ~8-32 regardless
    of resolution.

    ``compaction`` selects the row-local compaction: ``"sort"`` (one
    ``lax.sort`` over the K·8-wide row per level) or ``"rank"`` (cumsum
    rank + K masked reductions — fewer passes than a bitonic sort's ~log²
    stages when K is small; both produce the identical front-to-back
    order).

    Returns (nidx (R, K) int32, morton (R, K) int32, t_in (R, K),
    t_out (R, K), valid (R, K) bool, overflowed bool) — per-ray nuggets in
    front-to-back order; ``overflowed`` True when some ray needed more than
    K slots at some level (results truncated for that ray).
    """
    num_rays = origin.shape[0]
    dtype = origin.dtype
    k = slots
    inv_dir = 1.0 / jnp.where(jnp.abs(direction) > 1e-12, direction,
                              jnp.where(direction >= 0, 1e-12, -1e-12))
    neg_mask = ((direction[:, 0] < 0).astype(jnp.int32) * 4
                + (direction[:, 1] < 0).astype(jnp.int32) * 2
                + (direction[:, 2] < 0).astype(jnp.int32))  # (R,)
    octant = jnp.arange(8, dtype=jnp.int32)

    # combined per-node record (prev_exsum << 8 | child_mask): ONE (R, K)
    # gather per level instead of two (byte + exsum base). prev_exsum[i] is
    # exactly the `base` the old code computed (0 for the root). Fits int32
    # whenever 8 * num_nodes < 2^23 (any realistic SPC; guarded statically).
    oc = octree.astype(jnp.int32) & 0xFF
    prev_ex = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), exsum[:-1].astype(jnp.int32)])
    combine_nodes = 8 * octree.shape[0] < (1 << 23)
    node_tab = (prev_ex << 8) | oc if combine_nodes else None

    # cell coords ride packed as x | y<<10 | z<<20 (10-bit fields hold any
    # level <= 10 with no cross-field carry in the *2+off child update);
    # unpacking is 5 int ops vs the 3*(l+1)*3-op morton decode per level
    packed_ok = level <= 10

    def unpack(pc):
        return jnp.stack([pc & 1023, (pc >> 10) & 1023, pc >> 20], axis=-1)

    root_hit, _, _ = _ray_aabb(origin, inv_dir,
                               jnp.full((num_rays, 3), -1.0, dtype),
                               jnp.full((num_rays, 3), 1.0, dtype))
    nidx = jnp.zeros((num_rays, k), jnp.int32)
    pc = jnp.zeros((num_rays, k), jnp.int32)     # packed coords (or morton)
    valid = jnp.zeros((num_rays, k), bool).at[:, 0].set(root_hit)
    overflowed = jnp.asarray(False)

    def decode_morton(m, nbits):
        """(..., ) int32 morton → (..., 3) int32 cell coords."""
        out = []
        for axis in (2, 1, 0):  # x, y, z at bit offsets 2, 1, 0
            v = jnp.zeros_like(m)
            for b in range(nbits):
                v = v | (((m >> (3 * b + axis)) & 1) << b)
            out.append(v)
        return jnp.stack(out, axis=-1)

    big = jnp.int32(8 * k)
    for l in range(level):
        cell = 2.0 / (2 ** (l + 1))
        safe_n = jnp.where(valid, nidx, 0)
        if combine_nodes:
            rec = node_tab[safe_n]                             # (R, K)
            byte = rec & 0xFF
            base = rec >> 8
        else:
            byte = octree[safe_n].astype(jnp.int32)
            base = jnp.where(nidx > 0, exsum[jnp.clip(nidx - 1, 0, None)], 0)
        child_oct = (octant[None, None, :]
                     ^ neg_mask[:, None, None])                # (R, K, 8)
        has_child = ((byte[..., None] >> child_oct) & 1) == 1
        if packed_ok:
            child_off = ((child_oct >> 2) & 1) \
                | (((child_oct >> 1) & 1) << 10) | ((child_oct & 1) << 20)
            child_pc = (pc[..., None] << 1) + child_off        # (R, K, 8)
            coords = unpack(child_pc)                          # (R, K, 8, 3)
        else:
            child_pc = (pc[..., None] << 3) | child_oct        # morton
            coords = decode_morton(child_pc, l + 1)
        bmin = coords.astype(dtype) * cell - 1.0
        hit, _, _ = _ray_aabb(origin[:, None, None, :],
                              inv_dir[:, None, None, :], bmin, bmin + cell)
        cand = valid[..., None] & has_child & hit              # (R, K, 8)

        below = byte[..., None] & ((1 << child_oct) - 1)
        popc = jax.lax.population_count(below.astype(jnp.uint32)) \
            .astype(jnp.int32)
        child_n = base[..., None] + popc + 1                   # (R, K, 8)

        flat_cand = cand.reshape(num_rays, k * 8)
        count = jnp.sum(flat_cand.astype(jnp.int32), axis=-1)  # per ray
        overflowed = overflowed | jnp.any(count > k)
        # row-local front-to-back order: slot-major then octant order
        if compaction == "rank":
            rank = jnp.cumsum(flat_cand.astype(jnp.int32), axis=-1)
            flat_pc = child_pc.reshape(num_rays, k * 8)
            flat_n = child_n.reshape(num_rays, k * 8)
            pc_cols, n_cols = [], []
            for j in range(k):
                sel = flat_cand & (rank == j + 1)
                pc_cols.append(jnp.sum(jnp.where(sel, flat_pc, 0), axis=-1))
                n_cols.append(jnp.sum(jnp.where(sel, flat_n, 0), axis=-1))
            nidx = jnp.stack(n_cols, axis=-1)
            pc = jnp.stack(pc_cols, axis=-1)
            valid = (jnp.arange(k, dtype=jnp.int32)[None, :]
                     < jnp.minimum(count, k)[:, None])
        else:
            key = jnp.where(flat_cand,
                            jax.lax.broadcasted_iota(jnp.int32,
                                                     (num_rays, k * 8), 1),
                            big)
            key_s, p_s, n_s = jax.lax.sort(
                (key, child_pc.reshape(num_rays, k * 8),
                 child_n.reshape(num_rays, k * 8)),
                dimension=-1, num_keys=1)
            nidx = n_s[:, :k]
            pc = p_s[:, :k]
            valid = key_s[:, :k] < big

    cell = 2.0 / (2 ** level)
    if packed_ok:
        coords = unpack(pc)
        # re-encode morton for the public contract (callers may correlate
        # nuggets with ops.spc points_to_morton)
        morton = jnp.zeros_like(pc)
        for b in range(level):
            morton = morton | ((((pc >> b) & 1) << (3 * b + 2))
                               | (((pc >> (10 + b)) & 1) << (3 * b + 1))
                               | (((pc >> (20 + b)) & 1) << (3 * b)))
    else:
        coords = decode_morton(pc, level)
        morton = pc
    bmin = coords.astype(dtype) * cell - 1.0
    _, t_in, t_out = _ray_aabb(origin[:, None, :], inv_dir[:, None, :],
                               bmin, bmin + cell)
    return nidx, morton, t_in, t_out, valid, overflowed


def _capacity_ceiling(num_rays, num_leaf, level):
    """Worst-case nugget count: every ray visits every leaf (never larger
    than the number of candidate (ray, node) pairs a dense traversal sees)."""
    return int(max(num_rays, 1) * max(num_leaf, 1))


def unbatched_raytrace(octree, point_hierarchy, pyramid, exsum, origin,
                       direction, level, return_depth=True, with_exit=False,
                       max_nuggets=None):
    """Trace rays against an SPC, returning depth-sorted (ray, point)
    intersection nuggets. Ref :34.

    ``max_nuggets`` bounds the per-level intersection buffer. With the
    default (None), a tight initial capacity of ``4 * num_rays`` is used and
    **auto-grown** (doubled, recompiling) whenever the traversal reports a
    capacity overflow, so results are never silently truncated. An explicit
    ``max_nuggets`` is trusted; if it overflows, a warning is emitted and the
    truncated (still depth-sorted) nugget set is returned — use
    :func:`raytrace_overflow_report` to size it.

    Per-level cost is proportional to the capacity (XLA static shapes), so a
    tight buffer is also the fast path: for closed surfaces the per-level
    candidate count stays ~(rays hitting the object) x (cells pierced per
    level), a small multiple of ``num_rays``, NOT ``num_rays * 8^level``.

    The returned arrays are trimmed to the actual intersection count (host
    sync at the boundary, like the reference).
    """
    num_rays = origin.shape[0]
    pyramid_np = np.asarray(pyramid)
    num_leaf = int(pyramid_np[0, level])
    octree = jnp.asarray(octree)
    exsum = jnp.asarray(exsum)

    if max_nuggets is None:
        use_frontier = (level <= 10 and 8 * octree.shape[0] < (1 << 23)
                        and num_rays < (1 << 26))
        if use_frontier:
            # compacted-frontier path: auto-grow the global capacity
            ceiling = min(_capacity_ceiling(num_rays, num_leaf, level),
                          (1 << 26) - 1)
            cap = min(max(4 * num_rays, 1024), ceiling)
            while True:
                ridx, pidx, t_in, t_out, mask, _, overflowed = \
                    _raytrace_frontier(octree, exsum, origin, direction,
                                       level, cap)
                if not bool(overflowed) or cap >= ceiling:
                    break
                cap = min(cap * 2, ceiling)
            # valid entries form a prefix (mask = iota < count)
            count = int(jnp.sum(mask))
            ridx = ridx[:count].astype(jnp.int32)
            pidx = pidx[:count].astype(jnp.int32)
            t_in = t_in[:count]
            t_out = t_out[:count]
        else:
            # per-ray fixed-slot path: auto-grow K (slots/ray) on overflow
            k = 16
            k_ceiling = max(num_leaf, 16)
            while True:
                nidx, _, t_in2, t_out2, valid2, overflowed = _raytrace_perray(
                    octree, exsum, origin, direction, level, k)
                if not bool(overflowed) or k >= k_ceiling:
                    break
                k = min(k * 2, k_ceiling)
            flat_valid = valid2.reshape(-1)
            count = int(jnp.sum(flat_valid))
            sel = jnp.nonzero(flat_valid, size=count)[0]
            ridx = (sel // k).astype(jnp.int32)
            pidx = nidx.reshape(-1)[sel].astype(jnp.int32)
            t_in = t_in2.reshape(-1)[sel]
            t_out = t_out2.reshape(-1)[sel]
    else:
        # explicit global capacity: the capacity-buffer oracle path
        ceiling = _capacity_ceiling(num_rays, num_leaf, level)
        max_nuggets = min(int(max_nuggets), ceiling)
        ridx, pidx, t_in, t_out, valid, _, overflowed = _raytrace_fixed(
            octree, exsum, origin, direction, level, max_nuggets,
            return_exit=with_exit)
        if bool(overflowed):
            import warnings
            warnings.warn(
                f"unbatched_raytrace: max_nuggets={max_nuggets} overflowed — "
                f"nuggets were dropped. Use raytrace_overflow_report to size "
                f"the buffer, or pass max_nuggets=None to auto-grow.")
        count = int(jnp.sum(valid))
        ridx = ridx[:count].astype(jnp.int32)
        pidx = pidx[:count].astype(jnp.int32)
        t_in = t_in[:count]
        t_out = t_out[:count]

    if return_depth:
        if with_exit:
            depth = jnp.stack([t_in, t_out], axis=-1)
        else:
            depth = t_in[:, None]
        return ridx, pidx, depth
    return ridx, pidx


def raytrace_overflow_report(octree, point_hierarchy, pyramid, exsum, origin,
                             direction, level, max_nuggets):
    """Validate a raytrace buffer capacity (mirror of
    ``render.mesh.tile_overflow_report`` / ``Collision.detection_diagnostics``).

    Returns a dict with ``level_counts`` (true surviving candidates per
    octree level — exact up to and including the first overflowing level,
    lower bounds beyond it), ``max_level_count``, ``capacity``, and
    ``overflowed`` (True → :func:`unbatched_raytrace` with this explicit
    ``max_nuggets`` would silently drop nuggets)."""
    *_, level_counts, overflowed = _raytrace_fixed(
        jnp.asarray(octree), jnp.asarray(exsum), origin, direction, level,
        int(max_nuggets))
    counts = np.asarray(level_counts)
    return {
        "level_counts": counts,
        "max_level_count": int(counts.max()) if counts.size else 0,
        "capacity": int(max_nuggets),
        "overflowed": bool(overflowed),
    }


# ---------------------------------------------------------------------------
# packed ray ops
# ---------------------------------------------------------------------------

def mark_pack_boundaries(pack_ids):
    """True where a new pack starts in a sorted id tensor. Ref :94.

    Example:
        >>> import jax.numpy as jnp
        >>> b = mark_pack_boundaries(jnp.asarray([0, 0, 1, 1, 1]))
        >>> print(b)
        [ True False  True False False]
        >>> feats = jnp.asarray([[1.0], [2.0], [3.0], [4.0], [5.0]])
        >>> print(sum_reduce(feats, b))
        [[ 3.]
         [12.]]
        >>> print(cumsum(feats, b)[:, 0])
        [ 1.  3.  3.  7. 12.]
    """
    first = jnp.ones((1,), dtype=bool)
    return jnp.concatenate([first, pack_ids[1:] != pack_ids[:-1]])


def _segment_ids(boundaries):
    return jnp.cumsum(boundaries.astype(jnp.int32)) - 1


def diff(feats, boundaries):
    """out[i] = feats[i+1] − feats[i], 0 at pack ends. Ref :132."""
    nxt = jnp.concatenate([feats[1:], jnp.zeros_like(feats[:1])], axis=0)
    d = nxt - feats
    is_last = jnp.concatenate([boundaries[1:], jnp.ones((1,), dtype=bool)])
    return jnp.where(is_last[:, None], 0.0, d)


def sum_reduce(feats, boundaries):
    """Per-pack sum → (num_packs, D). Differentiable. Ref :216."""
    seg = _segment_ids(boundaries)
    num_segments = int(jnp.sum(boundaries)) if not isinstance(
        boundaries, jax.core.Tracer) else boundaries.shape[0]
    out = jax.ops.segment_sum(feats, seg, num_segments=num_segments)
    return out


def prod_reduce(feats, boundaries):
    """Per-pack product → (num_packs, D). Ref :229."""
    seg = _segment_ids(boundaries)
    num_segments = int(jnp.sum(boundaries)) if not isinstance(
        boundaries, jax.core.Tracer) else boundaries.shape[0]
    return jax.ops.segment_prod(feats, seg, num_segments=num_segments)


def _segmented_scan(feats, boundaries, op, identity, exclusive, reverse):
    """Generic segmented associative scan along axis 0."""
    if reverse:
        feats = feats[::-1]
        seg_last = boundaries[::-1]
        # in reversed order, segments start where the original ones ended
        boundaries = jnp.concatenate(
            [jnp.ones((1,), dtype=bool), seg_last[:-1]])

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return (jnp.where(fb[..., None] if va.ndim > fb.ndim else fb,
                          vb, op(va, vb)), fa | fb)

    flags = boundaries
    vals, _ = jax.lax.associative_scan(combine, (feats, flags), axis=0)
    if exclusive:
        shifted = jnp.concatenate(
            [jnp.full_like(vals[:1], identity), vals[:-1]], axis=0)
        vals = jnp.where(boundaries[:, None], identity, shifted)
    if reverse:
        vals = vals[::-1]
    return vals


def cumsum(feats, boundaries, exclusive=False, reverse=False):
    """Per-pack cumulative sum. Ref :254."""
    return _segmented_scan(feats, boundaries, jnp.add, 0.0, exclusive, reverse)


def cumprod(feats, boundaries, exclusive=False, reverse=False):
    """Per-pack cumulative product. Ref :274."""
    return _segmented_scan(feats, boundaries, jnp.multiply, 1.0,
                           exclusive, reverse)


def exponential_integration(feats, tau, boundaries, exclusive=True):
    """Beer-Lambert transmittance integration in cumsum form (stable
    gradients). Returns (integrated (num_packs, D), transmittance (N, 1)).
    Ref :298."""
    alpha = 1.0 - jnp.exp(-tau)
    transmittance = jnp.exp(-1.0 * cumsum(tau, boundaries, exclusive=exclusive))
    transmittance = transmittance * alpha
    feats_out = sum_reduce(transmittance * feats, boundaries)
    return feats_out, transmittance


def mark_first_hit(ridx):
    """Deprecated alias of :func:`mark_pack_boundaries`. Ref :raytrace."""
    import warnings
    warnings.warn("mark_first_hit is deprecated, use mark_pack_boundaries",
                  DeprecationWarning)
    return mark_pack_boundaries(ridx)
