"""Dense (gather-free) FlexiCubes extraction.

The TPU-fast formulation of the FlexiCubes iteration (reference
``kaolin/ops/conversions/flexicubes/flexicubes.py:154`` ``__call__``): every
sign-dependent quantity is computed ON THE DENSE CUBE GRID with

* shifted **slices** of the ``(R+1)^3`` scalar field for cube corners, edge
  endpoints, and quad neighbor cubes (backward of a slice is a pad — no
  scatters), and
* **one-hot matmul** lookups of the per-case topology tables (a ``(256, C)``
  one-hot against the ``(K, 256)`` table rides the MXU; a row gather from the
  same table is latency-bound on TPU).

There is **no data-dependent gather or scatter anywhere in forward or
backward**, which makes an SDF-optimization iteration MXU/VPU-bound instead
of latency-bound (the compacted :meth:`FlexiCubes.jit_extract` path measured
~220 ms/iter at res 64 on a v5-lite).

TPU layout rule used throughout: small feature axes (corner 8, edge 12,
group 4, xyz 3) lead, the cube grid axes trail — reductions, stacks, and
stencil shifts then run over large, lane-aligned minors instead of 3/12-wide
padded minors (measured 5-20x on v5-lite).

Outputs:

* ``vertices``: ``(R^3 * 4, 3)`` — dual vertex slot ``g`` of cube ``c`` at
  row ``c*4+g`` (+ quad-center rows appended when training). Invalid slots
  hold 1.0, not 0 (``norm(0)`` has a NaN gradient that a zero mask does not
  stop in backward).
* ``faces``: int32 ``(2 or 4 per quad, 3)`` rows indexing ``vertices``, one
  block of quads per edge axis, with ``aux['face_mask']``;
* ``l_dev``: ``(4, 12, R^3)`` masked per-group-entry deviations (sum matches
  the compacted path's ``sum(l_dev)``).

Use :meth:`FlexiCubes.jit_extract` when compact outputs are needed on
device; use this when the downstream loss works on masked dense arrays (the
typical SDF-optimization inner loop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions.flexicubes._tables import (
    CHECK_TABLE,
    DMC_TABLE,
    NUM_VD_TABLE,
)

__all__ = ["dense_extract"]

# cube corner k at offset (x, y, z) with k = x + 2y + 4z (list is in corner
# index order)
_CORNER_OFFS = [(x, y, z) for z in (0, 1) for y in (0, 1) for x in (0, 1)]
# _CUBE_EDGES pairs (axis-consistent orientation: x/z low->high, y high->low)
_EDGE_PAIRS = np.array([0, 1, 1, 5, 4, 5, 0, 4, 2, 3, 3, 7, 6, 7, 2, 6,
                        2, 0, 3, 1, 7, 5, 6, 4], dtype=np.int64).reshape(12, 2)
_QUAD_SPLIT_1 = np.array([0, 1, 2, 0, 2, 3])
_QUAD_SPLIT_2 = np.array([0, 1, 3, 3, 1, 2])
_QUAD_SPLIT_TRAIN = np.array([0, 1, 1, 2, 2, 3, 3, 0])

# quads: for each edge axis, the 4 sharing cubes in ascending cube-linear
# order as (cube offset from the edge's base vertex, edge slot in that cube).
# Derived from the slot layout implied by _EDGE_PAIRS (see flexicubes.py);
# matches jit_extract's lexsort order (occurrences sorted by cube row).
_QUAD_NEIGHBORS = {
    # x-edge at vertex (i, j, k): cubes (i, j-1+dy, k-1+dz)
    0: [((0, -1, -1), 6), ((0, -1, 0), 4), ((0, 0, -1), 2), ((0, 0, 0), 0)],
    # z-edge at vertex (i, j, k): cubes (i-1+dx, j-1+dy, k)
    2: [((-1, -1, 0), 5), ((-1, 0, 0), 1), ((0, -1, 0), 7), ((0, 0, 0), 3)],
    # y-edge at vertex (i, j, k): cubes (i-1+dx, j, k-1+dz)
    1: [((-1, 0, -1), 10), ((-1, 0, 0), 9), ((0, 0, -1), 11), ((0, 0, 0), 8)],
}


@functools.lru_cache(maxsize=1)
def _dense_tables():
    """Per-case dense lookup tables, concatenated for ONE matmul:

    rows 0..47   group-membership M[g, e] flattened (4 x 12)
    rows 48..50  ambiguity: [to_check, dir_id(0..5 or 0), alt_case]

    Returns (tableT (51, 256) np.float32, dirs list).  All entries are
    integers <= 255, exactly representable in bfloat16, so the one-hot
    matmul may run in bf16.
    """
    m = np.zeros((256, 4, 12), dtype=np.float32)
    for case in range(256):
        # DMC_TABLE rows beyond num_vd are filler (jit_extract masks with
        # kk < num_vd, flexicubes.py:619)
        for g in range(int(NUM_VD_TABLE[case])):
            for entry in DMC_TABLE[case, g]:
                if entry >= 0:
                    m[case, g, entry] = 1.0
    dirs = [(-1, 0, 0), (1, 0, 0), (0, -1, 0), (0, 1, 0), (0, 0, -1),
            (0, 0, 1)]
    dir_id = {d: i for i, d in enumerate(dirs)}
    chk = np.zeros((256, 3), dtype=np.float32)
    for case in range(256):
        row = CHECK_TABLE[case]
        if row[0] == 1:
            off = (int(row[1]), int(row[2]), int(row[3]))
            chk[case] = [1.0, float(dir_id[off]), float(row[4])]
    table = np.concatenate([m.reshape(256, 48), chk], axis=1)
    return table.T.copy(), dirs


def _lookup_t(case_flat, table_t, rows, chunk=1 << 19):
    """(C,) int cases -> (rows, C) table columns via one-hot matmul in bf16
    (table entries are small ints — bf16-exact). Chunked along C; the chunk
    loop is unrolled (static), no `while` in the HLO."""
    c = case_flat.shape[0]
    tt = jnp.asarray(table_t[:rows], jnp.bfloat16)

    def body(cc):
        oh = jax.nn.one_hot(cc, 256, axis=0, dtype=jnp.bfloat16)  # (256, n)
        return (tt @ oh).astype(jnp.float32)

    if c <= chunk:
        return body(case_flat)
    outs = [body(case_flat[i:i + chunk]) for i in range(0, c, chunk)]
    return jnp.concatenate(outs, axis=1)


def dense_extract(scalar_field, resolution, beta=None, alpha=None,
                  gamma_f=None, weight_scale=0.99, training=False,
                  grid_origin=-0.5, grid_extent=1.0, _stage=None):
    """Gather-free FlexiCubes extraction on the dense cube grid.

    Args:
        scalar_field: ``((R+1)^3,)`` SDF samples on the vertex grid built by
            :meth:`FlexiCubes.construct_voxel_grid` (x-major order).
        resolution: int R, or an ``(rx, ry, rz)`` tuple.
        beta / alpha / gamma_f: optional ``(R^3, 12) / (R^3, 8) / (R^3,)``
            learnable weights, cube-linear order (same as ``cube_idx`` rows).
        training: quad-center 4-triangle split (differentiable) vs gamma
            argmax 2-triangle split.
        grid_origin / grid_extent: the vertex grid spans
            ``[origin, origin+extent]^3`` (defaults match
            ``construct_voxel_grid``).

    Returns ``(vertices, faces, l_dev, aux)``; see module docstring.
    """
    if isinstance(resolution, (tuple, list)):
        rx, ry, rz = resolution
    else:
        rx = ry = rz = int(resolution)
    r3 = rx * ry * rz
    dtype = scalar_field.dtype
    sdf = scalar_field.reshape(rx + 1, ry + 1, rz + 1)

    table_t, dirs = _dense_tables()

    # Hoist the four (y, z)-offset views ONCE. A z-offset slice of the
    # (R+1)^3 grid is misaligned on the 128-lane minor axis and a y-offset
    # on the sublane axis — each such slice costs a full shuffle/relayout
    # pass on TPU, and corner() is consumed ~56 times across the case,
    # edge-crossing, and quad stages (measured 1.6 ms for the case stage
    # alone at res 64, ~30x its arithmetic). With the bases materialized
    # (optimization_barrier stops XLA re-fusing the shuffle into every
    # consumer), the remaining per-corner x-slices are leading-axis
    # offsets — free.
    bases = {}
    for yb in (0, 1):
        for zb in (0, 1):
            bases[(yb, zb)] = sdf[:, yb:yb + ry, zb:zb + rz]
    bases = jax.lax.optimization_barrier(bases)

    def corner(k):
        x, y, z = _CORNER_OFFS[k]
        return bases[(y, z)][x:x + rx]

    # ---- case ids from corner signs (8 slices, f32 accumulate) ----
    case_f = jnp.zeros((rx, ry, rz), dtype)
    osum_f = jnp.zeros((rx, ry, rz), dtype)
    for k in range(8):
        bit = (corner(k) < 0).astype(dtype)
        case_f = case_f + bit * float(1 << k)
        osum_f = osum_f + bit
    case = case_f.astype(jnp.int32)
    surf = (osum_f > 0) & (osum_f < 8)
    surf_f = surf.astype(dtype)
    # _stage: profiling hook — return a scalar that depends only on the
    # pipeline prefix up to the named stage; XLA dead-code-eliminates the
    # rest, so stage costs fall out of cumulative-prefix timings.
    if _stage == "case":
        return case_f.sum() + surf_f.sum()

    # ---- C16/C19 ambiguity resolution (6 shifted flag grids) ----
    chk = _lookup_t(case.reshape(-1), table_t[48:51], 3)     # (3, C)
    chk = chk.reshape(3, rx, ry, rz)
    flagged = (chk[0] > 0.5) & surf
    pad_f = jnp.pad(flagged, 1, constant_values=False)
    dir_oh = jax.nn.one_hot(chk[1].astype(jnp.int32), 6, axis=0,
                            dtype=dtype)                     # (6, R,R,R)
    neighbor_flagged = jnp.zeros((rx, ry, rz), dtype)
    for d, (dx, dy, dz) in enumerate(dirs):
        sl = pad_f[1 + dx:1 + dx + rx, 1 + dy:1 + dy + ry,
                   1 + dz:1 + dz + rz]
        neighbor_flagged = neighbor_flagged + sl.astype(dtype) * dir_oh[d]
    invert = flagged & (neighbor_flagged > 0.5)
    case = jnp.where(invert, chk[2].astype(jnp.int32), case)

    # ---- group-membership lookup for the (possibly inverted) cases ----
    m = _lookup_t(case.reshape(-1), table_t[:48], 48)        # (48, C)
    m = m.reshape(4, 12, rx, ry, rz) * surf_f
    if _stage == "m":
        return m.sum()

    # ---- learnable weights, feature-first ----
    if alpha is not None:
        alpha_c = jnp.tanh(alpha.T.reshape(8, rx, ry, rz)) * weight_scale + 1
    else:
        alpha_c = None
    if beta is not None:
        beta_c = jnp.tanh(beta.T.reshape(12, rx, ry, rz)) * weight_scale + 1
    else:
        beta_c = jnp.ones((12, rx, ry, rz), dtype)
    if gamma_f is not None:
        gamma_c = (jax.nn.sigmoid(gamma_f.reshape(rx, ry, rz)) * weight_scale
                   + (1 - weight_scale) / 2)
    else:
        gamma_c = jnp.ones((rx, ry, rz), dtype)

    # ---- per-slot edge crossings: base + t * axis_vec (slices only) ----
    h = (float(grid_extent) / rx, float(grid_extent) / ry,
         float(grid_extent) / rz)
    coords = [jnp.arange(rx, dtype=dtype)[:, None, None],
              jnp.arange(ry, dtype=dtype)[None, :, None],
              jnp.arange(rz, dtype=dtype)[None, None, :]]

    def _safe_t(w0, w1):
        denom = w0 - w1
        denom = jnp.where(jnp.abs(denom) < 1e-12,
                          jnp.where(denom < 0, -1e-12, 1e-12), denom)
        return w0 / denom

    zc_l, ue_l = [], []
    for e in range(12):
        c0, c1 = int(_EDGE_PAIRS[e, 0]), int(_EDGE_PAIRS[e, 1])
        s0, s1 = corner(c0), corner(c1)
        o0 = _CORNER_OFFS[c0]
        o1 = _CORNER_OFFS[c1]
        t_plain = _safe_t(s0, s1)
        if alpha_c is None:
            t_w = t_plain
        else:
            t_w = _safe_t(s0 * alpha_c[c0], s1 * alpha_c[c1])
        for t, acc in ((t_plain, zc_l), (t_w, ue_l)):
            xyz = [coords[a] + (o0[a] + t * (o1[a] - o0[a])) if o1[a] != o0[a]
                   else coords[a] + float(o0[a]) for a in range(3)]
            acc.append(jnp.stack(
                [xyz[a] * h[a] + grid_origin + jnp.zeros_like(t)
                 for a in range(3)]))
    zc = jnp.stack(zc_l)                                  # (12, 3, R,R,R)
    ue = jnp.stack(ue_l) if alpha_c is not None else zc
    if _stage == "zc":
        return zc.sum() + ue.sum()

    # ---- dual vertices: masked weighted means over each group ----
    mb = m * beta_c[None]                                 # (4, 12, R,R,R)
    mb_sum = jnp.sum(mb, axis=1)                          # (4, R,R,R)
    vd = jnp.sum(mb[:, :, None] * ue[None], axis=1) \
        / jnp.clip(mb_sum[:, None], 1e-12, None)          # (4, 3, R,R,R)
    vd_valid = mb_sum > 0                                 # (4, R,R,R)
    # invalid slots -> 1.0 (norm(0) NaN-grad guard, see module docstring)
    vd = jnp.where(vd_valid[:, None], vd, 1.0)
    if _stage == "vd":
        return vd.sum()

    # ---- L_dev: per-entry deviation from the group's mean distance ----
    # the NaN-guard sits on the REDUCED (4, 12, R^3) array: guarding the
    # (4, 12, 3, R^3) diff forced XLA to materialize a ~600 MB
    # intermediate instead of fusing the square-reduce. Valid entries are
    # bitwise identical; invalid dist values differ (sqrt(1) vs sqrt(3))
    # but are zeroed by *m either way, and backward routes the masked
    # cotangent into the constant so no sqrt'(0) NaN reaches d2.
    diff = zc[None] - vd[:, None]                         # (4, 12, 3, R..)
    d2 = jnp.sum(diff * diff, axis=2)                     # (4, 12, R..)
    dist = jnp.sqrt(jnp.where(m > 0, d2, 1.0)) * m        # (4, 12, R..)
    cnt = jnp.sum(m, axis=1, keepdims=True)               # (4, 1, R..)
    mean_l2 = jnp.sum(dist, axis=1, keepdims=True) \
        / jnp.clip(cnt, 1.0, None)
    l_dev = jnp.abs(dist - mean_l2) * m                   # (4, 12, R..)
    if _stage == "ldev":
        return l_dev.sum()

    # ---- quads per edge axis (slices; static neighbor patterns) ----
    lin = ((jnp.arange(rx, dtype=jnp.int32)[:, None, None] * ry
            + jnp.arange(ry, dtype=jnp.int32)[None, :, None]) * rz
           + jnp.arange(rz, dtype=jnp.int32)[None, None, :])  # cube linear

    def quad_axis(axis):
        """Quads wrapping interior edges of `axis`. Feature-first blocks:
        returns (ids (4, Q), gamma (4, Q), flip (Q,), valid (Q,),
        vd (4, 3, Q))."""
        neighbors = _QUAD_NEIGHBORS[axis]
        if axis == 0:    # x-edge at (i, j, k), j,k in [1, R-1]
            nq = (rx, ry - 1, rz - 1)
            base = (0, 1, 1)
        elif axis == 2:  # z-edge, i,j in [1, R-1]
            nq = (rx - 1, ry - 1, rz)
            base = (1, 1, 0)
        else:            # y-edge, i,k in [1, R-1]
            nq = (rx - 1, ry, rz - 1)
            base = (1, 0, 1)

        def cube_view(arr, off):
            i0, j0, k0 = (base[0] + off[0], base[1] + off[1],
                          base[2] + off[2])
            return arr[..., i0:i0 + nq[0], j0:j0 + nq[1], k0:k0 + nq[2]]

        garange = jnp.arange(4, dtype=dtype)[:, None, None, None]
        ids, gms, vds, oks = [], [], [], []
        for off, slot in neighbors:
            g_oh = cube_view(m[:, slot], off)             # (4, nq)
            vd_n = cube_view(vd, off)                     # (4, 3, nq)
            lin_n = cube_view(lin, off)
            g_idx = jnp.sum(g_oh * garange, axis=0)       # (nq)
            ids.append(lin_n * 4 + g_idx.astype(jnp.int32))
            vds.append(jnp.sum(g_oh[:, None] * vd_n, axis=0))   # (3, nq)
            gms.append(cube_view(gamma_c, off))
            oks.append(jnp.sum(g_oh, axis=0) > 0.5)

        ev = sdf[base[0]:base[0] + nq[0], base[1]:base[1] + nq[1],
                 base[2]:base[2] + nq[2]]                 # low endpoint
        sh = [0, 0, 0]
        sh[axis] = 1
        ev2 = sdf[base[0] + sh[0]:base[0] + sh[0] + nq[0],
                  base[1] + sh[1]:base[1] + sh[1] + nq[1],
                  base[2] + sh[2]:base[2] + sh[2] + nq[2]]
        is_surf = (ev < 0) != (ev2 < 0)
        s_first = ev2 if axis == 1 else ev   # y edges stored high->low
        valid = is_surf
        for ok in oks:
            valid = valid & ok
        flat = lambda a: a.reshape(a.shape[:-3] + (-1,))  # noqa: E731
        return (jnp.stack([flat(i) for i in ids]),
                jnp.stack([flat(g) for g in gms]),
                flat(s_first) > 0, flat(valid),
                jnp.stack([flat(v) for v in vds]))

    parts = [quad_axis(a) for a in (0, 2, 1)]
    q_ids = jnp.concatenate([p[0] for p in parts], axis=1)   # (4, Q)
    q_gm = jnp.concatenate([p[1] for p in parts], axis=1)
    q_flip = jnp.concatenate([p[2] for p in parts])          # (Q,)
    q_ok = jnp.concatenate([p[3] for p in parts])
    q_vd = jnp.concatenate([p[4] for p in parts], axis=2)    # (4, 3, Q)
    nq_total = q_ids.shape[1]
    # orientation (matches jit_extract: [0,1,3,2] when s_first>0 else
    # [2,3,1,0])
    perm_a = jnp.asarray([0, 1, 3, 2])
    perm_b = jnp.asarray([2, 3, 1, 0])
    q_ids = jnp.where(q_flip[None], q_ids[perm_a], q_ids[perm_b])
    q_gm = jnp.where(q_flip[None], q_gm[perm_a], q_gm[perm_b])
    q_vd = jnp.where(q_flip[None, None], q_vd[perm_a].transpose(1, 0, 2),
                     q_vd[perm_b].transpose(1, 0, 2))        # (3, 4, Q)

    gamma_02 = q_gm[0] * q_gm[2]
    gamma_13 = q_gm[1] * q_gm[3]

    # vd is (4, 3, rx, ry, rz): vertex row c*4+g -> transpose to
    # (rx, ry, rz, 4, 3)
    vertices = vd.transpose(2, 3, 4, 0, 1).reshape(-1, 3)
    vertex_mask = vd_valid.transpose(1, 2, 3, 0).reshape(-1)
    q_ids_i = q_ids.astype(jnp.int32)
    if not training:
        msk = gamma_02 > gamma_13                            # (Q,)
        f1 = q_ids_i[jnp.asarray(_QUAD_SPLIT_1)]             # (6, Q)
        f2 = q_ids_i[jnp.asarray(_QUAD_SPLIT_2)]
        ft = jnp.where(msk[None], f1, f2).reshape(2, 3, nq_total)
        faces = ft.transpose(2, 0, 1).reshape(-1, 3)         # rows q*2+t
        face_mask = jnp.repeat(q_ok, 2)
    else:
        vd_02 = (q_vd[:, 0] + q_vd[:, 2]) / 2                # (3, Q)
        vd_13 = (q_vd[:, 1] + q_vd[:, 3]) / 2
        wsum = gamma_02 + gamma_13 + 1e-8
        centers = (vd_02 * gamma_02[None]
                   + vd_13 * gamma_13[None]) / wsum[None]    # (3, Q)
        centers = jnp.where(q_ok[None], centers, 1.0)        # NaN-safe
        center_idx = jnp.arange(nq_total, dtype=jnp.int32) + r3 * 4
        vertices = jnp.concatenate([vertices, centers.T])
        vertex_mask = jnp.concatenate([vertex_mask, q_ok])
        t01 = q_ids_i[jnp.asarray(_QUAD_SPLIT_TRAIN)].reshape(4, 2, nq_total)
        ctr = jnp.broadcast_to(center_idx[None, None], (4, 1, nq_total))
        faces = jnp.concatenate([t01, ctr], axis=1)          # (4, 3, Q)
        faces = faces.transpose(2, 0, 1).reshape(-1, 3)      # rows q*4+t
        face_mask = jnp.repeat(q_ok, 4)

    aux = {
        "face_mask": face_mask,
        "vertex_mask": vertex_mask,
        "counts": {"surf_cubes": jnp.sum(surf.astype(jnp.int32)),
                   "quads": jnp.sum(q_ok.astype(jnp.int32))},
        # dense views for fast masked losses (no (N, 3) round-trip)
        "vd_dense": vd,                                      # (4, 3, R,R,R)
        "vd_valid_dense": vd_valid,                          # (4, R,R,R)
    }
    return vertices, faces, l_dev, aux
