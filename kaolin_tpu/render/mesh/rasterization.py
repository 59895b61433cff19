"""Differentiable mesh rasterization (DIB-R style).

TPU-native analog of reference ``kaolin/render/mesh/rasterization.py:226-371``
and the CUDA kernel ``csrc/render/mesh/rasterization_cuda.cu:44-191``.

Per-pixel z-buffer rasterization with 2D cross-product barycentrics
(signed-eps normalized, exactly the kernel's math), max-z (closest) winner,
and linear feature interpolation — perspective-correctness deliberately
ignored like the reference (kernel comment :152-154).

Design: a ``lax.scan`` over face tiles keeps per-pixel running
(best_z, face_idx); the winning face's barycentrics and features are then
RE-computed differentiably from gathered vertices, so plain JAX AD reproduces
the reference's hand-written backward (which differentiates the same 2×2
barycentric solve and scatters grad·w into features). No custom VJP needed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rasterize", "suggest_tile_cap", "tile_overflow_report"]

DEFAULT_MULTIPLIER = 1000
DEFAULT_EPS = 1e-8


def _pixel_coords(height, width, multiplier, dtype):
    """Pixel-center coords matching the kernel (:84-86): x right, y up."""
    wid = jnp.arange(width, dtype=dtype)
    hei = jnp.arange(height, dtype=dtype)
    x0 = multiplier / width * (2 * wid + 1 - width)
    y0 = multiplier / height * (height - 2 * hei - 1)
    return jnp.meshgrid(x0, y0, indexing="xy")  # each (H, W)


def _barycentrics(px, py, verts, eps):
    """verts (..., 3, 2) broadcast against px/py (...,). Kernel math :131-149."""
    ax = verts[..., 0, 0] - px
    ay = verts[..., 0, 1] - py
    bx = verts[..., 1, 0] - px
    by = verts[..., 1, 1] - py
    cx = verts[..., 2, 0] - px
    cy = verts[..., 2, 1] - py
    w0 = bx * cy - by * cx
    w1 = cx * ay - cy * ax
    w2 = ax * by - ay * bx
    norm = w0 + w1 + w2
    norm = norm + jnp.where(norm >= 0, eps, -eps)
    return w0 / norm, w1 / norm, w2 / norm


@functools.partial(jax.jit, static_argnames=("height", "width", "tile"))
def _rasterize_search(height, width, face_vertices_z, face_vertices_image,
                      valid_mask, multiplier, eps, tile=128):
    """Unbatched winner search → (face_idx (H, W) int32). Non-differentiable.
    Brute-force face-tile scan (used for small face counts)."""
    f = face_vertices_z.shape[0]
    num_tiles = -(-f // tile)
    pad = num_tiles * tile - f
    fvz = jnp.pad(face_vertices_z, ((0, pad), (0, 0)))
    fvi = jnp.pad(face_vertices_image, ((0, pad), (0, 0), (0, 0)))
    vmask = jnp.pad(valid_mask, (0, pad))
    px, py = _pixel_coords(height, width, multiplier, face_vertices_z.dtype)

    fvz_t = fvz.reshape(num_tiles, tile, 3)
    fvi_t = fvi.reshape(num_tiles, tile, 3, 2)
    vm_t = vmask.reshape(num_tiles, tile)

    def body(carry, inp):
        best_z, best_i = carry
        fvz_i, fvi_i, vm_i, t_idx = inp
        # (H, W, T)
        w0, w1, w2 = _barycentrics(px[..., None], py[..., None],
                                   fvi_i[None, None], eps)
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = (w0 * fvz_i[None, None, :, 0] + w1 * fvz_i[None, None, :, 1]
             + w2 * fvz_i[None, None, :, 2])
        z = jnp.where(inside & vm_i[None, None], z, -jnp.inf)
        tmax = jnp.max(z, axis=-1)
        targ = jnp.argmax(z, axis=-1).astype(jnp.int32) + t_idx * tile
        take = tmax > best_z
        return (jnp.where(take, tmax, best_z),
                jnp.where(take, targ, best_i)), None

    init = (jnp.full((height, width), -jnp.inf, dtype=face_vertices_z.dtype),
            jnp.full((height, width), -1, dtype=jnp.int32))
    (best_z, best_i), _ = jax.lax.scan(
        body, init, (fvz_t, fvi_t, vm_t, jnp.arange(num_tiles, dtype=jnp.int32)))
    return jnp.where(jnp.isfinite(best_z), best_i, -1)


def tile_rects(height, width, tile_px, multiplier):
    """Per-tile pixel-CENTER extents in kernel coords, the single source of
    truth for tile/bbox overlap tests (shared with the Pallas occupancy
    bitmap in ``pallas_soft_mask.chunk_occupancy``). Pixel centers at index
    i sit at mult/total*(2i+1-total); y decreases with row index (kernel
    y = mult/H*(H-2r-1)). Returns (x_lo, x_hi) of shape (W/tile_px,) and
    (y_lo, y_hi) of shape (H/tile_px,)."""
    ty = height // tile_px
    tx = width // tile_px
    i0 = jnp.arange(tx) * tile_px
    i1 = i0 + tile_px - 1
    x_lo = multiplier / width * (2 * i0 + 1 - width)
    x_hi = multiplier / width * (2 * i1 + 1 - width)
    r0 = jnp.arange(ty) * tile_px
    r1 = r0 + tile_px - 1
    y_hi = multiplier / height * (height - 2 * r0 - 1)
    y_lo = multiplier / height * (height - 2 * r1 - 1)
    return x_lo, x_hi, y_lo, y_hi


def _tile_overlap(face_vertices_image, valid_mask, height, width, multiplier,
                  tile_px, margin=0.0):
    """(num_tiles, F) bool: face (margin-enlarged) bbox ∩ tile rect non-empty
    (with the kernel's half-open x >= xmin, x < xmax convention approximated
    by closed intervals)."""
    f = face_vertices_image.shape[0]
    ty = height // tile_px
    tx = width // tile_px
    fmin = jnp.min(face_vertices_image, axis=1) - margin  # (F, 2) x,y
    fmax = jnp.max(face_vertices_image, axis=1) + margin
    x_lo, x_hi, y_lo, y_hi = tile_rects(height, width, tile_px, multiplier)

    ox = (fmin[None, :, 0] <= x_hi[:, None]) & (fmax[None, :, 0] >= x_lo[:, None])
    oy = (fmin[None, :, 1] <= y_hi[:, None]) & (fmax[None, :, 1] >= y_lo[:, None])
    overlap = (oy[:, None, :] & ox[None, :, :]) & valid_mask[None, None]
    return overlap.reshape(ty * tx, f)


def bin_faces_to_tiles(face_vertices_image, valid_mask, height, width,
                       multiplier, tile_px, cap, margin=0.0):
    """Bin faces to image tiles by bbox overlap (the TPU equivalent of the
    CUDA kernel's shared-memory bbox culling, :95-117).

    Returns (tile_faces (num_tiles, cap) int32 face ids padded with -1,
    overflow flag). ``num_tiles = (H/tile_px) * (W/tile_px)``, row-major.
    """
    f = face_vertices_image.shape[0]
    overlap = _tile_overlap(face_vertices_image, valid_mask, height, width,
                            multiplier, tile_px, margin)

    # compact set bits per row via top_k (much faster than vmapped nonzero):
    # keys = f - id for overlapping faces, 0 otherwise; top-cap keys descend
    # → face ids ascend (index order), fill → -1
    keys = jnp.where(overlap, f - jnp.arange(f, dtype=jnp.int32)[None], 0)
    topk, _ = jax.lax.top_k(keys, min(cap, f))
    tile_faces = jnp.where(topk > 0, f - topk, -1).astype(jnp.int32)
    if cap > f:
        tile_faces = jnp.pad(tile_faces, ((0, 0), (0, cap - f)),
                             constant_values=-1)
    overflow = jnp.sum(overlap, axis=1) > cap
    return tile_faces, overflow


def tile_overflow_report(face_vertices_image, height, width, valid_faces=None,
                         multiplier=None, tile_px=32, tile_cap=512,
                         margin_boxlen=0.0):
    """Capacity-overflow surfacing for the XLA binned backends (jittable).

    The capacity-binned XLA rasterizer/soft-mask silently drop faces on
    tiles overlapped by more than ``tile_cap`` candidates (the Pallas TPU
    paths have no capacity and cannot drop). Call this with the same
    ``tile_px``/``tile_cap``/boxlen to check a workload:

    Returns a dict of jnp scalars per batch element:
    ``any_overflow`` (bool (B,)), ``num_overflowing_tiles`` (int (B,)),
    ``max_overlap`` (int (B,) — pass a cap ≥ this for exactness).
    """
    if multiplier is None:
        multiplier = DEFAULT_MULTIPLIER
    fvi = jnp.asarray(face_vertices_image)
    if fvi.ndim == 3:
        fvi = fvi[None]
    b, f = fvi.shape[:2]
    if valid_faces is None:
        valid_faces = jnp.ones((b, f), dtype=bool)
    scaled = fvi * multiplier
    margin = margin_boxlen * multiplier

    def one(v, m):
        overlap = _tile_overlap(v, m, height, width, multiplier, tile_px,
                                margin)
        counts = jnp.sum(overlap.astype(jnp.int32), axis=1)
        overflow = counts > tile_cap
        return (jnp.any(overflow), jnp.sum(overflow.astype(jnp.int32)),
                jnp.max(counts))

    any_o, num_o, max_c = jax.vmap(one)(scaled, valid_faces.astype(bool))
    return {"any_overflow": any_o, "num_overflowing_tiles": num_o,
            "max_overlap": max_c}


def suggest_tile_cap(face_vertices_image, height, width, multiplier=None,
                     tile_px=32, boxlen=0.02, headroom=1.25):
    """Exact per-tile face capacity for the binned backends: the maximum
    number of faces whose boxlen-enlarged bbox overlaps any image tile,
    times ``headroom``, rounded up to a multiple of 64. Compute this once
    host-side and pass as ``tile_cap`` to :func:`rasterize` /
    ``dibr_soft_mask`` inside a jitted optimization loop — soft-mask cost
    scales linearly with the capacity, so a tight bound is much faster than
    the safe default of 512."""
    if multiplier is None:
        multiplier = DEFAULT_MULTIPLIER
    fvi = jnp.asarray(face_vertices_image)
    if fvi.ndim == 4:
        fvi = fvi.reshape(-1, 3, 2)
    f = fvi.shape[0]
    scaled = fvi * multiplier
    margin = boxlen * multiplier
    tile_faces, _ = bin_faces_to_tiles(scaled, jnp.ones((f,), bool), height,
                                       width, multiplier, tile_px, f,
                                       margin=margin)
    max_overlap = int(jnp.max(jnp.sum(tile_faces >= 0, axis=1)))
    cap = int(np.ceil(max_overlap * headroom / 64.0)) * 64
    return max(64, min(f, cap))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "tile_px", "cap"))
def _rasterize_search_binned(height, width, face_vertices_z,
                             face_vertices_image, valid_mask, multiplier, eps,
                             tile_px=32, cap=512):
    """Tile-binned winner search: each image tile tests only faces whose
    bbox overlaps it — the XLA analog of the CUDA kernel's binning."""
    f = face_vertices_z.shape[0]
    ty = height // tile_px
    tx = width // tile_px
    tile_faces, _ = bin_faces_to_tiles(face_vertices_image, valid_mask,
                                       height, width, multiplier, tile_px, cap)
    safe = jnp.clip(tile_faces, 0, None)
    fvz_t = face_vertices_z[safe]           # (T, cap, 3)
    fvi_t = face_vertices_image[safe]       # (T, cap, 3, 2)
    alive = tile_faces >= 0                 # (T, cap)

    px, py = _pixel_coords(height, width, multiplier, face_vertices_z.dtype)
    # (ty, tx, tile_px, tile_px)
    px_t = px.reshape(ty, tile_px, tx, tile_px).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, tile_px * tile_px)
    py_t = py.reshape(ty, tile_px, tx, tile_px).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, tile_px * tile_px)

    def per_tile(inp):
        pxi, pyi, fvz_i, fvi_i, alive_i, ids_i = inp
        # (P, cap)
        w0, w1, w2 = _barycentrics(pxi[:, None], pyi[:, None], fvi_i[None],
                                   eps)
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        z = (w0 * fvz_i[None, :, 0] + w1 * fvz_i[None, :, 1]
             + w2 * fvz_i[None, :, 2])
        z = jnp.where(inside & alive_i[None], z, -jnp.inf)
        best = jnp.argmax(z, axis=1)
        hit = jnp.isfinite(jnp.max(z, axis=1))
        return jnp.where(hit, ids_i[best], -1).astype(jnp.int32)

    # lax.map bounds live (P, cap) intermediates to batch_size tiles at a time
    out = jax.lax.map(per_tile, (px_t, py_t, fvz_t, fvi_t, alive, safe),
                      batch_size=min(ty * tx, 256))
    out = out.reshape(ty, tx, tile_px, tile_px).transpose(0, 2, 1, 3) \
        .reshape(height, width)
    return out


def rasterize(height, width, face_vertices_z, face_vertices_image,
              face_features, valid_faces=None, multiplier=None, eps=None,
              backend=None, tile_px=None, tile_cap=None, impl=None):
    """Differentiable rasterization to feature images.

    Args:
        height, width: static ints.
        face_vertices_z: (B, F, 3) camera-space z per face vertex.
        face_vertices_image: (B, F, 3, 2) image-plane coords in [-1, 1].
        face_features: (B, F, 3, D) or list of such.
        valid_faces: optional (B, F) bool.
        multiplier: coordinate scale for numerics (default 1000).
        eps: barycentric normalization epsilon (default 1e-8).
        backend: None (auto), "brute" (face-tile scan over ALL faces — exact
            for any face size/count), or "binned" (image-tile bbox binning
            with per-tile face capacity ``tile_cap`` — the XLA analog of the
            CUDA kernel's per-pixel bbox early-out; auto-selected for large
            face counts).
        tile_px: image tile size for the binned backend.
        tile_cap: max faces per image tile for the binned backend
            (default min(F, 1024)). Tiles overlapped by more candidate faces
            than this drop the excess (raise it for extreme face density).
        impl: winner-search implementation for the binned backend — None
            (auto: Pallas kernel on TPU, XLA elsewhere), "pallas" (force;
            interpreted off-TPU), or "xla".

    Returns:
        (image_features (B, H, W, D) [or list], face_idx (B, H, W) int32,
        -1 for background). Ref ``rasterization.py:373``.
    """
    if multiplier is None:
        multiplier = DEFAULT_MULTIPLIER
    if eps is None:
        eps = DEFAULT_EPS
    is_list = isinstance(face_features, (list, tuple))
    feats = list(face_features) if is_list else [face_features]
    feat_dims = [x.shape[-1] for x in feats]
    features = jnp.concatenate(feats, axis=-1)

    b, f = face_vertices_z.shape[:2]
    if valid_faces is None:
        valid_mask = jnp.ones((b, f), dtype=bool)
    else:
        valid_mask = valid_faces.astype(bool)

    scaled = face_vertices_image * multiplier
    if impl is None:
        from kaolin_tpu.utils.backend import on_tpu
        from kaolin_tpu.render.mesh.pallas_soft_mask import PALLAS_FACE_LIMIT
        impl = "pallas" if on_tpu() and f <= PALLAS_FACE_LIMIT else "xla"
    if tile_px is None:
        # smaller tiles give the Pallas kernels finer chunk-occupancy
        # selectivity (less dead work); the XLA binned path amortizes its
        # per-tile gather better with larger tiles
        tile_px = 16 if impl == "pallas" else 32
    if backend == "binned" and (height % tile_px or width % tile_px):
        raise ValueError(
            f"backend='binned' needs height/width divisible by tile_px="
            f"{tile_px}, got {height}x{width}")
    use_binned = (backend == "binned"
                  or (backend is None and f >= 1024
                      and height % tile_px == 0 and width % tile_px == 0
                      and (height // tile_px) * (width // tile_px) >= 64))
    if (impl == "pallas" and backend != "brute"
            and height % tile_px == 0 and width % tile_px == 0):
        from kaolin_tpu.render.mesh.pallas_rasterize import (
            rasterize_search_pallas,
        )
        from kaolin_tpu.utils.backend import pallas_interpret

        search = lambda z, v, m: rasterize_search_pallas(
            z, v, m, multiplier, eps, height, width, tile_px,
            interpret=pallas_interpret())
    elif use_binned:
        cap = min(f, 512) if tile_cap is None else min(f, tile_cap)
        search = lambda z, v, m: _rasterize_search_binned(
            height, width, z, v, m, multiplier, eps,
            tile_px=tile_px, cap=cap)
    else:
        search = lambda z, v, m: _rasterize_search(height, width, z, v, m,
                                                   multiplier, eps)
    face_idx = jax.vmap(search)(
        jax.lax.stop_gradient(face_vertices_z),
        jax.lax.stop_gradient(scaled),
        valid_mask)

    # differentiable re-computation at winners. ONE combined gather: TPU row
    # gathers are latency-bound per row, so fetching verts+features together
    # from a single (F, 6+3D) table is ~2x faster than two gathers.
    safe_idx = jnp.clip(face_idx, 0, None)
    d3 = 3 * features.shape[-1]
    table = jnp.concatenate(
        [scaled.reshape(b, f, 6), features.reshape(b, f, d3)], axis=-1)
    sel = jnp.take_along_axis(table, safe_idx.reshape(b, -1, 1), axis=1)
    sel_v = sel[..., :6].reshape(b, height, width, 3, 2)
    sel_feat = sel[..., 6:].reshape(b, height, width, 3,
                                    features.shape[-1])

    px, py = _pixel_coords(height, width, multiplier, face_vertices_z.dtype)
    w0, w1, w2 = _barycentrics(px[None], py[None], sel_v, eps)
    hit = (face_idx >= 0)[..., None]
    interp = (w0[..., None] * sel_feat[..., 0, :]
              + w1[..., None] * sel_feat[..., 1, :]
              + w2[..., None] * sel_feat[..., 2, :])
    interp = jnp.where(hit, interp, 0.0)

    if is_list:
        outs = []
        start = 0
        for d in feat_dims:
            outs.append(interp[..., start:start + d])
            start += d
        return outs, face_idx
    return interp, face_idx
