"""DIB-R soft silhouette + full rasterization wrapper.

TPU-native analog of reference ``kaolin/render/mesh/dibr.py`` (dibr_soft_mask
:75, dibr_rasterization :119) and the kernel
``csrc/render/mesh/dibr_soft_mask_cuda.cu:40-184``.

Soft mask semantics (per the kernel): covered pixels get 1; uncovered pixels
accumulate ``1 − ∏(1 − exp(−sigmainv·d²/mult²))`` over faces whose
boxlen-enlarged bbox contains the pixel, with d² the min squared distance to
the 3 edges (perpendicular where the projection falls on the segment) and 3
vertices. The reference truncates to the first ``knum`` faces in index order;
this version includes all faces in the product (strictly more accurate —
``knum`` is accepted for API parity).

Perf note (v5-lite, 512², ~5k faces, tile-binned tp=32/cap=512): forward
~8 ms, VJP ~58 ms with remat. A hand-written Pallas forward kernel measured
only ~12% faster than the XLA binned path — the op is transcendental-bound
(exp per face-pixel pair), so XLA is already near roofline; a custom-VJP
Pallas kernel (analytic d(d²)/d(verts) through the 6-way min) is the
remaining lever for the backward and is deferred.
"""

import functools

import jax
import jax.numpy as jnp

from kaolin_tpu.render.mesh.rasterization import rasterize

__all__ = ["dibr_soft_mask", "dibr_rasterization"]

_EPS = 1e-10


def _edge_vertex_sqdist(px, py, verts, multiplier):
    """Min squared distance from pixel to a triangle's edges/vertices in
    image space, broadcast over (..., T) faces; kernel :102-160."""
    dists = []
    for i in range(3):
        x1 = verts[..., i, 0]
        y1 = verts[..., i, 1]
        x2 = verts[..., (i + 1) % 3, 0]
        y2 = verts[..., (i + 1) % 3, 1]
        A = y2 - y1
        B = x1 - x2
        C = x2 * y1 - x1 * y2
        up = A * px + B * py + C
        down = A * A + B * B
        x3 = (B * B * px - A * B * py - A * C) / (down + _EPS)
        y3 = (A * A * py - A * B * px - B * C) / (down + _EPS)
        direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
        perp = up * up / (down + _EPS)
        bad = 4.0 * multiplier * multiplier
        dists.append(jnp.where(direct > 0, bad, perp))
    for i in range(3):
        x1 = verts[..., i, 0]
        y1 = verts[..., i, 1]
        dists.append((px - x1) ** 2 + (py - y1) ** 2)
    return jnp.min(jnp.stack(dists, axis=-1), axis=-1)


@functools.partial(jax.jit, static_argnames=("height", "width", "tile",
                                              "knum"))
def _soft_mask_unbatched(face_vertices_image, selected_face_idx, sigmainv,
                         boxlen, multiplier, height, width, tile=128,
                         knum=None):
    """All-faces soft mask. ``knum=None`` lets every in-box face contribute;
    an int reproduces the reference kernel's truncation to the FIRST knum
    in-box faces per pixel in face-index order
    (dibr_soft_mask_cuda.cu:164-171: ``kid++; if (kid >= knum) break``)."""
    from kaolin_tpu.render.mesh.rasterization import _pixel_coords
    dtype = face_vertices_image.dtype
    f = face_vertices_image.shape[0]
    num_tiles = -(-f // tile)
    pad = num_tiles * tile - f
    fvi = jnp.pad(face_vertices_image, ((0, pad), (0, 0), (0, 0)))
    vmask = jnp.pad(jnp.ones((f,), dtype=bool), (0, pad))
    fvi_t = fvi.reshape(num_tiles, tile, 3, 2)
    vm_t = vmask.reshape(num_tiles, tile)

    px, py = _pixel_coords(height, width, multiplier, dtype)
    bmin = jnp.min(fvi_t, axis=2) - boxlen * multiplier  # (NT, T, 2)
    bmax = jnp.max(fvi_t, axis=2) + boxlen * multiplier

    @jax.checkpoint  # remat: O(H·W·T) tile intermediates would dominate HBM
    def body(carry, inp):
        allprob, count = carry
        fvi_i, vm_i, bmin_i, bmax_i = inp
        in_box = ((px[..., None] >= bmin_i[None, None, :, 0])
                  & (px[..., None] < bmax_i[None, None, :, 0])
                  & (py[..., None] >= bmin_i[None, None, :, 1])
                  & (py[..., None] < bmax_i[None, None, :, 1])
                  & vm_i[None, None])
        include = in_box
        if knum is not None:
            rank = count[..., None] + jnp.cumsum(in_box.astype(jnp.int32),
                                                 axis=-1)
            include = in_box & (rank <= knum)
            count = count + jnp.sum(in_box.astype(jnp.int32), axis=-1)
        d2 = _edge_vertex_sqdist(px[..., None], py[..., None],
                                 fvi_i[None, None], multiplier)
        prob = jnp.where(include,
                         jnp.exp(-sigmainv * d2 / (multiplier * multiplier)),
                         0.0)
        return (allprob * jnp.prod(1.0 - prob, axis=-1), count), None

    init = (jnp.ones((height, width), dtype=dtype),
            jnp.zeros((height, width), dtype=jnp.int32))
    (allprob, _), _ = jax.lax.scan(body, init, (fvi_t, vm_t, bmin, bmax))
    soft = 1.0 - allprob
    return jnp.where(selected_face_idx >= 0, 1.0, soft)


def _tile_layout(height, width, multiplier, tile_px, dtype):
    from kaolin_tpu.render.mesh.rasterization import _pixel_coords
    ty = height // tile_px
    tx = width // tile_px
    px, py = _pixel_coords(height, width, multiplier, dtype)
    px_t = px.reshape(ty, tile_px, tx, tile_px).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, tile_px * tile_px)
    py_t = py.reshape(ty, tile_px, tx, tile_px).transpose(0, 2, 1, 3) \
        .reshape(ty * tx, tile_px * tile_px)
    return px_t, py_t


def _in_box(pxi, pyi, bmin_i, bmax_i, alive_i):
    return ((pxi[:, None] >= bmin_i[None, :, 0])
            & (pxi[:, None] < bmax_i[None, :, 0])
            & (pyi[:, None] >= bmin_i[None, :, 1])
            & (pyi[:, None] < bmax_i[None, :, 1])
            & alive_i[None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _soft_raw_binned(face_vertices_image, sigmainv, boxlen, multiplier,
                     height, width, tile_cfg):
    """Tile-binned ``1 − ∏(1 − p_i)`` with a hand-written VJP.

    The backward recomputes per-tile probabilities (bounded memory — only
    the per-tile product is saved) and pushes the analytic cotangent
    ``g · allprob/(1−p_i) · k·p_i`` through the distance field via a local
    ``jax.vjp``, then scatter-adds per-tile vertex grads — reproducing the
    reference's hand-written backward (dibr_soft_mask_cuda.cu:186-400)."""
    out, _ = _soft_raw_fwd(face_vertices_image, sigmainv, boxlen, multiplier,
                           height, width, tile_cfg)
    return out


def _soft_raw_fwd(face_vertices_image, sigmainv, boxlen, multiplier, height,
                  width, tile_cfg):
    from kaolin_tpu.render.mesh.rasterization import bin_faces_to_tiles
    tile_px, cap = tile_cfg
    dtype = face_vertices_image.dtype
    f = face_vertices_image.shape[0]
    ty, tx = height // tile_px, width // tile_px
    margin = boxlen * multiplier
    tile_faces, _ = bin_faces_to_tiles(
        jax.lax.stop_gradient(face_vertices_image),
        jnp.ones((f,), dtype=bool), height, width, multiplier, tile_px, cap,
        margin=margin)
    safe = jnp.clip(tile_faces, 0, None)
    fvi_t = face_vertices_image[safe]       # (T, cap, 3, 2)
    alive = tile_faces >= 0
    bmin = jnp.min(fvi_t, axis=2) - margin
    bmax = jnp.max(fvi_t, axis=2) + margin
    px_t, py_t = _tile_layout(height, width, multiplier, tile_px, dtype)

    def per_tile(inp):
        pxi, pyi, fvi_i, alive_i, bmin_i, bmax_i = inp
        in_box = _in_box(pxi, pyi, bmin_i, bmax_i, alive_i)
        d2 = _edge_vertex_sqdist(pxi[:, None], pyi[:, None], fvi_i[None],
                                 multiplier)
        prob = jnp.where(in_box,
                         jnp.exp(-sigmainv * d2 / (multiplier * multiplier)),
                         0.0)
        return jnp.prod(1.0 - prob, axis=-1)

    allprob = jax.lax.map(per_tile, (px_t, py_t, fvi_t, alive, bmin, bmax),
                          batch_size=min(ty * tx, 256))  # (T, P)
    allprob_img = allprob.reshape(ty, tx, tile_px, tile_px) \
        .transpose(0, 2, 1, 3).reshape(height, width)
    return 1.0 - allprob_img, (face_vertices_image, tile_faces, allprob)


def _soft_raw_bwd(sigmainv, boxlen, multiplier, height, width, tile_cfg,
                  res, g):
    tile_px, cap = tile_cfg
    fvi, tile_faces, allprob = res
    dtype = fvi.dtype
    ty, tx = height // tile_px, width // tile_px
    margin = boxlen * multiplier
    safe = jnp.clip(tile_faces, 0, None)
    alive = tile_faces >= 0
    px_t, py_t = _tile_layout(height, width, multiplier, tile_px, dtype)

    # soft_raw = 1 - allprob → cotangent on allprob is -g
    g_allprob = -g.reshape(ty, tile_px, tx, tile_px) \
        .transpose(0, 2, 1, 3).reshape(ty * tx, tile_px * tile_px)

    fvi_t = fvi[safe]
    bmin = jnp.min(fvi_t, axis=2) - margin
    bmax = jnp.max(fvi_t, axis=2) + margin
    k = sigmainv / (multiplier * multiplier)

    def per_tile(inp):
        pxi, pyi, fvi_i, alive_i, bmin_i, bmax_i, ga, ap = inp
        px = pxi[:, None]
        py = pyi[:, None]
        verts = fvi_i[None]                 # (1, cap, 3, 2)
        bad = 4.0 * multiplier * multiplier

        # recompute the 6 candidate distances, keeping edge intermediates
        edge_data = []
        cands = []
        for i in range(3):
            x1 = verts[..., i, 0]
            y1 = verts[..., i, 1]
            x2 = verts[..., (i + 1) % 3, 0]
            y2 = verts[..., (i + 1) % 3, 1]
            A = y2 - y1
            B = x1 - x2
            C = x2 * y1 - x1 * y2
            up = A * px + B * py + C
            down = A * A + B * B
            inv_down = 1.0 / (down + _EPS)
            x3 = (B * B * px - A * B * py - A * C) * inv_down
            y3 = (A * A * py - A * B * px - B * C) * inv_down
            direct = (x3 - x1) * (x3 - x2) + (y3 - y1) * (y3 - y2)
            perp = up * up * inv_down
            cands.append(jnp.where(direct > 0, bad, perp))
            edge_data.append((x1, y1, x2, y2, A, B, up, inv_down))
        for i in range(3):
            x1 = verts[..., i, 0]
            y1 = verts[..., i, 1]
            cands.append((px - x1) ** 2 + (py - y1) ** 2)
        stacked = jnp.stack(cands, axis=0)      # (6, P, cap)
        d2 = jnp.min(stacked, axis=0)
        # subgradient: split the cotangent equally among tied minima
        # (matches jnp.min AD; grid-aligned meshes hit exact ties often)
        num_ties = jnp.sum((stacked == d2[None]).astype(d2.dtype), axis=0)

        in_box = _in_box(pxi, pyi, bmin_i, bmax_i, alive_i)
        prob = jnp.where(in_box, jnp.exp(-k * d2), 0.0)
        # d allprob/d p_i = -allprob/(1-p_i); d p_i/d d2_i = -k p_i
        c = ga[:, None] * (ap[:, None] / jnp.clip(1.0 - prob, 1e-12, None)) \
            * k * prob
        c = jnp.where(in_box, c, 0.0) / num_ties

        # analytic d(d2)/d(verts), pushed through the minimal branch(es);
        # vertex j collects edge j's first-endpoint term, edge (j-1)'s
        # second-endpoint term, and its own vertex-distance term — assembled
        # by stacking (scatters are slow on TPU)
        e_g = []
        for i in range(3):
            x1, y1, x2, y2, A, B, up, inv_down = edge_data[i]
            ci = jnp.where(cands[i] == d2, c, 0.0)
            d_val = up * up * inv_down
            # ∂perp/∂θ = (2·up·∂up/∂θ − perp·∂down/∂θ) · inv_down
            w = ci * inv_down
            e_g.append((
                jnp.sum(w * (2 * up * (py - y2) - d_val * (2 * B)), axis=0),
                jnp.sum(w * (2 * up * (x2 - px) + d_val * (2 * A)), axis=0),
                jnp.sum(w * (2 * up * (y1 - py) + d_val * (2 * B)), axis=0),
                jnp.sum(w * (2 * up * (px - x1) - d_val * (2 * A)), axis=0),
            ))
        cols = []
        for j in range(3):
            x1 = verts[..., j, 0]
            y1 = verts[..., j, 1]
            cj = jnp.where(cands[3 + j] == d2, c, 0.0)
            gx = e_g[j][0] + e_g[(j + 2) % 3][2] \
                + jnp.sum(-2.0 * cj * (px - x1), axis=0)
            gy = e_g[j][1] + e_g[(j + 2) % 3][3] \
                + jnp.sum(-2.0 * cj * (py - y1), axis=0)
            cols.append(jnp.stack([gx, gy], axis=-1))
        return jnp.stack(cols, axis=1)       # (cap, 3, 2)

    grads_t = jax.lax.map(
        per_tile, (px_t, py_t, fvi_t, alive, bmin, bmax, g_allprob, allprob),
        batch_size=min(ty * tx, 256))
    grads_t = jnp.where(alive[..., None, None], grads_t, 0.0)
    grad = jnp.zeros_like(fvi)
    grad = grad.at[safe.reshape(-1)].add(
        grads_t.reshape(-1, 3, 2))
    return (grad,)


_soft_raw_binned.defvjp(_soft_raw_fwd, _soft_raw_bwd)


# ---- Pallas path: fused per-tile fwd/bwd kernels (TPU) ----

def _tiles_to_image(tiles, height, width, tile_px):
    ty, tx = height // tile_px, width // tile_px
    return tiles.reshape(ty, tx, tile_px, tile_px) \
        .transpose(0, 2, 1, 3).reshape(height, width)


def _image_to_tiles(img, height, width, tile_px):
    ty, tx = height // tile_px, width // tile_px
    return img.reshape(ty, tile_px, tx, tile_px) \
        .transpose(0, 2, 1, 3).reshape(ty * tx, tile_px * tile_px)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _soft_raw_pallas(face_vertices_image, sigmainv, boxlen, multiplier,
                     height, width, tile_cfg):
    """Same math as :func:`_soft_raw_binned` with both passes as Pallas
    kernels (``pallas_soft_mask``): every (pixels, faces) intermediate stays
    in VMEM, one program per image tile. ~8x faster fwd+bwd than the XLA
    formulation at 512²/5k faces on v5-lite (BASELINE.md kernel table)."""
    out, _ = _soft_raw_pallas_fwd(face_vertices_image, sigmainv, boxlen,
                                  multiplier, height, width, tile_cfg)
    return out


def _soft_raw_pallas_fwd(face_vertices_image, sigmainv, boxlen, multiplier,
                         height, width, tile_cfg):
    from kaolin_tpu.render.mesh.pallas_soft_mask import soft_mask_fwd_pallas
    from kaolin_tpu.utils.backend import pallas_interpret
    tile_px = tile_cfg[0]
    allprob, occ = soft_mask_fwd_pallas(
        face_vertices_image, sigmainv, boxlen, multiplier, height, width,
        tile_px, interpret=pallas_interpret())
    out = 1.0 - _tiles_to_image(allprob, height, width, tile_px)
    return out, (face_vertices_image, occ, allprob)


def _soft_raw_pallas_bwd(sigmainv, boxlen, multiplier, height, width,
                         tile_cfg, res, g):
    from kaolin_tpu.render.mesh.pallas_soft_mask import soft_mask_bwd_pallas
    from kaolin_tpu.utils.backend import pallas_interpret
    tile_px = tile_cfg[0]
    fvi, occ, allprob = res
    g_tiles = _image_to_tiles(g, height, width, tile_px)
    grad = soft_mask_bwd_pallas(
        fvi, occ, g_tiles, allprob, sigmainv, boxlen, multiplier,
        height, width, tile_px, interpret=pallas_interpret())
    return (grad,)


_soft_raw_pallas.defvjp(_soft_raw_pallas_fwd, _soft_raw_pallas_bwd)


@functools.partial(jax.jit,
                   static_argnames=("sigmainv", "boxlen", "multiplier",
                                    "height", "width", "tile_px", "cap",
                                    "impl"))
def _soft_mask_binned(face_vertices_image, selected_face_idx, sigmainv,
                      boxlen, multiplier, height, width, tile_px=32, cap=512,
                      impl="xla"):
    """Tile-binned soft mask: each image tile only evaluates faces whose
    boxlen-enlarged bbox overlaps it. Same values as _soft_mask_unbatched
    provided no tile overflows ``cap`` candidates. Backward is the analytic
    custom VJP of :func:`_soft_raw_binned` / :func:`_soft_raw_pallas`."""
    raw = _soft_raw_pallas if impl == "pallas" else _soft_raw_binned
    soft = raw(face_vertices_image, float(sigmainv),
               float(boxlen), float(multiplier), height, width,
               (tile_px, cap))
    return jnp.where(selected_face_idx >= 0, 1.0, soft)


def dibr_soft_mask(face_vertices_image, selected_face_idx, sigmainv=7000,
                   boxlen=0.02, knum=30, multiplier=1000.0, tile_px=None,
                   tile_cap=None, impl=None, knum_mode="all"):
    """Soft foreground mask for silhouette losses → (B, H, W). Ref :75.
    Differentiable w.r.t. face_vertices_image.

    ``impl``: None (auto — fused Pallas kernels on TPU, XLA elsewhere),
    "pallas" (force; interpreted off-TPU, slow — for parity tests), or
    "xla".

    ``knum_mode``: "all" (default) lets every in-box face contribute —
    strictly more accurate than the reference, which truncates each pixel to
    its first ``knum`` in-box faces in face-index order
    (dibr_soft_mask_cuda.cu:164-171); "first" reproduces that truncation
    exactly (runs on the all-faces XLA path)."""
    height, width = selected_face_idx.shape[1:3]
    f = face_vertices_image.shape[1]
    scaled = face_vertices_image * multiplier
    if knum_mode not in ("all", "first"):
        raise ValueError(f"unknown knum_mode {knum_mode!r}")
    if impl is None:
        from kaolin_tpu.utils.backend import on_tpu
        from kaolin_tpu.render.mesh.pallas_soft_mask import PALLAS_FACE_LIMIT
        impl = "pallas" if on_tpu() and f <= PALLAS_FACE_LIMIT else "xla"
    if tile_px is None:
        tile_px = 16 if impl == "pallas" else 32
    if knum_mode == "first":
        fn = lambda v, s: _soft_mask_unbatched(v, s, sigmainv, boxlen,
                                               multiplier, height, width,
                                               knum=int(knum))
    elif ((impl == "pallas" or f >= 1024)
            and height % tile_px == 0 and width % tile_px == 0
            and (height // tile_px) * (width // tile_px) >= 4):
        cap = min(f, 512) if tile_cap is None else min(f, tile_cap)
        fn = lambda v, s: _soft_mask_binned(v, s, sigmainv, boxlen,
                                            multiplier, height, width,
                                            tile_px=tile_px, cap=cap,
                                            impl=impl)
    else:
        fn = lambda v, s: _soft_mask_unbatched(v, s, sigmainv, boxlen,
                                               multiplier, height, width)
    return jax.vmap(fn)(scaled, selected_face_idx)


def dibr_rasterization(height, width, face_vertices_z, face_vertices_image,
                       face_features, face_normals_z, sigmainv=7000,
                       boxlen=0.02, knum=30, multiplier=None, eps=None,
                       rast_backend=None, tile_px=None, tile_cap=None):
    """Full DIB-R: rasterize features + soft mask, culling back faces
    (``face_normals_z > 0`` are valid). Ref :119.

    ``tile_cap`` bounds the per-image-tile face list of the binned backend
    (default min(F, 512)); lowering it to the scene's true maximum overlap
    cuts soft-mask cost proportionally.

    Returns (image_features, soft_mask (B, H, W), face_idx (B, H, W))."""
    valid_faces = face_normals_z >= 0.0
    image_features, face_idx = rasterize(
        height, width, face_vertices_z, face_vertices_image, face_features,
        valid_faces=valid_faces, multiplier=multiplier, eps=eps,
        tile_px=tile_px, tile_cap=tile_cap)
    if multiplier is None:
        multiplier = 1000.0
    soft_mask = dibr_soft_mask(face_vertices_image, face_idx, sigmainv,
                               boxlen, knum, multiplier, tile_px=tile_px,
                               tile_cap=tile_cap)
    return image_features, soft_mask, face_idx
