"""Pallas TPU kernel for the DIB-R rasterizer winner search.

Reference semantics: ``csrc/render/mesh/rasterization_cuda.cu:44-191`` — per
pixel, over candidate faces, 2D cross-product barycentrics with signed-eps
normalization, inside test, linearly-interpolated z, max-z (closest) winner;
ties resolve to the lowest face index (matching ``jnp.argmax``).

One program per image tile; faces stream through in 128-lane chunks with
dead chunks (no bbox overlap with the tile) skipped via the precomputed
occupancy bitmap — see ``pallas_soft_mask`` for the layout/sparsity design.
The search is non-differentiable by design (the rasterizer re-computes
barycentrics at the winners differentiably — see ``rasterization.rasterize``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kaolin_tpu.render.mesh.pallas_soft_mask import (
    _CHUNK,
    _R_ALIVE,
    _ROWS,
    _face_rows,
    _pixel_grids,
    chunk_occupancy,
    pack_faces,
)

_NEG = -3.0e38


def _winner_kernel(faces_ref, occ_ref, out_ref, best_z, best_id, *, tile_px,
                   tx_n, height, width, multiplier, eps, n_chunks):
    t = pl.program_id(0)
    px, py = _pixel_grids(t, tile_px, tx_n, height, width, multiplier)
    p = tile_px * tile_px
    best_z[:, :] = jnp.full((p, 1), _NEG, jnp.float32)
    best_id[:, :] = jnp.full((p, 1), -1, jnp.int32)

    def body(i, _):
        @pl.when(occ_ref[0, 0, i] != 0)
        def _():
            c0 = pl.multiple_of(i * _CHUNK, _CHUNK)
            vx = _face_rows(faces_ref, c0, range(6))
            zs = _face_rows(faces_ref, c0, (6, 7, 8))
            alive = _face_rows(faces_ref, c0, [_R_ALIVE])[0]

            # kernel math rasterization_cuda.cu:131-149
            ax = vx[0] - px
            ay = vx[1] - py
            bx = vx[2] - px
            by = vx[3] - py
            cx = vx[4] - px
            cy = vx[5] - py
            w0 = bx * cy - by * cx
            w1 = cx * ay - cy * ax
            w2 = ax * by - ay * bx
            norm = w0 + w1 + w2
            norm = norm + jnp.where(norm >= 0, eps, -eps)
            inv = 1.0 / norm
            w0 = w0 * inv
            w1 = w1 * inv
            w2 = w2 * inv
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (alive > 0)
            z = w0 * zs[0] + w1 * zs[1] + w2 * zs[2]
            z = jnp.where(inside, z, _NEG)                   # (P, chunk)

            chunk_max = jnp.max(z, axis=1, keepdims=True)    # (P, 1)
            fid = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + c0
            big = jnp.int32(2 ** 30)
            # ties → lowest face id, matching jnp.argmax
            chunk_id = jnp.min(jnp.where(z == chunk_max, fid, big), axis=1,
                               keepdims=True)
            take = chunk_max > best_z[:, :]
            best_id[:, :] = jnp.where(take, chunk_id, best_id[:, :])
            best_z[:, :] = jnp.where(take, chunk_max, best_z[:, :])
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    out_ref[0, :, :] = jnp.where(best_z[:, :] > _NEG, best_id[:, :], -1)


def rasterize_search_pallas(face_vertices_z, face_vertices_image, valid_mask,
                            multiplier, eps, height, width, tile_px,
                            interpret=False):
    """Winner search → (H, W) int32 global face ids (−1 = miss). Exact at
    any face density — no capacity bounds anywhere."""
    f = face_vertices_z.shape[0]
    tx_n = width // tile_px
    t_n = (height // tile_px) * tx_n
    p = tile_px * tile_px
    faces, f_pad = pack_faces(face_vertices_image, face_vertices_z,
                              valid_mask)
    occ = chunk_occupancy(face_vertices_image, valid_mask, height, width,
                          multiplier, tile_px, 0.0, f_pad)
    n_chunks = f_pad // _CHUNK
    kern = functools.partial(
        _winner_kernel, tile_px=tile_px, tx_n=tx_n, height=float(height),
        width=float(width), multiplier=float(multiplier), eps=float(eps),
        n_chunks=n_chunks)
    ids = pl.pallas_call(
        kern,
        grid=(t_n,),
        in_specs=[
            pl.BlockSpec((_ROWS, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n_chunks), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, p, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_n, p, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((p, 1), jnp.float32),
                        pltpu.VMEM((p, 1), jnp.int32)],
        interpret=interpret,
    )(faces, occ)
    ty = height // tile_px
    return ids[:, :, 0].reshape(ty, tx_n, tile_px, tile_px) \
        .transpose(0, 2, 1, 3).reshape(height, width)
