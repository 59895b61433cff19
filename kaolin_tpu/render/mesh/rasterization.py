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

__all__ = ["rasterize"]

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
    """Unbatched winner search → (face_idx (H, W) int32). Non-differentiable."""
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


def rasterize(height, width, face_vertices_z, face_vertices_image,
              face_features, valid_faces=None, multiplier=None, eps=None,
              backend=None):
    """Differentiable rasterization to feature images.

    Args:
        height, width: static ints.
        face_vertices_z: (B, F, 3) camera-space z per face vertex.
        face_vertices_image: (B, F, 3, 2) image-plane coords in [-1, 1].
        face_features: (B, F, 3, D) or list of such.
        valid_faces: optional (B, F) bool.
        multiplier: coordinate scale for numerics (default 1000).
        eps: barycentric normalization epsilon (default 1e-8).
        backend: accepted for API parity (single XLA backend here).

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
    face_idx = jax.vmap(
        lambda z, v, m: _rasterize_search(height, width, z, v, m,
                                          multiplier, eps)
    )(jax.lax.stop_gradient(face_vertices_z),
      jax.lax.stop_gradient(scaled),
      valid_mask)

    # differentiable re-computation at winners
    safe_idx = jnp.clip(face_idx, 0, None)
    sel_v = jnp.take_along_axis(
        scaled.reshape(b, f, 6), safe_idx.reshape(b, -1, 1), axis=1
    ).reshape(b, height, width, 3, 2)
    sel_feat = jnp.take_along_axis(
        features.reshape(b, f, -1), safe_idx.reshape(b, -1, 1), axis=1
    ).reshape(b, height, width, 3, features.shape[-1])

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
