"""DefTet sparse volumetric renderer.

TPU-native analog of reference ``kaolin/render/mesh/deftet.py``
(deftet_sparse_render :338 backed by ``csrc/render/mesh/deftet_cuda.cu``;
naive oracle :101): renders ALL per-pixel face intersections depth-sorted
into padded (num_pixels, knum) buffers instead of only the closest.

Winner search uses ``lax.top_k`` over the per-pixel depth row (fixed-shape);
features are re-interpolated differentiably from the selected faces so AD
reproduces the reference backward.
"""

import jax
import jax.numpy as jnp

from kaolin_tpu.render.mesh.rasterization import _barycentrics

__all__ = ["deftet_sparse_render"]


def _render_single(pixel_coords, render_ranges, face_vertices_z,
                   face_vertices_image, valid_faces, knum, eps):
    """Unbatched winner search → (P, knum) face indices (-1 padded),
    depth-sorted (closest first)."""
    px = pixel_coords[:, 0:1]  # (P, 1)
    py = pixel_coords[:, 1:2]
    w0, w1, w2 = _barycentrics(px, py, face_vertices_image[None], eps)
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    z = (w0 * face_vertices_z[None, :, 0] + w1 * face_vertices_z[None, :, 1]
         + w2 * face_vertices_z[None, :, 2])  # (P, F)
    in_range = (z >= render_ranges[:, 0:1]) & (z <= render_ranges[:, 1:2])
    hit = inside & in_range & valid_faces[None]
    z_masked = jnp.where(hit, z, -jnp.inf)
    k = min(knum, face_vertices_z.shape[0])
    top_z, top_idx = jax.lax.top_k(z_masked, k)  # closest (max z) first
    top_idx = jnp.where(jnp.isfinite(top_z), top_idx, -1)
    if k < knum:
        pad = jnp.full((top_idx.shape[0], knum - k), -1, dtype=top_idx.dtype)
        top_idx = jnp.concatenate([top_idx, pad], axis=1)
    return top_idx


def deftet_sparse_render(pixel_coords, render_ranges, face_vertices_z,
                         face_vertices_image, face_features, knum=300,
                         valid_faces=None, eps=1e-8):
    """Render all intersections per pixel, depth sorted. Returns
    (features (B, P, knum, D) [or list], face_idx (B, P, knum)). Ref :338."""
    is_list = isinstance(face_features, (list, tuple))
    feats = list(face_features) if is_list else [face_features]
    feat_dims = [f.shape[-1] for f in feats]
    features = jnp.concatenate(feats, axis=-1)
    b, f = face_vertices_z.shape[:2]
    if valid_faces is None:
        valid_faces = jnp.ones((b, f), dtype=bool)

    face_idx = jax.vmap(
        lambda pc, rr, fz, fi, vm: _render_single(pc, rr, fz, fi, vm, knum,
                                                  eps)
    )(jax.lax.stop_gradient(pixel_coords),
      jax.lax.stop_gradient(render_ranges),
      jax.lax.stop_gradient(face_vertices_z),
      jax.lax.stop_gradient(face_vertices_image), valid_faces)

    safe = jnp.clip(face_idx, 0, None)
    sel_v = jnp.take_along_axis(
        face_vertices_image.reshape(b, f, 6),
        safe.reshape(b, -1, 1), axis=1).reshape(
        b, face_idx.shape[1], knum, 3, 2)
    sel_feat = jnp.take_along_axis(
        features.reshape(b, f, -1), safe.reshape(b, -1, 1), axis=1).reshape(
        b, face_idx.shape[1], knum, 3, features.shape[-1])

    px = pixel_coords[..., None, 0]
    py = pixel_coords[..., None, 1]
    w0, w1, w2 = _barycentrics(px, py, sel_v, eps)
    out = (w0[..., None] * sel_feat[..., 0, :]
           + w1[..., None] * sel_feat[..., 1, :]
           + w2[..., None] * sel_feat[..., 2, :])
    out = jnp.where((face_idx >= 0)[..., None], out, 0.0)

    if is_list:
        outs = []
        start = 0
        for d in feat_dims:
            outs.append(out[..., start:start + d])
            start += d
        return outs, face_idx
    return out, face_idx
