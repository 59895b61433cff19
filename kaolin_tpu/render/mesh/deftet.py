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


def _hit_depths(pixel_coords, render_ranges, face_vertices_z,
                face_vertices_image, valid_faces, eps):
    """(P, F) interpolated depths, -inf where the pixel misses the face."""
    px = pixel_coords[:, 0:1]  # (P, 1)
    py = pixel_coords[:, 1:2]
    w0, w1, w2 = _barycentrics(px, py, face_vertices_image[None], eps)
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    z = (w0 * face_vertices_z[None, :, 0] + w1 * face_vertices_z[None, :, 1]
         + w2 * face_vertices_z[None, :, 2])  # (P, F)
    in_range = (z >= render_ranges[:, 0:1]) & (z <= render_ranges[:, 1:2])
    hit = inside & in_range & valid_faces[None]
    return jnp.where(hit, z, -jnp.inf)


def _pad_knum(top_idx, knum, k):
    if k < knum:
        pad = jnp.full((top_idx.shape[0], knum - k), -1, dtype=top_idx.dtype)
        top_idx = jnp.concatenate([top_idx, pad], axis=1)
    return top_idx


def _render_single(pixel_coords, render_ranges, face_vertices_z,
                   face_vertices_image, valid_faces, knum, eps,
                   face_chunk=1024, pixel_chunk=8192):
    """Unbatched winner search → (P, knum) face indices (-1 padded),
    depth-sorted (closest first).

    Small face counts take one dense (P, F) pass. Larger scenes stream: a
    running per-pixel top-k is folded over face chunks inside a
    ``lax.scan``, and pixels are processed in blocks via ``lax.map`` — the
    TPU equivalent of the reference kernel's per-pixel binning
    (``deftet_cuda.cu``: each pixel walks its candidate list keeping the
    closest knum). Peak memory O(pixel_chunk * face_chunk) instead of
    O(P * F), results identical."""
    p = pixel_coords.shape[0]
    f = face_vertices_z.shape[0]
    k = min(knum, f)
    if f <= face_chunk or p <= 1:
        z_masked = _hit_depths(pixel_coords, render_ranges, face_vertices_z,
                               face_vertices_image, valid_faces, eps)
        top_z, top_idx = jax.lax.top_k(z_masked, k)  # closest (max z) first
        top_idx = jnp.where(jnp.isfinite(top_z), top_idx, -1)
        return _pad_knum(top_idx, knum, k)

    n_chunks = -(-f // face_chunk)
    f_pad = n_chunks * face_chunk
    fz = jnp.pad(face_vertices_z, ((0, f_pad - f), (0, 0)))
    fi = jnp.pad(face_vertices_image, ((0, f_pad - f), (0, 0), (0, 0)))
    vm = jnp.pad(valid_faces, (0, f_pad - f))
    fz = fz.reshape(n_chunks, face_chunk, 3)
    fi = fi.reshape(n_chunks, face_chunk, 3, 2)
    vm = vm.reshape(n_chunks, face_chunk)
    chunk_base = jnp.arange(n_chunks, dtype=jnp.int32) * face_chunk

    n_blocks = -(-p // pixel_chunk)
    p_pad = n_blocks * pixel_chunk
    pc = jnp.pad(pixel_coords, ((0, p_pad - p), (0, 0)))
    rr = jnp.pad(render_ranges, ((0, p_pad - p), (0, 0)))
    pc = pc.reshape(n_blocks, pixel_chunk, 2)
    rr = rr.reshape(n_blocks, pixel_chunk, 2)

    def block(args):
        pc_b, rr_b = args

        def body(carry, inp):
            top_z, top_idx = carry
            fz_c, fi_c, vm_c, base = inp
            z_m = _hit_depths(pc_b, rr_b, fz_c, fi_c, vm_c, eps)
            idx = jnp.broadcast_to(base + jnp.arange(face_chunk,
                                                     dtype=jnp.int32),
                                   z_m.shape)
            all_z = jnp.concatenate([top_z, z_m], axis=1)
            all_i = jnp.concatenate([top_idx, idx], axis=1)
            tz, pos = jax.lax.top_k(all_z, k)
            ti = jnp.take_along_axis(all_i, pos, axis=1)
            return (tz, ti), None

        init = (jnp.full((pixel_chunk, k), -jnp.inf,
                         face_vertices_z.dtype),
                jnp.full((pixel_chunk, k), -1, jnp.int32))
        (tz, ti), _ = jax.lax.scan(body, init, (fz, fi, vm, chunk_base))
        return jnp.where(jnp.isfinite(tz), ti, -1)

    top_idx = jax.lax.map(block, (pc, rr)).reshape(p_pad, k)[:p]
    return _pad_knum(top_idx, knum, k)


def deftet_sparse_render(pixel_coords, render_ranges, face_vertices_z,
                         face_vertices_image, face_features, knum=300,
                         valid_faces=None, eps=1e-8, face_chunk=1024,
                         pixel_chunk=8192):
    """Render all intersections per pixel, depth sorted. Returns
    (features (B, P, knum, D) [or list], face_idx (B, P, knum)). Ref :338.

    Scenes with more than ``face_chunk`` faces stream the winner search in
    (``pixel_chunk`` x ``face_chunk``) blocks with a running per-pixel
    top-knum, bounding memory at any face/pixel count (see
    ``_render_single``)."""
    is_list = isinstance(face_features, (list, tuple))
    feats = list(face_features) if is_list else [face_features]
    feat_dims = [f.shape[-1] for f in feats]
    features = jnp.concatenate(feats, axis=-1)
    b, f = face_vertices_z.shape[:2]
    if valid_faces is None:
        valid_faces = jnp.ones((b, f), dtype=bool)

    face_idx = jax.vmap(
        lambda pc, rr, fz, fi, vm: _render_single(pc, rr, fz, fi, vm, knum,
                                                  eps, face_chunk,
                                                  pixel_chunk)
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
