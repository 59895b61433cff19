"""Point-in-mesh test by ray-parity counting.

TPU-native analog of reference ``kaolin/ops/mesh/check_sign.py:59`` (CUDA
kernel ``csrc/ops/mesh/mesh_intersection_cuda.cu``; CPU fallback via the
TriangleHash C++ class). Casts a +z ray from each query point and uses the
parity of triangle crossings. The 2D point-in-triangle test uses half-open
edge rules so shared edges are counted exactly once.

Implemented as a ``lax.scan`` over face tiles — O(N·tile) memory, all
vectorized compares on the VPU.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["check_sign"]

_TILE = 1024


@functools.partial(jax.jit, static_argnames=("tile",))
def _unbatched_check_sign(verts, faces, points, tile=_TILE):
    fv = verts[faces]  # (F, 3, 3)
    f = fv.shape[0]
    num_tiles = -(-f // tile)
    fv = jnp.pad(fv, ((0, num_tiles * tile - f), (0, 0), (0, 0)))
    fv_tiles = fv.reshape(num_tiles, tile, 3, 3)

    def crossings(p, tri, valid):
        """p (N, 3), tri (T, 3, 3) → (N,) int32 crossing counts."""
        v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
        # 2D edge functions in xy, evaluated at p (N, 1, 2) vs tri (1, T, ...)
        px = p[:, None, 0]
        py = p[:, None, 1]

        def edge(a, b):
            return ((b[None, :, 0] - a[None, :, 0]) * (py - a[None, :, 1])
                    - (b[None, :, 1] - a[None, :, 1]) * (px - a[None, :, 0]))

        e0 = edge(v0, v1)
        e1 = edge(v1, v2)
        e2 = edge(v2, v0)
        inside = ((e0 > 0) & (e1 > 0) & (e2 > 0)) | ((e0 < 0) & (e1 < 0) & (e2 < 0))
        # barycentric z at (px, py)
        area = e0 + e1 + e2  # 2*signed area, (N, T) via broadcast of edges at p...
        # note: e1 is the subtriangle opposite v0 etc.
        w0 = e1 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        w1 = e2 / jnp.where(jnp.abs(area) > 1e-12, area, 1.0)
        w2 = 1.0 - w0 - w1
        z = w0 * v0[None, :, 2] + w1 * v1[None, :, 2] + w2 * v2[None, :, 2]
        hit = inside & (z > p[:, None, 2]) & valid[None, :]
        return jnp.sum(hit.astype(jnp.int32), axis=1)

    def body(count, inp):
        fv_t, t_idx = inp
        row = jax.lax.broadcasted_iota(jnp.int32, (tile,), 0) + t_idx * tile
        return count + crossings(points, fv_t, row < f), None

    init = jnp.zeros((points.shape[0],), dtype=jnp.int32)
    count, _ = jax.lax.scan(body, init,
                            (fv_tiles, jnp.arange(num_tiles, dtype=jnp.int32)))
    return (count % 2) == 1


def check_sign(verts, faces, points, hash_resolution=512, backend=None):
    """True for points inside a watertight mesh.

    Args:
        verts: (B, V, 3).
        faces: (F, 3) int.
        points: (B, N, 3).
        hash_resolution: grid size of the native TriangleHash backend (the
            reference CPU-path knob).
        backend: None (XLA, jittable) or "native" — the C++ TriangleHash
            host path (ref ``csrc/ops/mesh/triangle_hash.cpp``), fastest for
            eager host-side queries; falls back to XLA if the native library
            is unavailable.

    Returns:
        bool array (B, N). Ref ``check_sign.py:59``.
    """
    faces = jnp.asarray(faces)
    # normalize by max bbox extent as the reference does (:139-144)
    extent = jnp.max(verts, axis=1) - jnp.min(verts, axis=1)  # (B, 3)
    maxlen = jnp.max(extent, axis=-1)[:, None, None]
    verts = verts / maxlen
    points = points / maxlen
    if backend == "native":
        import numpy as np

        from kaolin_tpu import native
        if native.is_available():
            faces_np = np.asarray(faces)
            out = [native.check_sign_cpu(np.asarray(v), faces_np,
                                         np.asarray(p),
                                         resolution=min(hash_resolution, 1024))
                   for v, p in zip(verts, points)]
            return jnp.asarray(np.stack(out))
    return jax.vmap(lambda v, p: _unbatched_check_sign(v, faces, p))(verts, points)
