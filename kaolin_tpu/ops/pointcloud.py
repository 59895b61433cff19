"""Point-cloud ops: centering, farthest-point sampling.

TPU-native analog of reference ``kaolin/ops/pointcloud.py`` (center_points
:25, farthest_point_sampling :52 — a chunked Warp GPU kernel there). FPS here
is a jitted ``lax.scan`` of k steps: each step updates the running
min-distance field (one fused VPU pass over N points) and argmaxes — O(kN)
like the reference, no host sync.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["center_points", "farthest_point_sampling"]


def center_points(points, normalize=False, eps=1e-6):
    """Center each cloud at the origin; optionally scale to [-0.5, 0.5].
    (B, N, C) → same shape. Ref :25."""
    assert points.ndim == 3, f"unexpected shape {points.shape}"
    vmin = jnp.min(points, axis=1, keepdims=True)
    vmax = jnp.max(points, axis=1, keepdims=True)
    res = points - (vmin + vmax) / 2
    if normalize:
        den = jnp.clip(jnp.max(vmax - vmin, axis=-1, keepdims=True), eps, None)
        res = res / den
    return res


@functools.partial(jax.jit, static_argnames=("k",))
def _fps_unbatched(points, k):
    n = points.shape[0]
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    safe_pts = jnp.where(finite[:, None], points, 0.0)
    # first point: farthest from the center of the cloud (ref :52 docstring)
    center = jnp.mean(safe_pts, axis=0)
    d0 = jnp.sum((safe_pts - center) ** 2, axis=-1)
    d0 = jnp.where(finite, d0, -1.0)  # inf/nan points sampled last (ref _INVALID_DIST)
    first = jnp.argmax(d0).astype(jnp.int32)

    def body(carry, _):
        min_dist, last_idx = carry
        last_pt = safe_pts[last_idx]
        d = jnp.sum((safe_pts - last_pt) ** 2, axis=-1)
        d = jnp.where(finite, d, -1.0)
        min_dist = jnp.minimum(min_dist, d)
        min_dist = min_dist.at[last_idx].set(-2.0)  # taken (ref _TAKEN_DIST)
        nxt = jnp.argmax(min_dist).astype(jnp.int32)
        return (min_dist, nxt), last_idx

    init = (jnp.full((n,), jnp.inf, dtype=points.dtype), first)
    _, idx = jax.lax.scan(body, init, None, length=k)
    return idx


def farthest_point_sampling(points, k):
    """Blue-noise subset selection: (B, N, 3) → indices (B, k) int32.
    First point is the one most distant from the center; always returns k
    distinct indices even with inf/NaN coordinates. Ref :52."""
    assert points.ndim == 3, f"unexpected shape {points.shape}"
    return jax.vmap(lambda p: _fps_unbatched(p, k))(points)
