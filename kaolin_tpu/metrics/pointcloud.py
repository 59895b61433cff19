"""Point-cloud metrics: sided distance, chamfer, f-score.

TPU-native analog of reference ``kaolin/metrics/pointcloud.py`` (sided_distance
:52, chamfer_distance :89, f_score :138) which dispatches to the CUDA 1-NN
kernel ``csrc/metrics/sided_distance_cuda.cu``.

Design: the 1-NN search runs as a ``lax.scan`` over tiles of ``p2`` with the
pairwise block computed as ``|p1|² + |p2|² − 2·p1ᵀp2`` — the dot product is a
matmul that lands on the MXU, and tiling bounds memory to
``O(N·tile)`` instead of ``O(N·M)``. Gradients flow by re-gathering the
winning neighbor (``stop_gradient`` on the argmin), which reproduces the
reference's hand-written backward exactly.
"""

import functools

import jax
import jax.numpy as jnp

__all__ = ["sided_distance", "chamfer_distance", "f_score"]

_TILE = 2048


def _pad_to(x, n, axis=0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("tile",))
def _sided_nn_idx(p1, p2, tile=_TILE):
    """Unbatched argmin_j ||p1_i - p2_j||² → (N,) int32 indices."""
    m = p2.shape[0]
    num_tiles = -(-m // tile)
    p2_pad = _pad_to(p2, num_tiles * tile)
    p2_tiles = p2_pad.reshape(num_tiles, tile, 3)
    p1_sq = jnp.sum(p1 * p1, axis=-1)  # (N,)

    def body(carry, inp):
        best_d, best_i = carry
        p2_t, t_idx = inp
        p2_sq = jnp.sum(p2_t * p2_t, axis=-1)  # (tile,)
        # (N, tile) block; matmul on MXU
        d = (p1_sq[:, None] + p2_sq[None, :]
             - 2.0 * jnp.dot(p1, p2_t.T, preferred_element_type=p1.dtype))
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + t_idx * tile
        d = jnp.where(col < m, d, jnp.inf)
        tmin = jnp.min(d, axis=1)
        targ = jnp.argmin(d, axis=1).astype(jnp.int32) + t_idx * tile
        take = tmin < best_d
        return (jnp.where(take, tmin, best_d), jnp.where(take, targ, best_i)), None

    init = (jnp.full((p1.shape[0],), jnp.inf, dtype=p1.dtype),
            jnp.zeros((p1.shape[0],), dtype=jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (p2_tiles, jnp.arange(num_tiles, dtype=jnp.int32)))
    del best_d
    return best_i


def sided_distance(p1, p2):
    """For each point in p1, squared distance to (and index of) its nearest
    neighbor in p2.

    Args:
        p1: (B, N, 3) float array.
        p2: (B, M, 3) float array.

    Returns:
        (dist (B, N), idx (B, N) int32). Differentiable w.r.t. both inputs.
        Ref ``metrics/pointcloud.py:52``.
    """
    idx = jax.vmap(_sided_nn_idx)(jax.lax.stop_gradient(p1),
                                  jax.lax.stop_gradient(p2))
    nearest = jnp.take_along_axis(p2, idx[..., None].astype(jnp.int32), axis=1)
    dist = jnp.sum((p1 - nearest) ** 2, axis=-1)
    return dist, idx


def _doctest_anchor():
    """
    Example:
        >>> import jax.numpy as jnp
        >>> p1 = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]])
        >>> p2 = jnp.asarray([[[0.0, 0.0, 1.0]]])
        >>> print(chamfer_distance(p1, p2))
        [2.5]
        >>> dist, idx = sided_distance(p1, p2)
        >>> print(dist)
        [[1. 2.]]
        >>> print(idx)
        [[0 0]]
    """


def chamfer_distance(p1, p2, w1=1.0, w2=1.0, squared=True):
    """Symmetric chamfer distance between batched point clouds (B, N, 3) /
    (B, M, 3) → (B,). Ref :89."""
    dist_to_p2 = sided_distance(p1, p2)[0]
    dist_to_p1 = sided_distance(p2, p1)[0]
    if not squared:
        dist_to_p2 = jnp.sqrt(jnp.clip(dist_to_p2, 1e-12, None))
        dist_to_p1 = jnp.sqrt(jnp.clip(dist_to_p1, 1e-12, None))
    return w1 * jnp.mean(dist_to_p2, axis=-1) + w2 * jnp.mean(dist_to_p1, axis=-1)


def f_score(gt_points, pred_points, radius=0.01, eps=1e-8):
    """F-score of predicted points vs ground truth at ``radius`` → (B,).
    Ref :138."""
    pred_to_gt = sided_distance(pred_points, gt_points)[0]
    gt_to_pred = sided_distance(gt_points, pred_points)[0]
    fp = jnp.mean((pred_to_gt > radius ** 2).astype(jnp.float32), axis=-1)
    fn = jnp.mean((gt_to_pred > radius ** 2).astype(jnp.float32), axis=-1)
    precision = 1.0 - fp
    recall = 1.0 - fn
    return 2.0 * (precision * recall) / (precision + recall + eps)
