"""Voxelgrid ops: downsample, surface extraction, fill, ODMs.

TPU-native analog of reference ``kaolin/ops/voxelgrid.py`` (downsample :21,
extract_surface :92, fill :143, extract_odms :208, project_odms :307).
Pooling uses ``lax.reduce_window`` (XLA's native windowed reduce, maps
straight to TPU vector units); ``fill`` uses an iterative flood fill from the
boundary expressed as a ``lax.while_loop`` of 6-neighborhood dilations.
"""

import jax
import jax.numpy as jnp

__all__ = ["downsample", "extract_surface", "fill", "extract_odms", "project_odms"]


def _avg_pool3d(x, kernel, stride, padding):
    """x (B, X, Y, Z) → average pool. kernel/stride/padding 3-tuples."""
    window = (1,) + tuple(kernel)
    strides = (1,) + tuple(stride)
    pads = ((0, 0),) + tuple((p, p) for p in padding)
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    return summed / float(kernel[0] * kernel[1] * kernel[2])


def downsample(voxelgrids, scale):
    """Average-pool a voxelgrid (B, X, Y, Z) by integer scale(s). Ref :21."""
    if isinstance(scale, int):
        scale = [scale] * 3
    if len(scale) != 3:
        raise ValueError(f"expected scale of length 3, got {len(scale)}")
    for i, s in enumerate(scale):
        if s < 1:
            raise ValueError(f"downsample ratio must be >= 1, got {s} at {i}")
        if s > voxelgrids.shape[i + 1]:
            raise ValueError(f"downsample ratio {s} > grid dim {voxelgrids.shape[i + 1]}")
    v = voxelgrids.astype(jnp.float32)
    return _avg_pool3d(v, scale, scale, (0, 0, 0))


def extract_surface(voxelgrids, mode="wide"):
    """Keep only voxels touching an empty voxel. Ref :92."""
    v = voxelgrids.astype(jnp.float32)
    vb = voxelgrids.astype(bool)
    if mode == "wide":
        pooled = _avg_pool3d(v, (3, 3, 3), (1, 1, 1), (1, 1, 1))
        return (pooled < 1) & vb
    elif mode == "thin":
        px = _avg_pool3d(v, (3, 1, 1), (1, 1, 1), (1, 0, 0))
        py = _avg_pool3d(v, (1, 3, 1), (1, 1, 1), (0, 1, 0))
        pz = _avg_pool3d(v, (1, 1, 3), (1, 1, 1), (0, 0, 1))
        return ((px < 1) | (py < 1) | (pz < 1)) & vb
    raise ValueError(f'mode "{mode}" is not supported')


def _dilate6(x):
    """6-neighborhood binary dilation of (B, X, Y, Z) bool."""
    f = x.astype(jnp.float32)
    out = f
    for axis, k in ((1, (3, 1, 1)), (2, (1, 3, 1)), (3, (1, 1, 3))):
        pads = ((0, 0),) + tuple((1, 1) if k[i - 1] == 3 else (0, 0) for i in (1, 2, 3))
        out = jnp.maximum(out, jax.lax.reduce_window(
            f, 0.0, jax.lax.max, (1,) + k, (1, 1, 1, 1), pads))
    return out > 0


def fill(voxelgrids):
    """Fill internal holes (binary_fill_holes semantics): flood the exterior
    from the padded boundary, then complement. Not differentiable. Ref :143."""
    occupied = voxelgrids.astype(bool)
    # pad with empty so the flood starts outside the object everywhere
    padded = jnp.pad(occupied, ((0, 0), (1, 1), (1, 1), (1, 1)))
    free = ~padded
    seed = jnp.zeros_like(free).at[:, 0, :, :].set(free[:, 0, :, :])

    def cond(state):
        prev, cur = state
        return jnp.any(prev != cur)

    def body(state):
        _, cur = state
        return cur, _dilate6(cur) & free

    first = _dilate6(seed) & free
    _, outside = jax.lax.while_loop(cond, body, (seed, first))
    filled = ~outside[:, 1:-1, 1:-1, 1:-1]
    return filled


def extract_odms(voxelgrids):
    """Orthographic depth maps from the 6 axis views → (B, 6, D, D) int.
    Face order: z_neg, z_pos, y_neg, y_pos, x_neg, x_pos. Ref :208."""
    vb = voxelgrids.astype(bool)
    dim = vb.shape[-1]
    mult = jnp.arange(1, dim + 1)
    rmult = jnp.arange(dim, 0, -1)
    full = jnp.stack([mult, rmult], axis=0)  # (2, D)

    z_vals = jnp.max(vb[:, None] * full.reshape(1, 2, 1, 1, -1), axis=4)
    y_vals = jnp.max(vb[:, None] * full.reshape(1, 2, 1, -1, 1), axis=3)
    x_vals = jnp.max(vb[:, None] * full.reshape(1, 2, -1, 1, 1), axis=2)
    return dim - jnp.concatenate([z_vals, y_vals, x_vals], axis=1)


def project_odms(odms, voxelgrids=None, votes=1):
    """Carve a voxelgrid with 6 orthographic depth maps. Ref :307."""
    if odms.shape[1] != 6:
        raise ValueError(f"expected 6 odms, got {odms.shape[1]}")
    batch_size = odms.shape[0]
    dim = odms.shape[-1]
    if voxelgrids is None:
        voxelgrids = jnp.ones((batch_size, dim, dim, dim), dtype=bool)
    elif voxelgrids.shape != (batch_size, dim, dim, dim):
        raise ValueError("voxelgrids shape mismatch with odms")

    upd = odms.reshape(batch_size, 3, 2, dim, dim)
    upd = upd.at[:, :, 0].set(dim - upd[:, :, 0])
    upd = upd.reshape(batch_size, 6, dim, dim)
    base = jnp.arange(dim)

    z_neg = (base.reshape(1, 1, 1, -1) >= upd[:, 0][..., None]).astype(jnp.int32)
    z_pos = (base.reshape(1, 1, 1, -1) < upd[:, 1][..., None]).astype(jnp.int32)
    y_neg = (base.reshape(1, 1, -1, 1) >= upd[:, 2][..., None, :]).astype(jnp.int32)
    y_pos = (base.reshape(1, 1, -1, 1) < upd[:, 3][..., None, :]).astype(jnp.int32)
    x_neg = (base.reshape(1, -1, 1, 1) >= upd[:, 4][:, None]).astype(jnp.int32)
    x_pos = (base.reshape(1, -1, 1, 1) < upd[:, 5][:, None]).astype(jnp.int32)
    sum_of_mask = z_neg + z_pos + y_neg + y_pos + x_neg + x_pos
    return (voxelgrids.astype(jnp.int32) * votes - sum_of_mask) > 0
