"""Pointcloud conversions. Ref ``kaolin/ops/conversions/pointcloud.py``
(pointclouds_to_voxelgrids :77, unbatched_pointcloud_to_spc :143)."""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pointclouds_to_voxelgrids", "unbatched_pointcloud_to_spc"]


def _base_points_to_voxelgrids(pointclouds, resolution):
    """Normalized [0,1] points → binary occupancy grids via scatter.

    Matches the reference cell assignment exactly (ref :54):
    ``round(p * (resolution - 1))``, keeping only indices that land in
    [0, resolution-1] after rounding."""
    b, n, _ = pointclouds.shape
    coords = jnp.round(pointclouds * (resolution - 1)).astype(jnp.int32)
    in_range = jnp.all((coords >= 0) & (coords <= resolution - 1), axis=-1)
    coords = jnp.clip(coords, 0, resolution - 1)
    vg = jnp.zeros((b, resolution, resolution, resolution), dtype=jnp.float32)
    bidx = jnp.repeat(jnp.arange(b), n)
    flat = coords.reshape(-1, 3)
    vals = in_range.reshape(-1).astype(jnp.float32)
    return vg.at[bidx, flat[:, 0], flat[:, 1], flat[:, 2]].max(vals)


def pointclouds_to_voxelgrids(pointclouds, resolution, origin=None, scale=None,
                              return_sparse=False):
    """(B, N, 3) points → (B, R, R, R) binary occupancy. Ref :77.
    ``return_sparse`` accepted for API parity (dense output here)."""
    if not isinstance(resolution, int):
        raise TypeError(f"expected int resolution, got {type(resolution)}")
    if origin is None:
        origin = jnp.min(pointclouds, axis=1)
    if scale is None:
        scale = jnp.max(jnp.max(pointclouds, axis=1) - origin, axis=1)
    normalized = (pointclouds - origin[:, None, :]) / scale.reshape(-1, 1, 1)
    return _base_points_to_voxelgrids(normalized, resolution)


def unbatched_pointcloud_to_spc(pointcloud, level, features=None):
    """Unbatched [-1,1] pointcloud → Spc (single-item batch), features of
    colliding points mean-averaged per cell. Ref :143."""
    from kaolin_tpu.ops.spc import (
        morton_to_points,
        points_to_morton,
        quantize_points,
        unbatched_points_to_octree,
    )
    from kaolin_tpu.rep.spc import Spc

    points = np.asarray(quantize_points(pointcloud, level))
    unique, unique_keys, unique_counts = np.unique(
        points, axis=0, return_inverse=True, return_counts=True)
    morton = np.sort(np.asarray(points_to_morton(unique)))
    order = np.argsort(np.asarray(points_to_morton(unique)))
    sorted_points = morton_to_points(jnp.asarray(morton))
    octree = unbatched_points_to_octree(np.asarray(sorted_points), level,
                                        sorted=True)

    feat = None
    if features is not None:
        feats_np = np.asarray(features).astype(np.float64)
        acc = np.zeros((unique.shape[0], feats_np.shape[1]))
        np.add.at(acc, unique_keys, feats_np)
        acc /= unique_counts[:, None]
        if not np.issubdtype(np.asarray(features).dtype, np.floating):
            acc = np.round(acc)
        feat = jnp.asarray(acc[order].astype(np.asarray(features).dtype))

    lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
    spc = Spc(octrees=octree, lengths=lengths)
    spc.features = feat
    return spc
