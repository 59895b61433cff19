"""3D gaussians → voxelgrid overlap + opacity integration.

TPU-native analog of reference ``kaolin/ops/conversions/gaussians.py:24``
(CUDA ``gs_to_spc_cuda.cu``: hierarchical gaussian/octant subdivision +
opacity integration). Here: per-gaussian iso-ellipsoid AABBs enumerate
candidate voxels (host, construction-time op — not differentiable, like the
reference), gaussian density is integrated with ``step`` samples per voxel,
and per-voxel opacities combine as ``1 − ∏(1 − α)``.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["gs_to_voxelgrid"]


def _quat_to_mat_np(q):
    """wxyz quaternions (N, 4) → rotation matrices (N, 3, 3)."""
    q = q / np.clip(np.linalg.norm(q, axis=-1, keepdims=True), 1e-12, None)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                  2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                  2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                  1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def gs_to_voxelgrid(xyz, scales, rots, opacities, level, iso=11.345,
                    tol=1.0 / 8.0, step=10):
    """Voxelize gaussians at resolution 2^level (coordinates assumed in
    [-1, 1]). Returns (voxel coords (V, 3) int16 morton-sorted,
    accumulated opacities (V,)). Ref :24."""
    from kaolin_tpu.ops.spc.points import points_to_morton

    xyz = np.asarray(xyz, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    rots = np.asarray(rots, dtype=np.float64)
    opacities = np.asarray(opacities, dtype=np.float64).reshape(-1)
    res = 2 ** level
    voxel_size = 2.0 / res

    # covariance with numerically-invertible clamped scales (ref tol)
    s = np.clip(scales, tol * voxel_size, None)
    r = _quat_to_mat_np(rots)
    cov = r @ (s[:, :, None] ** 2 * np.swapaxes(r, -1, -2))
    cov_inv = np.linalg.inv(cov)

    # iso-ellipsoid AABB half extents: sqrt(iso * diag(cov))
    half = np.sqrt(iso * np.einsum("nii->ni", cov))
    lo = np.floor((xyz - half + 1.0) / voxel_size).astype(np.int64)
    hi = np.floor((xyz + half + 1.0) / voxel_size).astype(np.int64)
    lo = np.clip(lo, 0, res - 1)
    hi = np.clip(hi, 0, res - 1)

    # enumerate candidate (gaussian, voxel) pairs
    counts = np.prod(hi - lo + 1, axis=1)
    g_ids = np.repeat(np.arange(xyz.shape[0]), counts)
    vox = np.empty((counts.sum(), 3), dtype=np.int64)
    pos = 0
    for i in range(xyz.shape[0]):
        nx, ny, nz = (hi[i] - lo[i] + 1)
        gx, gy, gz = np.meshgrid(np.arange(lo[i, 0], hi[i, 0] + 1),
                                 np.arange(lo[i, 1], hi[i, 1] + 1),
                                 np.arange(lo[i, 2], hi[i, 2] + 1),
                                 indexing="ij")
        n = nx * ny * nz
        vox[pos:pos + n] = np.stack([gx, gy, gz], -1).reshape(-1, 3)
        pos += n

    centers = (vox + 0.5) * voxel_size - 1.0
    d = centers - xyz[g_ids]
    ci = cov_inv[g_ids]
    maha = np.einsum("ni,nij,nj->n", d, ci, d)
    keep = maha <= iso
    vox, g_ids, d, ci = vox[keep], g_ids[keep], d[keep], ci[keep]

    # opacity integration: average gaussian density over `step` samples
    # along the voxel's main axis through its center
    ts = (np.arange(step) + 0.5) / step - 0.5  # [-0.5, 0.5)
    offsets = ts[:, None] * voxel_size  # samples along z
    dz = d[None, :, 2:3] + offsets[:, None]  # (step, M, 1)
    dd = np.broadcast_to(d[None], (step,) + d.shape).copy()
    dd[..., 2] = dz[..., 0]
    m = np.einsum("sni,nij,snj->sn", dd, ci, dd)
    dens = np.exp(-0.5 * m).mean(axis=0)
    alpha = np.clip(opacities[g_ids] * dens, 0.0, 0.9999)

    # combine per voxel in morton order
    morton = np.asarray(points_to_morton(vox))
    order = np.argsort(morton, kind="stable")
    morton, alpha = morton[order], alpha[order]
    uniq, inverse = np.unique(morton, return_inverse=True)
    log_t = np.zeros(uniq.shape[0])
    np.add.at(log_t, inverse, np.log1p(-alpha))
    sum_opacity = 1.0 - np.exp(log_t)

    from kaolin_tpu.ops.spc.points import morton_to_points
    points = morton_to_points(jnp.asarray(uniq))
    return points, jnp.asarray(sum_opacity.astype(np.float32))