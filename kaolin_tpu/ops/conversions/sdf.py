"""SDF → voxelgrid via multiresolution isosurface extraction (MISE).

TPU-native analog of reference ``kaolin/ops/conversions/sdf.py:48`` backed by
the MISE C++ class (``csrc/ops/conversions/mise/mise.cpp``): instead of
evaluating the SDF densely at the final resolution, an occupancy octree is
refined only around the surface — batched numpy refinement driving jnp/user
SDF evaluations.
"""

import jax.numpy as jnp
import numpy as np

__all__ = ["sdf_to_voxelgrids"]


def sdf_to_voxelgrids(sdf, bbox_center=0.0, bbox_dim=1.0, init_res=32,
                      upsampling_steps=0):
    """Evaluate each callable SDF on an adaptively-refined grid →
    (B, R+1, R+1, R+1) binary voxelgrids with R = init_res·2^steps. Ref :48."""
    if not isinstance(sdf, (list, tuple)):
        raise TypeError("sdf must be a list of callables")
    out = []
    final_res = init_res * 2 ** upsampling_steps
    for f in sdf:
        occ = _mise_single(f, bbox_center, bbox_dim, init_res,
                           upsampling_steps, final_res)
        out.append(occ)
    return jnp.asarray(np.stack(out, axis=0).astype(np.float32))


def _eval(f, coords, bbox_center, bbox_dim, final_res):
    """coords: integer grid coords at final resolution (N, 3) → occupancy."""
    pts = (coords.astype(np.float64) / final_res - 0.5) * bbox_dim + bbox_center
    vals = np.asarray(f(jnp.asarray(pts.astype(np.float32))))
    return vals <= 0  # inside


def _mise_single(f, bbox_center, bbox_dim, init_res, upsampling_steps,
                 final_res):
    occ = np.full((final_res + 1,) * 3, -1, dtype=np.int8)  # -1 unknown

    # initial dense evaluation at init_res
    step = final_res // init_res
    base = np.arange(0, final_res + 1, step)
    gx, gy, gz = np.meshgrid(base, base, base, indexing="ij")
    coarse = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    inside = _eval(f, coarse, bbox_center, bbox_dim, final_res)
    occ[coarse[:, 0], coarse[:, 1], coarse[:, 2]] = inside.astype(np.int8)

    # refinement: subdivide cells whose corners disagree
    cur_step = step
    while cur_step > 1:
        idx = np.arange(0, final_res, cur_step)
        cx, cy, cz = np.meshgrid(idx, idx, idx, indexing="ij")
        cells = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
        corners = cells[:, None, :] + cur_step * np.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)])
        cv = occ[corners[..., 0], corners[..., 1], corners[..., 2]]
        known = np.all(cv >= 0, axis=-1)
        mixed = (cv.max(axis=-1) != cv.min(axis=-1)) | ~known
        # uniform cells: propagate the corner value to the whole block
        # (MISE's "interior of uniform cells needs no evaluation")
        uniform = known & ~mixed
        for cell, val in zip(cells[uniform], cv[uniform][:, 0]):
            block = occ[cell[0]:cell[0] + cur_step + 1,
                        cell[1]:cell[1] + cur_step + 1,
                        cell[2]:cell[2] + cur_step + 1]
            block[block < 0] = val
        active = cells[mixed]
        # evaluate the half-step lattice within active cells
        half = cur_step // 2
        offs = np.array([[i, j, k] for i in range(0, cur_step + 1, half)
                         for j in range(0, cur_step + 1, half)
                         for k in range(0, cur_step + 1, half)])
        new_pts = (active[:, None, :] + offs[None]).reshape(-1, 3)
        new_pts = np.unique(new_pts, axis=0)
        unknown = occ[new_pts[:, 0], new_pts[:, 1], new_pts[:, 2]] < 0
        new_pts = new_pts[unknown]
        if new_pts.shape[0] > 0:
            inside = _eval(f, new_pts, bbox_center, bbox_dim, final_res)
            occ[new_pts[:, 0], new_pts[:, 1], new_pts[:, 2]] = inside.astype(np.int8)
        cur_step = half

    return np.clip(occ, 0, 1)
