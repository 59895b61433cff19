"""Volumetric interior sampling of 3D gaussian splats ("densifier").

TPU-native analog of reference ``kaolin/ops/gaussians/densifier.py:227``
(``sample_points_in_volume``), algorithm documented at
``ops/gaussian/densifier.py:78-110``:

1. gaussians → shell voxelization (:func:`gs_to_voxelgrid`, opacity-culled);
2. volume filling of the voxelized shell. The reference carves free space by
   raytracing depth maps from icosahedral viewpoints and fusing them with the
   BF 3-state octree (``ops/spc/bf_recon.py``); here the exterior is carved
   with a 6-connected flood fill from the grid boundary — identical results
   for watertight shells (occupied ∪ unseen ≡ boundary-flood complement),
   the common case for this API (3DGS physics densification);
3. jittered voxel-center sampling, optional subsampling and post-scaling.
"""

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions.gaussians import gs_to_voxelgrid

__all__ = ["sample_points_in_volume"]


def sample_points_in_volume(xyz, scale, rotation, opacity, mask=None,
                            num_samples=None, octree_level=8,
                            opacity_threshold=0.35, post_scale_factor=1.0,
                            jitter=True, clip_samples_to_input_bbox=True,
                            viewpoints=None, key=None, **unused):
    """Sample points uniformly inside the solid represented by 3D gaussians.

    Args/semantics follow the reference (:227); coordinates may live in any
    axis-aligned bbox (internally normalized to [-1, 1]). Returns (S, 3)
    sampled points.
    """
    del viewpoints  # carving via flood fill; see module docstring
    if key is None:
        key = jax.random.PRNGKey(0)
    xyz_np = np.asarray(xyz, dtype=np.float64)
    scale_np = np.asarray(scale, dtype=np.float64)
    rot_np = np.asarray(rotation, dtype=np.float64)
    op_np = np.asarray(opacity, dtype=np.float64).reshape(-1)
    if mask is not None:
        m = np.asarray(mask).reshape(-1)
        xyz_np, scale_np, rot_np, op_np = (xyz_np[m], scale_np[m], rot_np[m],
                                           op_np[m])

    # normalize to [-1, 1] cube
    lo = xyz_np.min(axis=0) - 3 * scale_np.max()
    hi = xyz_np.max(axis=0) + 3 * scale_np.max()
    center = (lo + hi) / 2
    half = (hi - lo).max() / 2
    xyz_n = (xyz_np - center) / half
    scale_n = scale_np / half

    res = 2 ** octree_level
    points, opac = gs_to_voxelgrid(xyz_n, scale_n, rot_np, op_np,
                                   octree_level)
    points = np.asarray(points)
    opac = np.asarray(opac)
    shell = points[opac >= opacity_threshold]
    if shell.shape[0] == 0:
        shell = points

    # volume fill: flood exterior from the boundary, keep the complement.
    # The full (pre-threshold) voxelization seals the shell for hole filling;
    # the opacity threshold only selects which shell voxels are kept.
    grid = np.zeros((res, res, res), dtype=bool)
    grid[shell[:, 0], shell[:, 1], shell[:, 2]] = True
    grid_all = np.zeros((res, res, res), dtype=bool)
    grid_all[points[:, 0], points[:, 1], points[:, 2]] = True
    from scipy import ndimage
    # close small shell holes before filling (sparse gaussians leave gaps the
    # reference's multi-view depth fusion also can't see through)
    closed = ndimage.binary_closing(grid_all, structure=np.ones((3, 3, 3)),
                                    iterations=2)
    filled = ndimage.binary_fill_holes(closed)
    # erode away the closing inflation, keep the original shell
    interior = ndimage.binary_erosion(filled, structure=np.ones((3, 3, 3)),
                                      iterations=2)
    occ = np.stack(np.nonzero(interior | grid), axis=-1)

    centers = (occ + 0.5) * (2.0 / res) - 1.0
    pts = jnp.asarray(centers.astype(np.float32))
    if jitter:
        key, sub = jax.random.split(key)
        pts = pts + jax.random.uniform(sub, pts.shape, minval=-0.5, maxval=0.5) \
            * (2.0 / res)
    if num_samples is not None and num_samples < pts.shape[0]:
        key, sub = jax.random.split(key)
        idx = jax.random.choice(sub, pts.shape[0], (num_samples,),
                                replace=False)
        pts = pts[idx]

    # denormalize + optional post scaling about the centroid
    pts = pts * half + center
    if post_scale_factor != 1.0:
        c = jnp.mean(pts, axis=0)
        pts = (pts - c) * post_scale_factor + c
    if clip_samples_to_input_bbox:
        pts = jnp.clip(pts, jnp.asarray(xyz_np.min(0)),
                       jnp.asarray(xyz_np.max(0)))
    return pts
