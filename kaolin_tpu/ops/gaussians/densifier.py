"""Volumetric interior sampling of 3D gaussian splats ("densifier").

TPU-native analog of reference ``kaolin/ops/gaussians/densifier.py:227``
(``sample_points_in_volume``), algorithm documented at
``ops/gaussian/densifier.py:78-110``:

1. gaussians → shell voxelization (:func:`gs_to_voxelgrid`, opacity-culled)
   → octree (ref _solidify :133-190);
2. carve seen-empty space by raytracing depth maps from icosahedral
   viewpoints and fusing them into a 3-state octree
   (:func:`kaolin_tpu.ops.spc.bf_recon.bf_recon`); interior = occupied ∪
   unseen voxels (``method="carve"``, the reference pipeline). A cheaper
   ``method="floodfill"`` carves the exterior with a 6-connected flood fill
   from the grid boundary instead — equivalent for watertight shells;
3. jittered voxel-center sampling, optional subsampling and post-scaling.
"""

import logging
import math

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions.gaussians import gs_to_voxelgrid

logger = logging.getLogger(__name__)

__all__ = ["sample_points_in_volume"]


def _generate_default_viewpoints():
    """Empirical carving anchors + 5 rotated/scaled icosahedra. Ref :36."""
    anchors = np.array([
        [4.0, 0.0, 0.0], [0.0, 4.0, 0.0], [0.0, 0.0, 4.0],
        [-4.0, 0.0, 0.0], [0.0, -4.0, 0.0], [0.0, 0.0, -4.0],
        [2.3, 2.3, 2.3], [-2.3, 2.3, 2.3], [2.3, -2.3, 2.3],
        [2.3, 2.3, -2.3], [-2.3, -2.3, 2.3], [-2.3, 2.3, -2.3],
        [2.3, -2.3, -2.3], [-2.3, -2.3, -2.3]], dtype=np.float64)
    phi = (1 + math.sqrt(5.0)) / 2
    ico = np.array([
        [+phi, +1.0, 0.0], [+phi, -1.0, 0.0], [-phi, -1.0, 0.0],
        [-phi, +1.0, 0.0], [+1.0, 0.0, +phi], [-1.0, 0.0, +phi],
        [-1.0, 0.0, -phi], [+1.0, 0.0, -phi], [0.0, +phi, +1.0],
        [0.0, +phi, -1.0], [0.0, -phi, -1.0], [0.0, -phi, +1.0]],
        dtype=np.float64)

    tx, ty, tz = np.deg2rad([15.0, 27.0, 49.0])
    rx = np.array([[1, 0, 0], [0, np.cos(tx), -np.sin(tx)],
                   [0, np.sin(tx), np.cos(tx)]])
    ry = np.array([[np.cos(ty), 0, np.sin(ty)], [0, 1, 0],
                   [-np.sin(ty), 0, np.cos(ty)]])
    rz = np.array([[np.cos(tz), -np.sin(tz), 0],
                   [np.sin(tz), np.cos(tz), 0], [0, 0, 1]])
    r = rz @ ry @ rx
    rings = [anchors, ico]
    rk = r
    for k in range(2, 7):
        rings.append((k * ico) @ rk.T)
        rk = r @ rk
    views = np.concatenate(rings, axis=0)
    rng = np.random.RandomState(0)
    return (views + 0.001 * (0.5 - rng.rand(*views.shape))) \
        .astype(np.float32)


def _carve_interior(shell_voxels, level, viewpoints=None):
    """Reference carving (ref _solidify :190-218): raytrace the shell octree
    from the default viewpoints, fuse with Bayesian fusion, keep voxels not
    observed empty. Returns (K, 3) int voxel coords or None on failure."""
    from kaolin_tpu.ops.spc import (RayTracedSPCDataset, bf_recon,
                                    scan_octrees, unbatched_points_to_octree)
    from kaolin_tpu.ops.spc.bf_recon import unbatched_query
    from kaolin_tpu.ops.spc.points import morton_to_points

    if viewpoints is None:
        viewpoints = _generate_default_viewpoints()
    gs_octree = unbatched_points_to_octree(
        jnp.asarray(shell_voxels.astype(np.int16)), level)
    dataset = RayTracedSPCDataset(np.asarray(viewpoints, dtype=np.float32),
                                  gs_octree)
    bf_octree, bf_empty, _, _ = bf_recon(dataset, final_level=level,
                                         sigma=0.0005)
    if bf_octree is None or len(bf_octree) == 0:
        return None
    _, pyramid, exsum = scan_octrees(
        jnp.asarray(bf_octree), np.array([len(bf_octree)], dtype=np.int32))
    query_points = morton_to_points(jnp.arange(8 ** level))
    result = np.asarray(unbatched_query(
        jnp.asarray(bf_octree), jnp.asarray(bf_empty), jnp.asarray(exsum),
        query_points, level))
    keep = result != -1  # occupied + unseen(interior)
    return np.asarray(query_points)[keep]


def _floodfill_interior(shell, all_points, res):
    """Boundary flood-fill carving (cheap alternative): close small shell
    holes, fill, erode away the closing inflation."""
    from scipy import ndimage
    grid = np.zeros((res, res, res), dtype=bool)
    grid[shell[:, 0], shell[:, 1], shell[:, 2]] = True
    grid_all = np.zeros((res, res, res), dtype=bool)
    grid_all[all_points[:, 0], all_points[:, 1], all_points[:, 2]] = True
    closed = ndimage.binary_closing(grid_all, structure=np.ones((3, 3, 3)),
                                    iterations=2)
    filled = ndimage.binary_fill_holes(closed)
    interior = ndimage.binary_erosion(filled, structure=np.ones((3, 3, 3)),
                                      iterations=2)
    return np.stack(np.nonzero(interior | grid), axis=-1)


def sample_points_in_volume(xyz, scale, rotation, opacity, mask=None,
                            num_samples=None, octree_level=8,
                            opacity_threshold=0.35, post_scale_factor=1.0,
                            jitter=True, clip_samples_to_input_bbox=True,
                            viewpoints=None, method="carve", key=None,
                            **unused):
    """Sample points uniformly inside the solid represented by 3D gaussians.

    Args/semantics follow the reference (:227); ``method`` selects the
    volume-filling backend: "carve" (multi-view Bayesian-fusion carving, the
    reference pipeline) or "floodfill" (boundary flood fill — faster,
    equivalent for watertight shells). Returns (S, 3) sampled points.
    """
    assert 6 <= octree_level <= 10, "octree_level range supported is [6, 10]"
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

    # normalize to [-1, 1] cube (ref :159-175: dmax = half max-extent + 0.05)
    lo = xyz_np.min(axis=0)
    hi = xyz_np.max(axis=0)
    center = 0.5 * (lo + hi)
    dmax = 0.5 * (hi - lo).max() + 0.05
    xyz_n = (xyz_np - center) / dmax
    scale_n = scale_np / dmax

    res = 2 ** octree_level
    points, opac = gs_to_voxelgrid(xyz_n, scale_n, rot_np, op_np,
                                   octree_level)
    points = np.asarray(points)
    opac = np.asarray(opac)
    shell = points[opac >= opacity_threshold]
    if shell.shape[0] == 0:
        shell = points

    occ = None
    if method == "carve":
        occ = _carve_interior(shell, octree_level, viewpoints)
        if occ is None:
            logger.warning(
                "3D Gaussian densifier failed to produce a voxelized volume;"
                " the shell may have holes. Try reducing opacity_threshold"
                " or octree_level. Falling back to flood-fill carving.")
    if occ is None:
        occ = _floodfill_interior(shell, points, res)

    centers = (occ + 0.5) * (2.0 / res) - 1.0
    pts = jnp.asarray(centers.astype(np.float32))
    if jitter:
        # spherical jitter bounded by the cell radius (ref _jitter :111)
        key, k1, k2, k3 = jax.random.split(key, 4)
        n = pts.shape[0]
        cell_radius = 2.0 / res
        radius = cell_radius * jnp.sqrt(jax.random.uniform(k1, (n,)))
        azimuth = jax.random.uniform(k2, (n,), maxval=2 * jnp.pi)
        elevation = jax.random.uniform(k3, (n,), minval=-jnp.pi / 2,
                                       maxval=jnp.pi / 2)
        delta = jnp.stack([
            radius * jnp.sin(elevation) * jnp.cos(azimuth),
            radius * jnp.sin(elevation) * jnp.sin(azimuth),
            radius * jnp.cos(elevation)], axis=1)
        pts = pts + delta

    # denormalize + optional post scaling about the centroid (ref :404-410)
    pts = pts * dmax + center
    if post_scale_factor < 1.0:
        c = jnp.mean(pts, axis=0)
        pts = (pts - c) * post_scale_factor + c
    if clip_samples_to_input_bbox:
        # failsafe: drop (not clamp) samples outside the input bbox (:412)
        bbox_min = jnp.asarray(xyz_np.min(0))
        bbox_max = jnp.asarray(xyz_np.max(0))
        inside = jnp.all((pts > bbox_min) & (pts < bbox_max), axis=1)
        pts = pts[np.asarray(inside)]
    if num_samples is not None and num_samples < pts.shape[0]:
        key, sub = jax.random.split(key)
        idx = jax.random.choice(sub, pts.shape[0], (num_samples,),
                                replace=False)
        pts = pts[idx]
    return pts
