"""Calibrated RGBD views rendered by raytracing an SPC.

TPU-native analog of reference ``kaolin/ops/spc/raytraced_spc_dataset.py:25``
(RayTracedSPCDataset): for each viewpoint, trace the octree, keep first hits,
and emit the (image, depth, camera, intrinsics, ...) frame tuple consumed by
:func:`kaolin_tpu.ops.spc.bf_recon.bf_recon`.
"""

import numpy as np

import jax.numpy as jnp

__all__ = ["RayTracedSPCDataset"]


class RayTracedSPCDataset:
    """Ray intersections of predefined viewpoints with an SPC octree.

    __getitem__ returns (image (H, W, 3) f32, depthmap (H, W) f32,
    Cam (4, 4) world→pixel row-vector matrix, In (4, 4) intrinsic matrix,
    max_depth, mip_levels, true_depth, start_level, points, is_any_ray_hit).
    Ref :25-133.
    """

    def __init__(self, viewpoints, gs_octree, res=8):
        from kaolin_tpu.ops.spc import generate_points, scan_octrees

        self.viewpoints = np.asarray(viewpoints, dtype=np.float32)
        self.gs_octree = jnp.asarray(gs_octree)
        lengths = np.array([len(gs_octree)], dtype=np.int32)
        self.level, pyramids, self.exsum = scan_octrees(
            self.gs_octree, lengths)
        self.pyramid = np.asarray(pyramids)[0]
        self.point_hierarchy = generate_points(
            self.gs_octree, pyramids, self.exsum)

        self.carve_camera_fov = 0.644  # radians
        self.max_depth = float(np.finfo(np.float32).max)
        self.mip_levels = 6
        self.start_level = 4
        self.res = res

    def __len__(self):
        return len(self.viewpoints)

    def __getitem__(self, index):
        from kaolin_tpu.ops.spc.points import morton_to_points
        from kaolin_tpu.render.camera import Camera, generate_rays
        from kaolin_tpu.render.spc import (mark_pack_boundaries,
                                           unbatched_raytrace)

        res = 2 ** self.res
        eye = jnp.asarray(self.viewpoints[index])
        up = jnp.asarray([0.0, 0.0, 1.0], dtype=jnp.float32)
        at = jnp.zeros((3,), dtype=jnp.float32)
        if bool(jnp.allclose(jnp.cross(up, at - eye), 0.0)):
            up = jnp.asarray([0.0, 1.0, 0.0], dtype=jnp.float32)

        camera = Camera.from_args(eye=eye, at=at, up=up,
                                  fov=self.carve_camera_fov,
                                  width=res, height=res)

        origins, dirs = generate_rays(camera)
        ridx, pidx, depths = unbatched_raytrace(
            self.gs_octree, self.point_hierarchy, self.pyramid, self.exsum,
            origins, dirs, self.level, return_depth=True, with_exit=False)

        is_any_ray_hit = ridx.shape[0] > 0
        if not is_any_ray_hit:
            return (None,) * 9 + (False,)

        first = np.asarray(mark_pack_boundaries(ridx))
        first_rays = np.asarray(ridx)[first].astype(np.int64)
        first_depths = np.asarray(depths)[first, 0]

        image = np.zeros((res * res, 3), dtype=np.float32)
        image[first_rays] = 1.0
        image = image.reshape(res, res, 3)

        depthmap = np.full((res * res,), self.max_depth, dtype=np.float32)
        depthmap[first_rays] = first_depths
        depthmap = depthmap.reshape(res, res)

        cx = float(np.asarray(camera.intrinsics.cx)[0])
        cy = float(np.asarray(camera.intrinsics.cy)[0])
        fx = float(np.asarray(camera.intrinsics.focal_x)[0])
        fy = float(np.asarray(camera.intrinsics.focal_y)[0])

        # computer-vision convention: perspective division by z (ref :113-129)
        intr = np.array([[fx, 0, 0, 0],
                         [0, fy, 0, 0],
                         [cx, cy, 1, 0],
                         [0, 0, 0, 1]], dtype=np.float32)
        ex = np.asarray(camera.extrinsics.view_matrix())[0].T
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        ex = ex @ flip
        cam_mat = ex @ intr

        points = np.asarray(morton_to_points(
            jnp.arange(8 ** self.start_level)), dtype=np.int32)
        return (image, depthmap, cam_mat, intr, self.max_depth,
                self.mip_levels, True, self.start_level, points,
                is_any_ray_hit)
