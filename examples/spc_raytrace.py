"""SPC pipeline: mesh → octree → raytrace (BASELINE config 3, nglod-style).

Voxelize a mesh into a Structured Point Cloud and render a depth map by
raytracing the octree with capacity-bounded BFS.

Run: python examples/spc_raytrace.py
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops.conversions import unbatched_mesh_to_spc
from kaolin_tpu.ops.spc import generate_points, scan_octrees
from kaolin_tpu.render.camera import Camera, generate_rays
from kaolin_tpu.render.spc import mark_pack_boundaries, unbatched_raytrace

LEVEL = 6
RES = 64


def icosphere():
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]],
                 np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
                 np.int32)
    return v * 0.6, f


def main():
    v, f = icosphere()
    face_vertices = jnp.asarray(v)[jnp.asarray(f)]   # (F, 3, 3)
    octree, _ = unbatched_mesh_to_spc(face_vertices, LEVEL)
    lengths = np.array([len(octree)], dtype=np.int32)
    level, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    print(f"octree: {len(octree)} bytes, "
          f"{int(np.asarray(pyramids)[0, 0, LEVEL])} leaf voxels")

    camera = Camera.from_args(eye=jnp.asarray([1.8, 1.2, 1.8]),
                              at=jnp.zeros(3), up=jnp.asarray([0., 1., 0.]),
                              fov=0.7, width=RES, height=RES)
    origins, dirs = generate_rays(camera)
    ridx, pidx, depth = unbatched_raytrace(
        octree, ph, np.asarray(pyramids)[0], exsum, origins, dirs, LEVEL)
    first = np.asarray(mark_pack_boundaries(ridx))
    rays = np.asarray(ridx)[first]
    depth_map = np.full((RES * RES,), np.inf, np.float32)
    depth_map[rays] = np.asarray(depth)[first, 0]
    hit_frac = np.isfinite(depth_map).mean()
    print(f"hit fraction {hit_frac:.2f}, "
          f"depth range [{np.nanmin(depth_map[np.isfinite(depth_map)]):.2f},"
          f" {np.nanmax(depth_map[np.isfinite(depth_map)]):.2f}]")
    # ASCII depth visualization
    img = depth_map.reshape(RES, RES)[::4, ::2]
    lo, hi = np.nanmin(img[np.isfinite(img)]), np.nanmax(img[np.isfinite(img)])
    chars = " .:-=+*#%@"
    for row in img:
        print("".join(
            chars[int((1 - (d - lo) / (hi - lo + 1e-9)) * 9)]
            if np.isfinite(d) else " " for d in row))


if __name__ == "__main__":
    main()
