"""Tutorial: understanding Structured Point Clouds (SPCs).

TPU-native port of the reference notebook
``examples/tutorial/understanding_spcs_tutorial.ipynb``: quantize a point
cloud into an octree, scan it into the (pyramid, exsum) acceleration
structure, inspect the level hierarchy, query points against it, convert to a
dense grid, and raytrace a depth image.

SPC bytes are identical to the reference format (one child-mask byte per
node, breadth-first); the acceleration structures are host-scanned once and
every per-point operation is a fixed-shape XLA program.

Run: python examples/tutorial_understanding_spcs.py   (CPU or TPU)
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops.spc import (generate_points, morton_to_points,
                                points_to_morton, quantize_points,
                                scan_octrees, to_dense,
                                unbatched_get_level_points,
                                unbatched_points_to_octree, unbatched_query)
from kaolin_tpu.render.camera import Camera, generate_rays
from kaolin_tpu.render.spc import unbatched_raytrace


def main(smoke=False):
    level = 4 if smoke else 6
    res_img = 32 if smoke else 128
    rng = np.random.RandomState(0)

    # 1. a point cloud on a sphere surface, in the SPC's [-1, 1]^3 domain
    n = 2000 if smoke else 50_000
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    cloud = jnp.asarray(d * 0.7)

    # 2. quantize to integer cells at `level` and build the octree bytes
    q = quantize_points(cloud, level)                      # (N, 3) int16
    octree = unbatched_points_to_octree(q, level)          # (num_bytes,) u8
    print(f"octree: {octree.shape[0]} bytes at level {level}")

    # 3. scan: per-level pyramid + exclusive-sum child offsets
    lengths = np.asarray([octree.shape[0]], np.int32)
    max_level, pyramids, exsum = scan_octrees(octree, lengths)
    pyramid = np.asarray(pyramids)[0]
    for lv in range(max_level + 1):
        print(f"  level {lv}: {pyramid[0, lv]} nodes "
              f"(offset {pyramid[1, lv]})")

    # 4. the point hierarchy: every node's integer coords, all levels
    point_hierarchy = generate_points(octree, pyramids, exsum)
    leaves = unbatched_get_level_points(point_hierarchy, pyramid, level)
    print(f"leaf points: {leaves.shape}")
    assert leaves.shape[0] == pyramid[0, level]

    # morton codes round-trip (the SPC ordering invariant)
    mort = points_to_morton(leaves)
    assert bool(jnp.all(morton_to_points(mort) == leaves))
    assert bool(jnp.all(jnp.diff(mort) > 0)), "SPC points are morton-sorted"

    # 5. query: where does an arbitrary coordinate land in the octree?
    probe_pts = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    pidx = unbatched_query(octree, exsum, probe_pts, level)
    inside = int(jnp.sum(pidx >= 0))
    print(f"query: {inside}/64 random points landed in occupied leaves")

    # surface points must query back to themselves
    self_idx = unbatched_query(octree, exsum,
                               (leaves.astype(jnp.float32) + 0.5)
                               * (2.0 / 2 ** level) - 1.0, level)
    assert bool(jnp.all(self_idx >= 0))

    # 6. dense conversion: one-hot occupancy grid from leaf features
    feats = jnp.ones((pyramid[0, level], 1), jnp.float32)
    dense = to_dense(point_hierarchy, pyramids, feats, level)
    print(f"dense grid: {dense.shape}, occupied {int(dense.sum())}")
    assert int(dense.sum()) == int(pyramid[0, level])

    # 7. raytrace a depth image (nuggets = depth-sorted ray/leaf hits)
    camera = Camera.from_args(eye=jnp.asarray([1.8, 1.2, 1.8]),
                              at=jnp.zeros(3),
                              up=jnp.asarray([0.0, 1.0, 0.0]),
                              fov=0.9, width=res_img, height=res_img)
    origins, dirs = generate_rays(camera)
    ridx, pidx, depth = unbatched_raytrace(
        octree, point_hierarchy, pyramid, exsum,
        jnp.asarray(origins, jnp.float32), jnp.asarray(dirs, jnp.float32),
        level)
    img = np.full(res_img * res_img, np.inf, np.float32)
    np.minimum.at(img, np.asarray(ridx), np.asarray(depth[:, 0]))
    hit_px = int(np.isfinite(img).sum())
    print(f"raytrace: {ridx.shape[0]} nuggets, {hit_px} hit pixels")
    assert hit_px > res_img * res_img * 0.05
    print("done")


if __name__ == "__main__":
    main()
