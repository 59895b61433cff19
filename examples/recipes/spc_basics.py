"""SPC recipes: octree construction, query, dual octree, trilinear
interpolation, sparse conv — the reference's four spc recipes
(examples/recipes/spc/) in one runnable tour.

Run: PYTHONPATH=. python examples/recipes/spc_basics.py (CPU ok)
"""

import jax
import jax.numpy as jnp
import numpy as np

import kaolin_tpu.ops.spc as spc_ops

# -- build an octree from quantized points (spc_basics.py) --
level = 3
pts = jnp.asarray(np.random.RandomState(0).randint(0, 2 ** level, (40, 3)),
                  dtype=jnp.int16)
octree = spc_ops.unbatched_points_to_octree(pts, level)
lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
max_level, pyramids, exsum = spc_ops.scan_octrees(octree, lengths)
point_hierarchy = spc_ops.generate_points(octree, pyramids, exsum)
print(f"octree: {len(octree)} bytes, levels={max_level}, "
      f"points per level={np.asarray(pyramids)[0][0][:max_level + 1]}")

# -- query cells containing coordinates (spc_basics.py) --
res = 2 ** level
inside = (np.asarray(pts[0]) + 0.5) / res * 2.0 - 1.0   # center of a cell
query = jnp.asarray([inside, [0.999, 0.999, 0.999]], dtype=jnp.float32)
pidx = spc_ops.unbatched_query(octree, exsum, query, level)
print("query results (−1 = empty space):", np.asarray(pidx))

# -- dual octree: corners instead of cells (spc_dual_octree.py) --
dual, pyr_dual = spc_ops.unbatched_make_dual(point_hierarchy,
                                             np.asarray(pyramids)[0])
trinkets, parents = spc_ops.unbatched_make_trinkets(
    point_hierarchy, np.asarray(pyramids)[0], dual, np.asarray(pyr_dual))
print(f"dual octree: {np.asarray(dual).shape[0]} corners, trinkets "
      f"{np.asarray(trinkets).shape}")

# -- trilinear interpolation of corner features (spc_trilinear_interp.py) --
feats = jnp.asarray(np.asarray(dual)[:, :1], dtype=jnp.float32)  # f = x coord
coords = jnp.asarray([[inside]], dtype=jnp.float32)
pidx2 = spc_ops.unbatched_query(octree, exsum, coords[:, 0], level)
interp = spc_ops.unbatched_interpolate_trilinear(
    coords, pidx2, point_hierarchy, trinkets, feats, level)
print("trilinear sample:", np.asarray(interp).ravel())

# -- sparse conv3d over the octree (spc_conv3d_example.py) --
kernel_vectors = np.stack(np.meshgrid(*([[-1, 0, 1]] * 3),
                                      indexing="ij"), -1).reshape(-1, 3)
n_leaf = int(np.asarray(pyramids)[0][0][level])
x = jnp.ones((n_leaf, 2))
conv = spc_ops.Conv3d(2, 4, kernel_vectors, jump=0)
params = conv.init(jax.random.PRNGKey(0))
y, _lvl = conv.apply(params, octree, point_hierarchy, level, pyramids,
                     exsum, x)
print("conv3d:", x.shape, "->", np.asarray(y).shape)
