"""Dataload recipe: pointcloud -> SPC with averaged per-cell features
(reference examples/recipes/dataload/spc_from_pointcloud.py).

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/recipes/spc_from_pointcloud.py
"""

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions import unbatched_pointcloud_to_spc

rng = np.random.RandomState(0)
cloud = jnp.asarray(rng.uniform(-1, 1, (10000, 3)).astype(np.float32))
colors = jnp.asarray(rng.rand(10000, 3).astype(np.float32))

spc = unbatched_pointcloud_to_spc(cloud, level=5, features=colors)
print("octree bytes:", int(spc.octrees.shape[0]),
      "| leaf cells:", int(np.asarray(spc.num_points(5)).reshape(-1)[0]),
      "| features:", None if spc.features is None
      else tuple(spc.features.shape))
