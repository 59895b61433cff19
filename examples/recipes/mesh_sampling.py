"""Preprocess recipes: fast area-weighted surface sampling + occupancy
(inside/outside) sampling (reference examples/recipes/preprocess/).

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/recipes/mesh_sampling.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.mesh import check_sign, sample_points

# a unit cube mesh
v = jnp.asarray([[x, y, z] for x in (0.0, 1.0) for y in (0.0, 1.0)
                 for z in (0.0, 1.0)], jnp.float32)
f = jnp.asarray([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                 [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                 [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])

# -- fast_mesh_sampling.py: area-weighted surface samples under jit --
@jax.jit
def sample(key):
    pts, face_choices = sample_points(v[None], f, 2048, key=key)
    return pts, face_choices

pts, choices = sample(jax.random.PRNGKey(0))
print("surface samples:", pts.shape, "| per-face histogram head:",
      np.bincount(np.asarray(choices).ravel(), minlength=12)[:6])

# -- occupancy_sampling.py: inside/outside test for volume points --
query = jnp.asarray(np.random.RandomState(0).uniform(-0.2, 1.2,
                                                     (1, 4096, 3)),
                    jnp.float32)
inside = check_sign(v[None], f, query)
frac = float(jnp.mean(inside.astype(jnp.float32)))
print(f"occupancy fraction: {frac:.3f} (expected ~ {1.0 / (1.4 ** 3):.3f})")
