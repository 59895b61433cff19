"""Random data generators for tests and sampling.

TPU-native analog of reference ``kaolin/ops/random.py`` (manual_seed :33,
random_shape_per_tensor :90, random_tensor :117, random_spc_octrees :149,
sample_spherical_coords :185). JAX has a functional PRNG, so functions take
explicit keys; ``manual_seed`` is provided for python/numpy side effects.
"""

import random as _py_random

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.spc.uint8 import uint8_to_bits  # noqa: F401

__all__ = [
    "manual_seed",
    "random_shape_per_tensor",
    "random_tensor",
    "random_spc_octrees",
    "sample_spherical_coords",
]


def manual_seed(seed, random_seed=None, numpy_seed=None):
    """Seed python/numpy RNGs and return a jax PRNG key. Ref :33."""
    _py_random.seed(seed if random_seed is None else random_seed)
    np.random.seed((seed if numpy_seed is None else numpy_seed) % (2 ** 32))
    return jax.random.PRNGKey(seed)


def random_shape_per_tensor(batch_size, min_shape=None, max_shape=None):
    """Random shape_per_tensor (numpy host metadata). Ref :90."""
    if max_shape is None:
        raise ValueError("max_shape must be provided")
    if min_shape is None:
        min_shape = [1] * len(max_shape)
    return np.stack([
        np.array([_py_random.randint(lo, hi) for lo, hi in zip(min_shape, max_shape)])
        for _ in range(batch_size)])


def random_tensor(low, high, shape, dtype=jnp.float32, key=None):
    """Uniform random tensor in [low, high]. Ref :117."""
    if key is None:
        key = jax.random.PRNGKey(_py_random.randint(0, 2 ** 31 - 1))
    if jnp.issubdtype(dtype, jnp.integer):
        return jax.random.randint(key, shape, low, high + 1, dtype=dtype)
    return jax.random.uniform(key, shape, minval=low, maxval=high, dtype=dtype)


def random_spc_octrees(batch_size, max_level, key=None):
    """Generate random batched byte octrees → (octrees uint8, lengths).
    Ref :149."""
    from kaolin_tpu.ops.spc.points import points_to_octree, quantize_points
    if key is None:
        key = jax.random.PRNGKey(_py_random.randint(0, 2 ** 31 - 1))
    octrees = []
    lengths = []
    for i in range(batch_size):
        key, sub = jax.random.split(key)
        num_pts = _py_random.randint(8, 64)
        pts = jax.random.uniform(sub, (num_pts, 3), minval=-1.0, maxval=1.0)
        qpts = quantize_points(pts, max_level)
        octree = points_to_octree(qpts, max_level)
        octrees.append(octree)
        lengths.append(octree.shape[0])
    return jnp.concatenate(octrees), jnp.asarray(lengths, dtype=jnp.int32)


def sample_spherical_coords(shape, azimuth_low=0., azimuth_high=2 * np.pi,
                            elevation_low=0., elevation_high=np.pi / 2.,
                            key=None):
    """Sample azimuth uniformly and elevation uniformly *on the sphere*
    (area-preserving via arcsin of uniform sin-range). Ref :185."""
    if key is None:
        key = jax.random.PRNGKey(_py_random.randint(0, 2 ** 31 - 1))
    k1, k2 = jax.random.split(key)
    azimuth = jax.random.uniform(k1, shape, minval=azimuth_low, maxval=azimuth_high)
    sin_lo, sin_hi = np.sin(elevation_low), np.sin(elevation_high)
    elevation = jnp.arcsin(jax.random.uniform(k2, shape, minval=sin_lo, maxval=sin_hi))
    return azimuth, elevation


def get_state():
    """Snapshot host RNG state (numpy + python random). Ref ``random.py``
    (get_state; torch states replaced by host RNGs — JAX keys are explicit)."""
    import random as _random
    return (np.random.get_state(), _random.getstate())


def set_state(state):
    """Restore a state from :func:`get_state`. Ref (set_state)."""
    import random as _random
    np_state, py_state = state
    np.random.set_state(np_state)
    _random.setstate(py_state)
