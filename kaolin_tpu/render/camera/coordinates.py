"""World coordinate-system bases. Ref ``kaolin/render/camera/coordinates.py``.
Default kaolin system: right-handed cartesian, Y up, Z out of screen."""

import jax.numpy as jnp

__all__ = ["blender_coords", "opengl_coords"]


def blender_coords():
    """Right-handed, Z up. Ref :32."""
    return jnp.asarray([[1, 0, 0], [0, 0, 1], [0, -1, 0]], dtype=jnp.float32)


def opengl_coords():
    """Right-handed, Y up (identity wrt the default). Ref :48."""
    return jnp.eye(3, dtype=jnp.float32)
