"""Small math utilities. Ref ``kaolin/math/quat/util.py``."""

import jax.numpy as jnp

__all__ = ["vector_normalize", "pad_mat33_to_mat44"]


def vector_normalize(vec, eps=1e-12):
    """L2-normalize along the last axis. Ref :24."""
    return vec / jnp.clip(jnp.linalg.norm(vec, axis=-1, keepdims=True), eps, None)


def pad_mat33_to_mat44(mat33):
    """Embed (..., 3, 3) into homogeneous (..., 4, 4). Ref :39."""
    batch = mat33.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=mat33.dtype)
    out = out.at[..., :3, :3].set(mat33)
    return out.at[..., 3, 3].set(1.0)
