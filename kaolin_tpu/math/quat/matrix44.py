"""4x4 homogeneous matrices. Ref ``kaolin/math/quat/matrix44.py``."""

import jax.numpy as jnp

from kaolin_tpu.math.quat.rotation33 import rot33_from_quat

__all__ = ["rot44_from_quat", "translation_to_mat44", "scale_to_mat44"]


def rot44_from_quat(quat):
    """Quaternion → homogeneous 4x4 rotation. Ref :31."""
    r = rot33_from_quat(quat)
    batch = r.shape[:-2]
    out = jnp.zeros(batch + (4, 4), dtype=r.dtype)
    out = out.at[..., :3, :3].set(r)
    return out.at[..., 3, 3].set(1.0)


def translation_to_mat44(vec):
    """Translation (..., 3) → homogeneous 4x4. Ref :45."""
    batch = vec.shape[:-1]
    out = jnp.broadcast_to(jnp.eye(4, dtype=vec.dtype), batch + (4, 4))
    return out.at[..., :3, 3].set(vec)


def scale_to_mat44(scale):
    """Per-axis scale (..., 3) → homogeneous 4x4. Ref :63."""
    batch = scale.shape[:-1]
    out = jnp.zeros(batch + (4, 4), dtype=scale.dtype)
    out = out.at[..., 0, 0].set(scale[..., 0])
    out = out.at[..., 1, 1].set(scale[..., 1])
    out = out.at[..., 2, 2].set(scale[..., 2])
    return out.at[..., 3, 3].set(1.0)
