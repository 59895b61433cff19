"""Angle-axis conversions. Ref ``kaolin/math/quat/angle_axis.py``."""

import jax.numpy as jnp

from kaolin_tpu.math.quat.quaternion import quat_from_rot33, quat_unit_positive

__all__ = ["angle_axis_from_quat", "angle_axis_from_rot33"]


def angle_axis_from_quat(quat):
    """Unit quaternion → (angle (...,1), axis (...,3)). Ref :31."""
    q = quat_unit_positive(quat)
    w = jnp.clip(q[..., 3:], -1.0, 1.0)
    angle = 2.0 * jnp.arccos(w)
    s = jnp.sqrt(jnp.clip(1.0 - w * w, 1e-12, None))
    default_axis = jnp.zeros_like(q[..., :3]).at[..., 0].set(1.0)
    axis = jnp.where(s > 1e-6, q[..., :3] / s, default_axis)
    return angle, axis


def angle_axis_from_rot33(mat):
    """Rotation matrix → (angle, axis). Ref :57."""
    return angle_axis_from_quat(quat_from_rot33(mat))
