"""Dual (quaternion, translation) rigid transforms (..., 7) laid out
``(x, y, z, w, tx, ty, tz)``. Ref ``kaolin/math/quat/transform.py``."""

import jax.numpy as jnp

from kaolin_tpu.math.quat.euclidean import (
    euclidean_rotation_matrix,
    euclidean_translation_vector,
)
from kaolin_tpu.math.quat.quaternion import (
    quat_from_rot33,
    quat_identity,
    quat_inverse,
    quat_mul,
    quat_rotate,
    quat_unit_positive,
)

__all__ = [
    "transform_from_rotation_translation",
    "transform_from_euclidean",
    "transform_identity",
    "transform_rotation",
    "transform_translation",
    "transform_inverse",
    "transform_mul",
    "transform_apply",
]


def transform_from_rotation_translation(rotation=None, translation=None):
    """Quaternion (...,4) + translation (...,3) → transform (...,7). Ref :46."""
    if rotation is None and translation is None:
        raise ValueError("need rotation or translation")
    if rotation is None:
        rotation = quat_identity(translation.shape[:-1], dtype=translation.dtype)
    if translation is None:
        translation = jnp.zeros(rotation.shape[:-1] + (3,), dtype=rotation.dtype)
    return jnp.concatenate([rotation, translation], axis=-1)


def transform_from_euclidean(euclidean):
    """SE(3) 4x4 → transform (...,7). Ref :70."""
    return transform_from_rotation_translation(
        quat_from_rot33(euclidean_rotation_matrix(euclidean)),
        euclidean_translation_vector(euclidean))


def transform_identity(shape, dtype=jnp.float32):
    """Identity transforms (*shape, 7). Ref :89."""
    if isinstance(shape, int):
        shape = (shape,)
    return jnp.concatenate(
        [quat_identity(shape, dtype=dtype), jnp.zeros(tuple(shape) + (3,), dtype=dtype)],
        axis=-1)


def transform_rotation(x):
    """Quaternion part. Ref :105."""
    return x[..., :4]


def transform_translation(x):
    """Translation part. Ref :118."""
    return x[..., 4:]


def transform_inverse(x):
    """Inverse rigid transform. Ref :131."""
    qinv = quat_unit_positive(quat_inverse(transform_rotation(x)))
    t = -quat_rotate(qinv, transform_translation(x))
    return jnp.concatenate([qinv, t], axis=-1)


def transform_mul(x, y):
    """Compose: apply y then x. Ref :147."""
    qx, tx = transform_rotation(x), transform_translation(x)
    qy, ty = transform_rotation(y), transform_translation(y)
    q = quat_unit_positive(quat_mul(qx, qy))
    t = quat_rotate(qx, ty) + tx
    return jnp.concatenate([q, t], axis=-1)


def transform_apply(transform, point):
    """Apply to 3D point(s). Ref :166."""
    return quat_rotate(transform_rotation(transform), point) + transform_translation(transform)
