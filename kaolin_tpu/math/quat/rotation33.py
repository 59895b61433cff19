"""3x3 rotation matrices. Ref ``kaolin/math/quat/rotation33.py``."""

import jax.numpy as jnp

__all__ = [
    "is_rot33_valid",
    "rot33_identity",
    "translation_identity",
    "rot33_inverse",
    "rot33_rotate",
    "rot33_from_quat",
    "rot33_from_angle_axis",
]


def is_rot33_valid(rot33, atol=1e-6):
    """Orthonormal with det +1. Ref :34."""
    eye = jnp.eye(3, dtype=rot33.dtype)
    ortho = jnp.allclose(rot33 @ jnp.swapaxes(rot33, -1, -2), eye, atol=atol)
    det = jnp.allclose(jnp.linalg.det(rot33), 1.0, atol=atol)
    return bool(ortho) and bool(det)


def rot33_identity(batch_size=1, dtype=jnp.float32):
    """Identity rotations (b, 3, 3). Ref :66."""
    return jnp.broadcast_to(jnp.eye(3, dtype=dtype), (batch_size, 3, 3))


def translation_identity(batch_size=1, dtype=jnp.float32):
    """Zero translations (b, 3). Ref :80."""
    return jnp.zeros((batch_size, 3), dtype=dtype)


def rot33_inverse(mat):
    """Transpose. Ref :94."""
    return jnp.swapaxes(mat, -1, -2)


def rot33_rotate(point, mat):
    """Rotate point(s) (..., 3) by matrix (..., 3, 3). Ref :107."""
    return jnp.einsum("...ij,...j->...i", mat, point)


def rot33_from_quat(quat):
    """Unit quaternion (x,y,z,w) → rotation matrix. Ref :124."""
    x, y, z, w = jnp.moveaxis(quat, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], -1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], -1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rot33_from_angle_axis(angle, axis):
    """Rodrigues' formula: (angle (...,1), axis (...,3)) → (..., 3, 3). Ref :160."""
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12, None)
    x, y, z = jnp.moveaxis(axis, -1, 0)
    c = jnp.cos(angle[..., 0])
    s = jnp.sin(angle[..., 0])
    t = 1.0 - c
    row0 = jnp.stack([t * x * x + c, t * x * y - s * z, t * x * z + s * y], -1)
    row1 = jnp.stack([t * x * y + s * z, t * y * y + c, t * y * z - s * x], -1)
    row2 = jnp.stack([t * x * z - s * y, t * y * z + s * x, t * z * z + c], -1)
    return jnp.stack([row0, row1, row2], axis=-2)
