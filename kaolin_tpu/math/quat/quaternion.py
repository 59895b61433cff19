"""Quaternion math in JAX. Convention: ``(x, y, z, w)`` with the real part
last, matching reference ``kaolin/math/quat/quaternion.py:40-297``.

All functions broadcast over leading batch dims and are jit/vmap/grad safe.
"""

import jax.numpy as jnp

__all__ = [
    "quat_real",
    "quat_imaginary",
    "quat_positive",
    "quat_abs",
    "quat_unit",
    "quat_unit_positive",
    "quat_identity",
    "quat_conjugate",
    "quat_inverse",
    "quat_mul",
    "quat_rotate",
    "quat_from_angle_axis",
    "quat_from_rot33",
]

_EPS = 1e-12


def quat_real(quat):
    """Real (w) component, shape (..., 1). Ref :40."""
    return quat[..., 3:]


def quat_imaginary(quat):
    """Imaginary (xyz) components, shape (..., 3). Ref :53."""
    return quat[..., :3]


def quat_positive(quat):
    """Flip sign so the real component is non-negative. Ref :66."""
    return jnp.where(quat[..., 3:] < 0, -quat, quat)


def quat_abs(quat):
    """Quaternion norm, shape (..., 1). Ref :82."""
    return jnp.linalg.norm(quat, axis=-1, keepdims=True)


def quat_unit(quat):
    """Normalize to unit norm. Ref :95."""
    return quat / jnp.clip(quat_abs(quat), _EPS, None)


def quat_unit_positive(quat):
    """Normalized with positive real part (unique rotation rep). Ref :108."""
    return quat_unit(quat_positive(quat))


def _doctest_anchor_identity():
    """
    Example:
        >>> import jax.numpy as jnp
        >>> print(quat_identity((2,)))
        [[0. 0. 0. 1.]
         [0. 0. 0. 1.]]
        >>> q = jnp.asarray([[0.0, 0.0, 0.0, 1.0]])
        >>> print(quat_mul(q, q))
        [[0. 0. 0. 1.]]
        >>> print(quat_conjugate(jnp.asarray([[1.0, 2.0, 3.0, 4.0]])))
        [[-1. -2. -3.  4.]]
    """


def quat_identity(shape, dtype=jnp.float32):
    """Identity quaternion(s) of shape (*shape, 4). Ref :123."""
    if isinstance(shape, int):
        shape = (shape,)
    q = jnp.zeros(tuple(shape) + (4,), dtype=dtype)
    return q.at[..., 3].set(1.0)


def quat_conjugate(quat):
    """(-x, -y, -z, w). Ref :140."""
    return jnp.concatenate([-quat[..., :3], quat[..., 3:]], axis=-1)


def quat_inverse(quat):
    """Inverse: conjugate / |q|^2. Ref :153."""
    return quat_conjugate(quat) / jnp.clip(
        jnp.sum(quat * quat, axis=-1, keepdims=True), _EPS, None)


def quat_mul(a, b):
    """Hamilton product a*b, (x,y,z,w) layout. Ref :168."""
    x1, y1, z1, w1 = jnp.moveaxis(a, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(b, -1, 0)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2
    z = w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2
    return jnp.stack([x, y, z, w], axis=-1)


def quat_rotate(rotation, point):
    """Rotate 3D point(s) by unit quaternion(s): q p q*. Ref :190."""
    pq = jnp.concatenate([point, jnp.zeros_like(point[..., :1])], axis=-1)
    return quat_imaginary(quat_mul(quat_mul(rotation, pq), quat_conjugate(rotation)))


def quat_from_angle_axis(angle, axis, is_degree=False):
    """(angle(...,1), axis(...,3)) → quaternion. Ref :208."""
    radians = jnp.deg2rad(angle) if is_degree else angle
    half = 0.5 * radians
    axis_n = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), _EPS, None)
    return jnp.concatenate([jnp.sin(half) * axis_n, jnp.cos(half)], axis=-1)


def quat_from_rot33(mat):
    """Rotation matrix (..., 3, 3) → unit quaternion (..., 4).

    Branchless Shepperd's method (the reference's four-case dispatch,
    ref :227-331, expressed as a ``where`` select — jit friendly).
    """
    m00 = mat[..., 0, 0]
    m01 = mat[..., 0, 1]
    m02 = mat[..., 0, 2]
    m10 = mat[..., 1, 0]
    m11 = mat[..., 1, 1]
    m12 = mat[..., 1, 2]
    m20 = mat[..., 2, 0]
    m21 = mat[..., 2, 1]
    m22 = mat[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.clip(x, _EPS, None))

    # candidate 0: trace positive
    s0 = safe_sqrt(tr + 1.0) * 2.0
    q0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, 0.25 * s0], -1)
    # candidate 1: m00 dominant
    s1 = safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    q1 = jnp.stack([0.25 * s1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    # candidate 2: m11 dominant
    s2 = safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    q2 = jnp.stack([(m01 + m10) / s2, 0.25 * s2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    # candidate 3: m22 dominant
    s3 = safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    q3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, 0.25 * s3, (m10 - m01) / s3], -1)

    cond0 = (tr > 0.0)[..., None]
    cond1 = ((m00 >= m11) & (m00 >= m22))[..., None]
    cond2 = (m11 >= m22)[..., None]
    q = jnp.where(cond0, q0, jnp.where(cond1, q1, jnp.where(cond2, q2, q3)))
    return quat_unit_positive(q)
