"""Quaternion math recipe (reference examples/recipes/math/quaternions.py):
construction, rotation, composition, conversions.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/recipes/quaternions.py
"""

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.math.quat import (
    quat_from_angle_axis, quat_from_rot33, quat_identity, quat_inverse,
    quat_mul, quat_rotate, quat_unit, rot33_from_quat,
)

# axis-angle -> quaternion (xyzw)
q = quat_from_angle_axis(jnp.asarray([[np.pi / 2]]),
                         jnp.asarray([[0.0, 0.0, 1.0]]))
print("90deg about z:", np.asarray(q).round(4))

# rotate a point
p = jnp.asarray([[1.0, 0.0, 0.0]])
print("rotated x-axis:", np.asarray(quat_rotate(q, p)).round(4))

# composition and inverse
q2 = quat_mul(q, q)                       # 180 degrees
back = quat_rotate(quat_inverse(q2), quat_rotate(q2, p))
print("rotate+unrotate:", np.asarray(back).round(4))

# matrix round trip
m = rot33_from_quat(quat_unit(q))
q_back = quat_from_rot33(m)
print("rot33 round trip:", np.asarray(quat_rotate(q_back, p)).round(4))

# identity batch
print("identity:", np.asarray(quat_identity((2,))))
