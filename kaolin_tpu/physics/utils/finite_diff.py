"""Central finite-difference Jacobian. Ref ``kaolin/physics/utils/finite_diff.py:23``.

Kept (rather than jacfwd) so training losses and dFdz match the reference's
numerics bit-for-bit in trajectory-parity tests; exact AD variants exist in
``SkinningFn.compute_dwdx``.
"""

import math

import jax.numpy as jnp

__all__ = ["finite_diff_jac"]


def finite_diff_jac(fcn, x, eps=1e-7):
    """Jacobian of fcn w.r.t. 3D input positions by central differences.

    fcn maps (6N, dim) stacked probe points → (6N, ...); returns
    (N, ..., dim, dim is the probe axis last). Ref :23.
    """
    delta = math.sqrt(eps)
    h = delta * jnp.eye(x.shape[1], dtype=x.dtype)
    bounds = jnp.concatenate([
        x + h[0], x + h[1], x + h[2],
        x - h[0], x - h[1], x - h[2],
    ], axis=0)
    jac = fcn(bounds)
    jac = jac.reshape((2, 3, -1) + jac.shape[1:])
    jac = (jac[0] - jac[1]) / (2 * delta)
    return jnp.moveaxis(jac, 0, -1)
