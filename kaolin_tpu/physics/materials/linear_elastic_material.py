"""Linear (corotated-free) elasticity. Ref
``kaolin/physics/materials/linear_elastic_material.py`` (_linear_elastic_energy
:20, gradient :95). Batched over leading dims, vectorized on the VPU.
"""

import jax.numpy as jnp

__all__ = [
    "cauchy_strain",
    "linear_elastic_energy",
    "linear_elastic_gradient",
]


def cauchy_strain(defo_grad):
    """eps = (F + Fᵀ)/2 − I over (..., 3, 3). Ref :55."""
    eye = jnp.eye(3, dtype=defo_grad.dtype)
    return 0.5 * (jnp.swapaxes(defo_grad, -1, -2) + defo_grad) - eye


def linear_elastic_energy(mu, lam, defo_grad):
    """W = mu tr(epsᵀeps) + lam/2 tr(eps)², shapes mu/lam (..., 1),
    F (..., 3, 3) → (..., 1). Ref :69."""
    eps = cauchy_strain(defo_grad)
    tr_eps = jnp.trace(eps, axis1=-2, axis2=-1)[..., None]
    tr_outer = jnp.sum(eps * eps, axis=(-2, -1))[..., None]
    return mu * tr_outer + (lam / 2.0) * tr_eps * tr_eps


def linear_elastic_gradient(mu, lam, defo_grad):
    """dW/dF = 2 mu eps + lam tr(eps) I → (..., 3, 3). Ref :95."""
    eps = cauchy_strain(defo_grad)
    tr_eps = jnp.trace(eps, axis1=-2, axis2=-1)[..., None, None]
    eye = jnp.eye(3, dtype=defo_grad.dtype)
    return 2.0 * mu[..., None] * eps + lam[..., None] * tr_eps * eye
