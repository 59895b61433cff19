"""Stable Neo-Hookean elasticity (Kim's course formulation).

TPU-native analog of reference
``kaolin/physics/materials/neohookean_elastic_material.py`` (energy :25,
gradient :48, 9x9 hessian :93 — Warp per-point kernels there; batched
closed-form jnp here, fused by XLA).

Energy: ``W = mu/2 (I1 − 3) + lam/2 (J − 1)² − mu (J − 1)``, per point scaled
by integration volume.
"""

import jax
import jax.numpy as jnp

from kaolin_tpu.physics.materials.material_utils import det_3x3, inv_3x3

__all__ = [
    "neohookean_energy",
    "neohookean_gradient",
    "neohookean_hessian",
    "NeohookeanElasticMaterial",
]


def neohookean_energy(mu, lam, defo_grad, vol=None):
    """Per-point energy. mu/lam (..., 1), F (..., 3, 3) → (..., 1). Ref :25."""
    C1 = mu / 2.0
    D1 = lam / 2.0
    I1 = jnp.sum(defo_grad * defo_grad, axis=(-2, -1))[..., None]
    J = det_3x3(defo_grad)[..., None]
    W = C1 * (I1 - 3.0) + D1 * (J - 1.0) ** 2 - mu * (J - 1.0)
    if vol is not None:
        W = W * vol
    return W


def neohookean_gradient(mu, lam, defo_grad, vol=None):
    """dW/dF per point → (..., 3, 3). Ref :48."""
    det = det_3x3(defo_grad)
    J = det[..., None, None]
    FinvT = jnp.swapaxes(inv_3x3(defo_grad, det=det), -1, -2)
    mu_ = mu[..., None]
    lam_ = lam[..., None]
    g = mu_ * defo_grad + lam_ * (J - 1.0) * J * FinvT - mu_ * J * FinvT
    if vol is not None:
        g = g * vol[..., None]
    return g


def neohookean_hessian(mu, lam, defo_grad, vol=None):
    """d²W/dF² per point as (..., 9, 9), row-major F flattening. Ref :93.

    H = mu I9 + gamma vec(F^-T)vec(F^-T)ᵀ − dgamma · Π,
    gamma = J(lam(2J−1) − mu), dgamma = gamma − lam J²,
    Π[(i,k),(j,l)] = F^-T[i,l] F^-T[j,k]  (the d(F^-T)/dF transpose-shuffle).
    """
    det = det_3x3(defo_grad)
    J = det[..., None]  # (..., 1)
    Finv = inv_3x3(defo_grad, det=det)
    FinvT = jnp.swapaxes(Finv, -1, -2)
    batch = defo_grad.shape[:-2]
    f = FinvT.reshape(batch + (9,))
    gamma = J * (lam * (2.0 * J - 1.0) - mu)  # (..., 1)
    dgamma = gamma - lam * J * J

    eye9 = jnp.eye(9, dtype=defo_grad.dtype)
    H1 = mu[..., None] * eye9
    H2 = gamma[..., None] * (f[..., :, None] * f[..., None, :])
    # outer[(i*3+l),(j*3+k)] mapped to [(i*3+k),(j*3+l)]
    outer = (f[..., :, None] * f[..., None, :]).reshape(batch + (3, 3, 3, 3))
    # outer[i, l, j, k] -> H3[i, k, j, l]
    H3 = jnp.transpose(outer, tuple(range(len(batch))) + tuple(
        len(batch) + a for a in (0, 3, 2, 1))).reshape(batch + (9, 9))
    H = H1 + H2 - dgamma[..., None] * H3
    if vol is not None:
        # vol is (..., 1) like mu/lam; add one axis → broadcasts over (9, 9)
        H = H * vol[..., None]
    return H


@jax.tree_util.register_pytree_node_class
class NeohookeanElasticMaterial:
    """Defo-grad-wise force object for scene assembly, mirroring the
    reference class (ref :221): bundles per-point Lamé params and volumes.

    With ``reparameterize_lame=True``, uses the Stable-NH reparameterization
    lam' = lam + mu (ref :239) so the linearized energy matches linear
    elasticity.

    Registered as a pytree (mu/lam/vol are children) so it can live in the
    scene-constants pytree of the functional sim step.
    """

    def __init__(self, mu, lam, integration_pt_volume, reparameterize_lame=False):
        if reparameterize_lame:
            lam = lam + mu
        self.mu = mu.reshape(-1, 1)
        self.lam = lam.reshape(-1, 1)
        self.vol = integration_pt_volume.reshape(-1, 1)

    def tree_flatten(self):
        return (self.mu, self.lam, self.vol), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.mu, obj.lam, obj.vol = children
        return obj

    def energy(self, defo_grad, coeff=1.0):
        return coeff * jnp.sum(
            neohookean_energy(self.mu, self.lam, defo_grad, self.vol))

    def gradient(self, defo_grad, coeff=1.0):
        return coeff * neohookean_gradient(self.mu, self.lam, defo_grad, self.vol)

    def hessian(self, defo_grad, coeff=1.0):
        return coeff * neohookean_hessian(self.mu, self.lam, defo_grad, self.vol)
