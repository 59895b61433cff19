"""Material parameter helpers. Ref ``kaolin/physics/materials/material_utils.py``."""

import jax.numpy as jnp

__all__ = ["to_lame", "get_defo_grad"]


def to_lame(yms, prs):
    """Young's modulus + Poisson ratio → Lamé (mu, lambda). Ref :23."""
    mus = yms / (2 * (1 + prs))
    lams = yms * prs / ((1 + prs) * (1 - 2 * prs))
    return mus, lams


def get_defo_grad(z, dFdz):
    """Deformation gradients from reduced DOFs: F = reshape(dFdz @ z) + I.

    Args:
        z: (12H,) flattened handle transforms.
        dFdz: dense (9N, 12H).

    Returns:
        (N, 3, 3) deformation gradients. Ref :44 (Warp BSR mat-vec + identity
        kernel → here one MXU mat-vec).
    """
    Fs = (dFdz @ z).reshape(-1, 3, 3)
    return Fs + jnp.eye(3, dtype=Fs.dtype)
