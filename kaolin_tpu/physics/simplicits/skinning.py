"""Linear blend skinning. Ref ``kaolin/physics/simplicits/skinning.py``
(weight_function_lbs :24, standard_lbs :39)."""

import jax.numpy as jnp

__all__ = ["weight_function_lbs", "standard_lbs"]


def standard_lbs(x0, tfms, w_x0):
    """x_i = Σ_j w_j(x0_i) T_j [x0_i; 1] + x0_i for a batch of transform sets.

    Args:
        x0: rest points (N, 3).
        tfms: handle transforms (B, H, 3, 4).
        w_x0: skinning weights (N, H).

    Returns:
        (N, B, 1, 3) transformed points (reference keeps the singleton dim).
        Ref :39 — one einsum on the MXU instead of expanded bmm chains.
    """
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=1)  # (N, 4)
    # (B, H, 3): T_j [x0;1] contracted with weights
    x = jnp.einsum("nh,bhik,nk->nbi", w_x0, tfms, x0h)
    x = x + x0[:, None, :]
    return x[:, :, None, :]


def weight_function_lbs(x0, tfms, fcn):
    """LBS with weights evaluated by ``fcn`` (differentiable through it).
    Ref :24."""
    return standard_lbs(x0, tfms, fcn(x0))
