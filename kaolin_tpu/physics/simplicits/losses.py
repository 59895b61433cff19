"""Simplicits training losses.

TPU-native analog of reference ``kaolin/physics/simplicits/losses.py``
(loss_ortho :33, loss_elastic :45, compute_losses :95) and the Warp fast path
``losses_warp.py:270`` — here the whole loss (finite-diff deformation
gradients over a batch of random handle transforms + elastic energies) is one
jitted function; XLA fuses it into a handful of MXU/VPU kernels, which is the
Warp-fast-path equivalent with zero extra code.
"""

import functools

import jax
import jax.numpy as jnp

from kaolin_tpu.physics.materials import linear_elastic_material, material_utils
from kaolin_tpu.physics.materials import neohookean_elastic_material as neo
from kaolin_tpu.physics.simplicits.skinning import weight_function_lbs
from kaolin_tpu.physics.utils.finite_diff import finite_diff_jac

__all__ = ["loss_ortho", "loss_elastic", "compute_losses"]


def loss_ortho(weights):
    """MSE(WᵀW, I) over sample weights (S, H). Ref :33."""
    h = weights.shape[1]
    gram = weights.T @ weights
    return jnp.mean((gram - jnp.eye(h, dtype=weights.dtype)) ** 2)


def loss_elastic(model, pts, yms, prs, rhos, transforms, appx_vol, interp_step,
                 elasticity_type="neohookean", interp_material=False):
    """Simplicits elastic training loss. Ref :45.

    Deforms sample points through LBS under a batch of random handle
    transforms, takes finite-difference deformation gradients, and integrates
    the (interp_step-blended linear→neohookean) elastic energy.
    """
    mus, lams = material_utils.to_lame(yms, prs)

    # ``model`` is called raw (no bbox normalization, learned handles only)
    # exactly as the reference does during training (losses.py:65).
    partial_lbs = functools.partial(weight_function_lbs, tfms=transforms, fcn=model)
    pt_wise_fs = finite_diff_jac(partial_lbs, pts)    # (N, B, 1, 3, 3)
    pt_wise_fs = pt_wise_fs[:, :, 0]                  # (N, B, 3, 3)

    n, b = pt_wise_fs.shape[:2]
    mus = jnp.broadcast_to(mus.reshape(-1, 1), (n, b))[..., None]
    lams = jnp.broadcast_to(lams.reshape(-1, 1), (n, b))[..., None]

    if interp_material:
        mus = (1 - interp_step) * jnp.min(mus) + interp_step * mus
        lams = (1 - interp_step) * jnp.min(lams) + interp_step * lams

    lin = (1 - interp_step) * linear_elastic_material.linear_elastic_energy(
        mus, lams, pt_wise_fs)
    if elasticity_type != "neohookean":
        raise ValueError(f"elasticity type {elasticity_type} not supported")
    nh = interp_step * neo.neohookean_energy(mus, lams, pt_wise_fs)
    return (appx_vol / pts.shape[0]) * jnp.sum(lin + nh)


def compute_losses(model, normalized_pts, yms, prs, rhos, en_interp,
                   batch_size, appx_vol, num_samples, le_coeff, lo_coeff, key):
    """One training-step loss evaluation (ref :95): subsample points, draw a
    batch of random handle transforms, return (elastic, ortho) losses.

    ``key`` is the explicit PRNG key (reference uses torch's global RNG).
    """
    k_idx, k_tfm = jax.random.split(key)
    sample_indices = jax.random.randint(
        k_idx, (num_samples,), 0, normalized_pts.shape[0])
    sample_pts = normalized_pts[sample_indices]
    sample_yms = yms.reshape(-1)[sample_indices]
    sample_prs = prs.reshape(-1)[sample_indices]
    sample_rhos = rhos.reshape(-1)[sample_indices]

    weights = model(sample_pts)
    num_handles_learned = weights.shape[-1]
    batch_transforms = 0.1 * jax.random.normal(
        k_tfm, (batch_size, num_handles_learned, 3, 4), dtype=normalized_pts.dtype)

    le = le_coeff * loss_elastic(model, sample_pts, sample_yms, sample_prs,
                                 sample_rhos, batch_transforms, appx_vol,
                                 en_interp)
    lo = lo_coeff * loss_ortho(weights)
    return le, lo
