"""Render metrics. Ref ``kaolin/metrics/render.py``."""

import jax.numpy as jnp

__all__ = ["mask_iou"]


def mask_iou(lhs_mask, rhs_mask):
    """IoU loss between soft segmentation masks (B, H, W) → scalar
    ``1 - mean(IoU)``. Ref :18."""
    sil_mul = lhs_mask * rhs_mask
    sil_add = lhs_mask + rhs_mask
    b = lhs_mask.shape[0]
    iou_up = jnp.sum(sil_mul.reshape(b, -1), axis=1)
    iou_down = jnp.sum((sil_add - sil_mul).reshape(b, -1), axis=1)
    return 1.0 - jnp.mean(iou_up / (iou_down + 1e-10))
