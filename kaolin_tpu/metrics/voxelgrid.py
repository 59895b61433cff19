"""Voxelgrid metrics. Ref ``kaolin/metrics/voxelgrid.py``."""

import jax.numpy as jnp

__all__ = ["iou"]


def iou(pred, gt):
    """IoU between binary voxelgrids (B, X, Y, Z) → (B,). Ref :19."""
    if pred.shape != gt.shape:
        raise ValueError(f"shape mismatch {pred.shape} vs {gt.shape}")
    p = pred.astype(bool).reshape(pred.shape[0], -1)
    g = gt.astype(bool).reshape(gt.shape[0], -1)
    inter = jnp.sum(p & g, axis=-1).astype(jnp.float32)
    union = jnp.sum(p | g, axis=-1).astype(jnp.float32)
    return inter / jnp.clip(union, 1.0, None)
