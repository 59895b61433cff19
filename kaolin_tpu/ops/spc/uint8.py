"""Bit manipulation helpers for byte-packed octrees.
Ref ``kaolin/ops/spc/uint8.py``."""

import jax.numpy as jnp

__all__ = ["uint8_to_bits", "uint8_bits_sum", "bits_to_uint8"]


def uint8_to_bits(uint8_t):
    """uint8 (...,) → bool (..., 8), LSB first. Ref :29."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return ((uint8_t[..., None] >> shifts) & 1).astype(bool)


def uint8_bits_sum(uint8_t):
    """Popcount per byte. Ref :66."""
    return jnp.sum(uint8_to_bits(uint8_t), axis=-1).astype(jnp.int32)


def bits_to_uint8(bool_t):
    """bool (..., 8) LSB first → uint8 (...,). Ref :95."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    return jnp.sum(bool_t.astype(jnp.uint8) << shifts, axis=-1).astype(jnp.uint8)
