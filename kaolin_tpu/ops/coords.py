"""Coordinate-system conversions. Ref ``kaolin/ops/coords.py``.
Convention: X toward camera, Z-up, Y-right."""

import jax.numpy as jnp

__all__ = ["spherical2cartesian", "cartesian2spherical"]


def spherical2cartesian(azimuth, elevation, distance=None):
    """Spherical (radians) → cartesian (x, y, z). Ref :20."""
    if distance is None:
        z = jnp.sin(elevation)
        temp = jnp.cos(elevation)
    else:
        z = jnp.sin(elevation) * distance
        temp = jnp.cos(elevation) * distance
    return jnp.cos(azimuth) * temp, jnp.sin(azimuth) * temp, z


def cartesian2spherical(x, y, z):
    """Cartesian → (azimuth, elevation, distance) in radians. Ref :44."""
    distance = jnp.sqrt(x ** 2 + y ** 2 + z ** 2)
    elevation = jnp.arcsin(z / distance)
    azimuth = jnp.arctan2(y, x)
    return azimuth, elevation, distance
