"""Spherical harmonics (degree 3) lighting. Ref ``kaolin/render/lighting/sh.py``
(project_onto_sh9 :28, sh9_irradiance :78, sh9_diffuse :104)."""

import math

import jax.numpy as jnp

__all__ = ["project_onto_sh9", "sh9_irradiance", "sh9_diffuse"]


def project_onto_sh9(directions):
    """Cartesian directions (..., 3) → SH9 coefficients (..., 9). Ref :28."""
    if isinstance(directions, (list, tuple)):
        directions = jnp.asarray(directions, dtype=jnp.float32)
    x = directions[..., 0]
    y = directions[..., 1]
    z = directions[..., 2]
    return jnp.stack([
        jnp.full_like(x, 0.28209479177),
        -0.4886025119 * y,
        0.4886025119 * z,
        -0.4886025119 * x,
        1.0925484305920792 * (x * y),
        -1.0925484305920792 * (y * z),
        0.94617469575 * (z * z) - 0.31539156525,
        -1.0925484305920792 * (x * z),
        0.5462742152960396 * (x * x - y * y),
    ], axis=-1)


def sh9_irradiance(lights, normals):
    """Incident irradiance from an SH9 radiance lobe at surface normals:
    lights (9,), normals (N, 3) → (N,). Ref :78."""
    bands = project_onto_sh9(normals)
    bands = bands.at[..., 0].multiply(math.pi)
    bands = bands.at[..., 1:4].multiply(2.0 * math.pi / 3.0)
    bands = bands.at[..., 4:].multiply(math.pi / 4.0)
    return jnp.sum(bands * lights[None, :], axis=-1)


def sh9_diffuse(directions, normals, albedo):
    """Lambertian diffuse radiance from an SH9 light in ``directions`` (3,):
    normals/albedo (N, 3) → (N, 3). Ref :104."""
    lights = project_onto_sh9(directions)
    irradiance = sh9_irradiance(lights, normals)
    return albedo * irradiance[..., None]
