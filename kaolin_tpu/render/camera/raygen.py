"""Ray generation for pinhole / orthographic cameras.

TPU-native analog of reference ``kaolin/render/camera/raygen.py``
(generate_pinhole_rays :110, generate_ortho_rays :172,
generate_centered_pixel_coords :41).
"""

import jax.numpy as jnp

from kaolin_tpu.render.camera.intrinsics import CameraFOV

__all__ = [
    "generate_default_grid",
    "generate_centered_pixel_coords",
    "generate_centered_custom_resolution_pixel_coords",
    "generate_pinhole_rays",
    "generate_ortho_rays",
    "generate_rays",
]


def generate_default_grid(width, height, dtype=jnp.float32):
    """Pixel-corner meshgrid → (pixel_y, pixel_x) of shape (H, W). Ref :19."""
    h = jnp.arange(height, dtype=dtype)
    w = jnp.arange(width, dtype=dtype)
    return jnp.meshgrid(h, w, indexing="ij")


def generate_centered_pixel_coords(img_width, img_height, dtype=jnp.float32):
    """Pixel-center grid. Ref :41."""
    pixel_y, pixel_x = generate_default_grid(img_width, img_height, dtype)
    return pixel_y + 0.5, pixel_x + 0.5


def generate_centered_custom_resolution_pixel_coords(
        img_width, img_height, res_x=None, res_y=None, dtype=jnp.float32):
    """Pixel-center grid at custom resolution. Ref :67."""
    res_x = img_width if res_x is None else res_x
    res_y = img_height if res_y is None else res_y
    scale_x = img_width / res_x
    scale_y = img_height / res_y
    pixel_y, pixel_x = generate_default_grid(res_x, res_y, dtype)
    return scale_y * pixel_y + scale_y / 2.0, scale_x * pixel_x + scale_x / 2.0


def _to_ndc_coords(pixel_x, pixel_y, camera):
    pixel_x = 2 * (pixel_x / camera.width) - 1.0
    pixel_y = 2 * (pixel_y / camera.height) - 1.0
    return pixel_x, pixel_y


def generate_pinhole_rays(camera, coords_grid=None):
    """Rays through pixel centers for a batch-1 pinhole camera →
    (ray_orig (H*W, 3), ray_dir (H*W, 3)) in world coords. Ref :110."""
    assert len(camera) == 1, "generate_pinhole_rays supports batch size 1"
    if coords_grid is None:
        coords_grid = generate_centered_pixel_coords(camera.width, camera.height,
                                                     dtype=camera.dtype)
    pixel_y, pixel_x = coords_grid
    pixel_x = pixel_x - camera.x0
    pixel_y = pixel_y + camera.y0
    pixel_x, pixel_y = _to_ndc_coords(pixel_x, pixel_y, camera)

    ray_dir = jnp.stack(
        (pixel_x * camera.intrinsics.tan_half_fov(CameraFOV.HORIZONTAL),
         -pixel_y * camera.intrinsics.tan_half_fov(CameraFOV.VERTICAL),
         -jnp.ones_like(pixel_x)), axis=-1)
    ray_dir = ray_dir.reshape(-1, 3)
    ray_orig = jnp.zeros_like(ray_dir)
    ray_orig, ray_dir = camera.extrinsics.inv_transform_rays(ray_orig, ray_dir)
    ray_dir = ray_dir / jnp.linalg.norm(ray_dir, axis=-1, keepdims=True)
    return ray_orig[0], ray_dir[0]


def generate_ortho_rays(camera, coords_grid=None):
    """Parallel rays for a batch-1 orthographic camera. Ref :172."""
    assert len(camera) == 1, "generate_ortho_rays supports batch size 1"
    if coords_grid is None:
        coords_grid = generate_centered_pixel_coords(camera.width, camera.height,
                                                     dtype=camera.dtype)
    pixel_y, pixel_x = coords_grid
    pixel_x, pixel_y = _to_ndc_coords(pixel_x, pixel_y, camera)
    aspect_ratio = camera.width / camera.height
    pixel_x = pixel_x * camera.fov_distance * aspect_ratio
    pixel_y = pixel_y * camera.fov_distance
    zeros = jnp.zeros_like(pixel_x)
    ray_dir = jnp.stack((zeros, zeros, -jnp.ones_like(pixel_x)), axis=-1)
    ray_orig = jnp.stack((pixel_x, -pixel_y, zeros), axis=-1)
    ray_dir = ray_dir.reshape(-1, 3)
    ray_orig = ray_orig.reshape(-1, 3)
    ray_orig, ray_dir = camera.extrinsics.inv_transform_rays(ray_orig, ray_dir)
    return ray_orig[0], ray_dir[0]


def generate_rays(camera, coords_grid=None):
    """Dispatch on lens type."""
    if camera.lens_type == "pinhole":
        return generate_pinhole_rays(camera, coords_grid)
    return generate_ortho_rays(camera, coords_grid)
