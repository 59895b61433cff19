"""Tutorial: diffuse lighting with spherical gaussians.

TPU-native port of the reference notebook
``examples/tutorial/diffuse_lighting.ipynb``: rasterize a mesh's normals,
build spherical-gaussian (SG) lights from sun parameters / azimuth-elevation,
and shade the image with both diffuse models the reference ships — the exact
``sg_irradiance_inner_product`` and the cheaper ``sg_irradiance_fitted``
approximation — then compare them.

Run: python examples/tutorial_diffuse_lighting.py   (CPU or TPU)
"""

import math

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops.mesh import face_normals, index_vertices_by_faces
from kaolin_tpu.render.camera import Camera
from kaolin_tpu.render.lighting import (
    SgLightingParameters, sg_diffuse_fitted, sg_diffuse_inner_product,
    sg_direction_from_azimuth_elevation, sg_from_sun)
from kaolin_tpu.render.mesh import rasterize

from tutorial_camera_rasterization import make_icosphere


def render_normals(camera, vertices, faces):
    """Rasterize flat per-face normals into a (H, W, 3) image."""
    cam_pos = camera.extrinsics.transform(vertices)            # (1, V, 3)
    ndc = camera.intrinsics.transform(cam_pos)
    face_cam = index_vertices_by_faces(cam_pos, faces)
    face_ndc = index_vertices_by_faces(ndc[..., :2], faces)
    fn = face_normals(index_vertices_by_faces(vertices[None], faces),
                      unit=True)                               # (1, F, 3)
    feat = jnp.broadcast_to(fn[:, :, None, :], fn.shape[:2] + (3, 3))
    image, face_idx = rasterize(camera.height, camera.width,
                                face_cam[..., 2], face_ndc, feat)
    return image[0], face_idx[0]


def main(smoke=False):
    res = 48 if smoke else 256
    vertices, faces = make_icosphere(1 if smoke else 2)
    camera = Camera.from_args(eye=jnp.asarray([2.0, 1.2, 2.0]),
                              at=jnp.zeros(3),
                              up=jnp.asarray([0.0, 1.0, 0.0]),
                              fov=math.pi * 45 / 180, width=res, height=res)
    normals, face_idx = render_normals(camera, vertices, faces)
    hit = face_idx >= 0

    # --- build SG lights three ways (ref notebook cells 3-5) -------------
    # (a) from sun direction + strength + angular size
    sun = SgLightingParameters.from_sun(
        jnp.asarray([-1.0, -1.0, -1.0]) / math.sqrt(3.0),
        strength=2.5, angle=math.pi / 8, color=jnp.asarray([1.0, 0.9, 0.7]))
    # (b) from azimuth/elevation (the interactive-widget path), through the
    # parameter container used by easy_render (also batched via the
    # low-level sg_from_sun — kept importable for parity)
    assert callable(sg_from_sun)
    dir_b = sg_direction_from_azimuth_elevation(2.3, math.pi / 3)
    fill = SgLightingParameters(amplitude=1.5, direction=dir_b,
                                sharpness=4.0)

    def as_rows(p):
        amp = jnp.broadcast_to(jnp.atleast_2d(
            jnp.asarray(p.amplitude, jnp.float32)), (1, 3))
        di = jnp.atleast_2d(jnp.asarray(p.direction, jnp.float32))
        sh = jnp.reshape(jnp.asarray(p.sharpness, jnp.float32), (1,))
        return amp, di, sh

    (amp_a, dir_a, sh_a), (amp_b, dir_b2, sh_b) = as_rows(sun), as_rows(fill)
    amplitude = jnp.concatenate([amp_a, amp_b])
    direction = jnp.concatenate([dir_a, dir_b2])
    sharpness = jnp.concatenate([sh_a, sh_b])

    # --- shade with the exact inner product vs the fitted approximation --
    n_flat = normals.reshape(-1, 3)
    albedo = jnp.full_like(n_flat, 0.8)
    img_exact = sg_diffuse_inner_product(amplitude, direction, sharpness,
                                         n_flat, albedo).reshape(res, res, 3)
    img_fit = sg_diffuse_fitted(amplitude, direction, sharpness,
                                n_flat, albedo).reshape(res, res, 3)
    img_exact = jnp.where(hit[..., None], img_exact, 0.0)
    img_fit = jnp.where(hit[..., None], img_fit, 0.0)

    mean_exact = float(jnp.sum(img_exact) / jnp.clip(jnp.sum(hit), 1, None))
    # the fitted model trades absolute accuracy for speed; what it preserves
    # is the SHADING PATTERN — compare by correlation over covered pixels
    a = img_exact.reshape(-1, 3)[hit.reshape(-1)].reshape(-1)
    b = img_fit.reshape(-1, 3)[hit.reshape(-1)].reshape(-1)
    corr = float(jnp.corrcoef(jnp.stack([a, b]))[0, 1])
    print(f"lit pixels: {int(jnp.sum(hit))}; mean exact radiance "
          f"{mean_exact:.4f}; fitted-vs-exact correlation {corr:.3f}")
    assert mean_exact > 0
    assert corr > 0.9, "fitted approximation should track the inner product"

    # lit side should be brighter than the far side (sanity of directionality)
    lit = jnp.sum(n_flat @ (-direction[0]) > 0.5)
    print(f"normals facing light (a): {int(lit)}")
    print("done")
    return np.asarray(img_exact)


if __name__ == "__main__":
    main()
