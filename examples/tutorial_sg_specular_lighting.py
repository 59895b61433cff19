"""Tutorial: specular lighting with spherical gaussians.

TPU-native port of the reference notebook
``examples/tutorial/sg_specular_lighting.ipynb``: rasterize per-pixel
normals + view directions, build SG lights, and shade with the full
diffuse + Cook-Torrance specular split the reference demonstrates
(``sg_warp_specular_term``), sweeping roughness to show the highlight
tighten.

Run: python examples/tutorial_sg_specular_lighting.py   (CPU or TPU)
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera
from kaolin_tpu.render.lighting import (
    SgLightingParameters, sg_diffuse_inner_product, sg_from_sun,
    sg_warp_specular_term)

from tutorial_camera_rasterization import make_icosphere
from tutorial_diffuse_lighting import render_normals


def main(smoke=False, res=None):
    res = res or (64 if smoke else 256)
    vertices, faces = make_icosphere(2 if smoke else 3)
    camera = Camera.from_args(eye=jnp.asarray([0.0, 0.6, 2.2]),
                              at=jnp.zeros(3),
                              up=jnp.asarray([0.0, 1.0, 0.0]),
                              fov=0.7, width=res, height=res)
    normals_img, face_idx = render_normals(camera, vertices, faces)
    hit = np.asarray(face_idx) >= 0
    assert hit.any(), "sphere must cover some pixels"

    # a warm key light + a dim cool fill, as SG lobes (sg_from_sun is
    # batched: (N, 3) directions/colors, (N,) strengths/angles)
    sun_dir = jnp.asarray([[0.5, 0.7, 0.5], [-0.6, 0.2, 0.4]])
    sun_dir = sun_dir / jnp.linalg.norm(sun_dir, axis=-1, keepdims=True)
    amp, direction, sharp = sg_from_sun(
        sun_dir, strength=jnp.asarray([3.0, 0.6]),
        angle=jnp.asarray([0.3, 0.8]),
        color=jnp.asarray([[1.0, 0.95, 0.8], [0.5, 0.6, 1.0]]))
    lights = SgLightingParameters(amplitude=amp, direction=direction,
                                  sharpness=sharp)

    normals = normals_img.reshape(-1, 3)
    nrm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    normals = jnp.where(nrm > 1e-6, normals / jnp.clip(nrm, 1e-6), 0.0)
    cam_pos = camera.cam_pos().reshape(3)
    # per-pixel view direction: surface point ~ sphere normal (unit sphere)
    view = cam_pos[None, :] - normals
    view = view / jnp.linalg.norm(view, axis=-1, keepdims=True)

    albedo = jnp.asarray([0.6, 0.2, 0.2])
    diffuse = sg_diffuse_inner_product(
        lights.amplitude, lights.direction, lights.sharpness, normals,
        jnp.broadcast_to(albedo, normals.shape))

    images = {}
    for rough in ((0.4,) if smoke else (0.15, 0.4, 0.8)):
        spec = sg_warp_specular_term(
            lights.amplitude, lights.direction, lights.sharpness, normals,
            jnp.full((normals.shape[0],), rough), view,
            jnp.broadcast_to(jnp.asarray([0.04, 0.04, 0.04]),
                             normals.shape))
        img = np.asarray((diffuse + spec).reshape(res, res, 3))
        img = np.where(hit[..., None], img, 0.0)
        images[rough] = img
        assert np.isfinite(img).all()
        assert img[hit].max() > img[hit].mean(), "specular must add contrast"

    if len(images) > 1:
        # rougher surfaces spread the highlight: the max pixel dims while
        # the lit-region mean stays comparable
        peaks = {r: im[hit].max() for r, im in images.items()}
        assert peaks[0.15] > peaks[0.8], f"highlight ordering broke: {peaks}"
    print("sg specular:", {r: float(im[hit].max())
                           for r, im in images.items()})
    return images


if __name__ == "__main__":
    main()
