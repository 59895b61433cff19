"""Golden-image tests for the easy_render pipeline against the reference's
checked-in renders (``tests/samples/render/easy_render/mesh/*.png``) —
the same acceptance criterion as reference test_mesh.py:66-121."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import kaolin_tpu.render.easy_render as easy_render
from kaolin_tpu.io.obj import import_mesh
from kaolin_tpu.ops.pointcloud import center_points
from kaolin_tpu.utils.testing import assert_images_close

DATA = "/root/reference/tests/samples/render/easy_render"


def _gt_image(basename):
    from PIL import Image
    img = np.asarray(Image.open(os.path.join(DATA, "mesh", basename)),
                     dtype=np.float32) / 255.0
    return img[..., :3]


@pytest.mark.parametrize("bname", ["avocado", "armchair"])
def test_golden_render(bname):
    camera = easy_render.default_camera(512)
    lighting = easy_render.default_lighting()
    mesh = import_mesh(os.path.join(DATA, f"{bname}.obj"),
                       with_materials=True, with_normals=True,
                       triangulate=True, raw_materials=False)
    mesh.vertices = center_points(mesh.vertices[None], normalize=True)[0]
    res = easy_render.render_mesh(camera, mesh, lighting=lighting)
    img = np.clip(np.asarray(res["render"][0]), 0.0, 1.0)
    gt = _gt_image(f"{bname}_render.png")
    # reference tolerance (assert_images_close defaults), slightly relaxed
    # for cross-rasterizer edge pixels
    assert_images_close(gt, img, pixel_disagreement_threshold=0.1,
                        max_percent_disagreeing_pixels=2.0)


def test_render_passes_present():
    camera = easy_render.default_camera(64)
    mesh = import_mesh(os.path.join(DATA, "avocado.obj"),
                       with_materials=True, with_normals=True,
                       triangulate=True, raw_materials=False)
    mesh.vertices = center_points(mesh.vertices[None], normalize=True)[0]
    res = easy_render.render_mesh(camera, mesh)
    for name in ("render", "albedo", "normals", "roughness", "diffuse",
                 "specular", "face_idx", "alpha"):
        assert name in res, name
    assert res["render"].shape == (1, 64, 64, 3)


def test_render_differentiable():
    camera = easy_render.default_camera(32)
    mesh = import_mesh(os.path.join(DATA, "avocado.obj"),
                       with_materials=True, with_normals=True,
                       triangulate=True, raw_materials=False)
    mesh.vertices = center_points(mesh.vertices[None], normalize=True)[0]

    verts0 = mesh.vertices

    def loss(v):
        mesh.vertices = v
        res = easy_render.render_mesh(camera, mesh)
        return jnp.sum(res["render"] ** 2)

    g = jax.grad(loss)(verts0)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
