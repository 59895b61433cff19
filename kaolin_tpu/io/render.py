"""Synthetic RGBD view loader (Omniverse Kaolin data-generator format).

TPU-native analog of reference ``kaolin/io/render.py:26``
(``import_synthetic_view``): per-view ``{idx}_{category}.png/.npy`` files plus
``{idx}_metadata.json`` with camera properties.
"""

import json
import math
import os

import jax.numpy as jnp
import numpy as np

__all__ = ["import_synthetic_view"]


def import_synthetic_view(root_dir, idx, rgb=True, depth_linear=False,
                          semantic=False, instance=False, normals=False,
                          bbox_2d_tight=False, bbox_2d_loose=False):
    """Load one synthetic sensor view → dict of arrays + metadata. Ref :26."""
    from kaolin_tpu.render.camera.legacy import generate_perspective_projection

    output = {}

    def _import_npy(cat):
        path = os.path.join(root_dir, f"{idx}_{cat}.npy")
        output[cat] = jnp.asarray(np.load(path)) if os.path.exists(path) \
            else None

    def _import_png(cat):
        path = os.path.join(root_dir, f"{idx}_{cat}.png")
        if os.path.exists(path):
            from PIL import Image
            arr = np.array(Image.open(path))[:, :, :3].astype(np.float32)
            output[cat] = jnp.asarray(arr / 255.0)
        else:
            output[cat] = None

    if rgb:
        _import_png("rgb")
    if depth_linear:
        _import_npy("depth_linear")
    if semantic:
        _import_npy("semantic")
    if instance:
        _import_npy("instance")
    if normals:
        _import_png("normals")

    with open(os.path.join(root_dir, f"{idx}_metadata.json")) as f:
        meta = json.load(f)
    cam_props = meta["camera_properties"]
    asset_transforms = jnp.asarray(meta["asset_transforms"][0][1],
                                   dtype=jnp.float32)
    cam_transform = jnp.asarray(cam_props["tf_mat"], dtype=jnp.float32)
    aspect_ratio = (cam_props["resolution"]["width"]
                    / cam_props["resolution"]["height"])
    fov = 2 * math.atan(cam_props["horizontal_aperture"]
                        / (2 * cam_props["focal_length"]))
    output["metadata"] = {
        "cam_transform": cam_transform[:, :3],
        "asset_transforms": asset_transforms,
        "cam_proj": generate_perspective_projection(fov, aspect_ratio),
        "clipping_range": cam_props["clipping_range"],
    }
    if bbox_2d_tight:
        output["bbox_2d_tight"] = meta["bbox_2d_tight"]
    if bbox_2d_loose:
        output["bbox_2d_loose"] = meta["bbox_2d_loose"]
    return output


from kaolin_tpu.render.camera.legacy import (  # noqa: F401,E402
    generate_perspective_projection,
)
