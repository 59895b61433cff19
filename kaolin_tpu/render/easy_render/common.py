"""Easy-render defaults. Ref ``kaolin/render/easy_render/common.py:26-53``."""

import math

import jax.numpy as jnp

from kaolin_tpu.render.camera import Camera
from kaolin_tpu.render.lighting import (
    SgLightingParameters,
    sg_direction_from_azimuth_elevation,
)
from kaolin_tpu.render.materials import PBRMaterial

__all__ = ["default_lighting", "default_camera", "default_material"]


def default_lighting():
    """Single SG light from upper-left. Ref :26."""
    direction = sg_direction_from_azimuth_elevation(2.3, math.pi / 3.0)
    return SgLightingParameters(amplitude=3.0, direction=direction,
                                sharpness=5.0)


def default_camera(resolution=512):
    """Pinhole camera at (1,1,1) looking at origin. Ref :38."""
    return Camera.from_args(
        eye=jnp.ones((3,)), at=jnp.zeros((3,)), up=jnp.asarray([0., 1., 0.]),
        fov=math.pi * 45 / 180, height=resolution, width=resolution)


def default_material(diffuse_color=None):
    """Slightly specular default PBR material (green). Ref :53."""
    if diffuse_color is None:
        diffuse_color = (118. / 255., 185. / 255., 0.)
    return PBRMaterial(diffuse_color=jnp.asarray(diffuse_color),
                       specular_color=jnp.asarray((0.2, 0.2, 0.2)),
                       roughness_value=0.5,
                       is_specular_workflow=True)
