"""Legacy camera functions (DIB-R-era API). Ref ``kaolin/render/camera/legacy.py``."""

import math

import jax.numpy as jnp

__all__ = [
    "rotate_translate_points",
    "generate_rotate_translate_matrices",
    "generate_transformation_matrix",
    "perspective_camera",
    "generate_perspective_projection",
]


def rotate_translate_points(points, camera_rot, camera_trans):
    """P_new = R (P_old − T). Ref :22."""
    translated = points - camera_trans.reshape(-1, 1, 3)
    return jnp.matmul(translated, jnp.swapaxes(camera_rot, -1, -2))


def generate_rotate_translate_matrices(camera_position, look_at,
                                       camera_up_direction):
    """(rot (B,3,3), trans (B,3)) for P_cam = R (P_world − T). Ref :40."""
    camz = look_at - camera_position
    camz = camz / (jnp.linalg.norm(camz, axis=1, keepdims=True) + 1e-10)
    camera_up_direction = jnp.broadcast_to(camera_up_direction, camz.shape)
    camx = jnp.cross(camz, camera_up_direction)
    camx = camx / (jnp.linalg.norm(camx, axis=1, keepdims=True) + 1e-10)
    camy = jnp.cross(camx, camz)
    camy = camy / (jnp.linalg.norm(camy, axis=1, keepdims=True) + 1e-10)
    mtx = jnp.stack([camx, camy, -camz], axis=1)
    return mtx, camera_position


def generate_transformation_matrix(camera_position, look_at,
                                   camera_up_direction):
    """(B, 4, 3) such that P_cam = [P_world, 1] @ M. Ref :85."""
    z_axis = camera_position - look_at
    z_axis = z_axis / jnp.linalg.norm(z_axis, axis=1, keepdims=True)
    camera_up_direction = jnp.broadcast_to(camera_up_direction, z_axis.shape)
    x_axis = jnp.cross(camera_up_direction, z_axis)
    x_axis = x_axis / jnp.linalg.norm(x_axis, axis=1, keepdims=True)
    y_axis = jnp.cross(z_axis, x_axis)
    rot_part = jnp.stack([x_axis, y_axis, z_axis], axis=2)
    trans_part = jnp.matmul(-camera_position[:, None, :], rot_part)
    return jnp.concatenate([rot_part, trans_part], axis=1)


def perspective_camera(points, camera_proj):
    """Project camera-space points with a (3, 1) projection vector. Ref :120."""
    projected = points * camera_proj.reshape(-1, 1, 3)
    return projected[:, :, :2] / projected[:, :, 2:3]


def generate_perspective_projection(fovyangle, ratio=1.0, dtype=jnp.float32):
    """(3, 1) projection vector from fovy. Ref :142."""
    tanfov = math.tan(fovyangle / 2.0)
    return jnp.asarray([[1.0 / (ratio * tanfov)], [1.0 / tanfov], [-1.0]],
                       dtype=dtype)
