"""Render helpers: texture sampling, SH lighting, vertex preparation.

TPU-native analog of reference ``kaolin/render/mesh/utils.py``
(texture_mapping :23, spherical_harmonic_lighting :78, prepare_vertices :128).
``texture_mapping`` implements grid_sample(align_corners=False,
padding_mode='border') semantics in jnp gathers.
"""

import jax.numpy as jnp

from kaolin_tpu.ops.mesh import face_normals as compute_face_normals
from kaolin_tpu.ops.mesh import index_vertices_by_faces
from kaolin_tpu.render.camera.legacy import (
    perspective_camera,
    rotate_translate_points,
)

__all__ = ["texture_mapping", "spherical_harmonic_lighting", "prepare_vertices"]


def _grid_sample_2d(image, coords, mode="bilinear"):
    """image (C, Hin, Win); coords (N, 2) in [-1, 1] xy; border padding,
    align_corners=False. Returns (N, C)."""
    c, h, w = image.shape
    x = (coords[:, 0] + 1.0) * (w / 2.0) - 0.5
    y = (coords[:, 1] + 1.0) * (h / 2.0) - 0.5
    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
        return image[:, yi, xi].T
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, h - 1)
    v00 = image[:, y0i, x0i]
    v01 = image[:, y0i, x1i]
    v10 = image[:, y1i, x0i]
    v11 = image[:, y1i, x1i]
    out = (v00 * (1 - tx) * (1 - ty) + v01 * tx * (1 - ty)
           + v10 * (1 - tx) * ty + v11 * tx * ty)
    return out.T


def texture_mapping(texture_coordinates, texture_maps, mode="nearest"):
    """Sample texture maps at (OpenGL-style, y-up, [0,1]) UV coords.

    texture_coordinates: (B, H, W, 2) or (B, N, 2); texture_maps:
    (B, C, H', W'). Returns (B, H, W, C) or (B, N, C). Ref :23."""
    batch_size = texture_coordinates.shape[0]
    num_channels = texture_maps.shape[1]
    tc = texture_coordinates.reshape(batch_size, -1, 2)
    tc = jnp.clip(tc, 0.0, 1.0) * 2.0 - 1.0
    tc = tc.at[..., 1].multiply(-1.0)  # ogl y-up → image y-down
    import jax
    out = jax.vmap(lambda img, coords: _grid_sample_2d(img, coords, mode))(
        texture_maps, tc)
    return out.reshape(batch_size, *texture_coordinates.shape[1:-1],
                       num_channels)


def spherical_harmonic_lighting(imnormal, lights):
    """SH9 lighting effect from per-pixel normals (B, H, W, 3) and SH params
    (B, 9) → (B, H, W). Ref :78 (deprecated upstream; kept for parity)."""
    x = imnormal[..., 0]
    y = imnormal[..., 1]
    z = imnormal[..., 2]
    bands = jnp.stack([
        0.28209479177 * jnp.ones_like(x),
        0.4886025119 * x,
        0.4886025119 * z,
        0.4886025119 * y,
        1.09254843059 * (x * y),
        1.09254843059 * (y * z),
        0.94617469575 * (z * z) - 0.31539156525,
        0.77254840404 * (x * z),
        0.38627420202 * (x * x - y * y),
    ], axis=-1)
    return jnp.sum(bands * lights.reshape(-1, 1, 1, 9), axis=-1)


def prepare_vertices(vertices, faces, camera_proj, camera_rot=None,
                     camera_trans=None, camera_transform=None):
    """Transform + project vertices, index by faces, compute normals.
    Ref :128."""
    if camera_transform is None:
        assert camera_rot is not None and camera_trans is not None
        vertices_camera = rotate_translate_points(vertices, camera_rot,
                                                  camera_trans)
    else:
        assert camera_rot is None and camera_trans is None
        padded = jnp.concatenate(
            [vertices, jnp.ones_like(vertices[..., :1])], axis=-1)
        vertices_camera = padded @ camera_transform
    vertices_image = perspective_camera(vertices_camera, camera_proj)
    face_vertices_camera = index_vertices_by_faces(vertices_camera, faces)
    face_vertices_image = index_vertices_by_faces(vertices_image, faces)
    face_normals = compute_face_normals(face_vertices_camera, unit=True)
    return face_vertices_camera, face_vertices_image, face_normals
