"""Camera recipes: construction, properties, transforms, movement, rays,
differentiable pose — the reference's ten camera recipes
(examples/recipes/camera/) condensed into one runnable tour.

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python examples/recipes/camera_recipes.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.render.camera import (
    Camera, CameraExtrinsics, PinholeIntrinsics, blender_coords,
    generate_pinhole_rays,
)

# -- simple + explicit construction (camera_init_simple/explicit.py) --
cam = Camera.from_args(eye=jnp.asarray([4.0, 4.0, 4.0]), at=jnp.zeros(3),
                       up=jnp.asarray([0.0, 1.0, 0.0]),
                       fov=np.deg2rad(45), width=256, height=256)
explicit = Camera(
    CameraExtrinsics.from_view_matrix(cam.view_matrix()),
    PinholeIntrinsics.from_focal(256, 256,
                                 focal_x=float(cam.intrinsics.focal_x[0])))
print("view matrix:\n", np.asarray(cam.view_matrix())[0].round(3))

# -- properties (camera_properties.py) --
print("fov_y deg:", float(cam.intrinsics.fov()[0]), "| cam_pos:",
      np.asarray(cam.cam_pos()).ravel().round(3))

# -- transforms: world -> camera -> ndc (camera_transforms.py) --
pts = jnp.asarray(np.random.RandomState(0).randn(5, 3), jnp.float32)
cam_space = cam.extrinsics.transform(pts)
clip = cam.transform(pts)
print("world->camera:", np.asarray(cam_space).shape,
      "world->clip:", np.asarray(clip).shape)

# -- movement (camera_movement.py; our API is pure — returns new objects) --
moved = cam.extrinsics.move_forward(1.0).rotate(yaw=0.3)
print("moved cam_pos:", np.asarray(
    Camera(moved, cam.intrinsics).cam_pos()).ravel().round(3))

# -- coordinate systems (camera_coordinate_systems.py) --
in_blender = cam.extrinsics.change_coordinate_system(blender_coords())
print("blender-coords view row0:",
      np.asarray(in_blender.view_matrix())[0, 0].round(3))

# -- ray generation for a ray tracer (camera_ray_tracing.py) --
ray_o, ray_d = generate_pinhole_rays(cam)
print("rays:", np.asarray(ray_o).shape, np.asarray(ray_d).shape)

# -- differentiable pose (cameras_differentiable.py): cameras are pytrees;
#    gradients flow through the extrinsics params under jit/grad --
target = jnp.zeros((5, 3))


def loss_fn(extr_params):
    extr = CameraExtrinsics(extr_params, backend=cam.extrinsics.backend)
    projected = Camera(extr, cam.intrinsics).transform(pts)
    return jnp.mean((projected[..., :2] - target[None, :, :2]) ** 2)


g = jax.grad(loss_fn)(cam.extrinsics.params)
print("d loss / d extrinsics params:", np.asarray(g).shape,
      "finite:", bool(np.isfinite(np.asarray(g)).all()))
