"""Simulatable 3D Gaussian Splats (BASELINE config 5, simulatable_3dgrut).

Gaussian shell → volumetric densifier → Simplicits soft body with collisions
→ simulate → deform the renderable gaussians with the body.

Run: python examples/simulatable_gaussians.py
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.ops.gaussians import sample_points_in_volume
from kaolin_tpu.physics.simplicits import (PhysicsPoints, SimplicitsObject,
                                           SimplicitsScene)


def main():
    rng = np.random.RandomState(0)
    n = 500
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xyz = (0.4 * d + np.array([0.0, 0.6, 0.0])).astype(np.float32)
    scales = np.full((n, 3), 0.06, np.float32)
    rots = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.9, np.float32)

    vol_pts = sample_points_in_volume(xyz, scales, rots, opac,
                                      octree_level=6, num_samples=400,
                                      method="floodfill")
    print(f"densifier: {vol_pts.shape[0]} interior points "
          f"from {n} shell gaussians")

    phys = PhysicsPoints(pts=vol_pts, yms=2e5, prs=0.45, rhos=500.0,
                         appx_vol=4 / 3 * np.pi * 0.4 ** 3)
    freqs = jnp.asarray(rng.randn(3, 7).astype(np.float32))
    obj = SimplicitsObject.create_from_function(
        phys, lambda x: jnp.sin(x @ freqs))

    scene = SimplicitsScene(timestep=0.03, max_newton_steps=3,
                            max_ls_steps=10)
    obj_idx = scene.add_object(obj, num_qp=256,
                               renderable_pts=jnp.asarray(xyz))
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=0.0, floor_penalty=1000.0)
    scene.enable_collisions()

    for step in range(20):
        scene.run_sim_step()
        if step % 5 == 0:
            moved = scene.get_object_deformed_pts(obj_idx, points="rendered")
            print(f"step {step:3d}: gaussian mean height "
                  f"{float(jnp.mean(moved[:, 1])):+.3f}")
    tfms = scene.get_object_point_transforms(obj_idx, points="rendered")
    print(f"per-gaussian 4x4 transforms for rendering: {tfms.shape}")


if __name__ == "__main__":
    main()
