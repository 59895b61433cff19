"""Simplicits easy API: drop a soft body under gravity (BASELINE config 1).

TPU-native version of the reference's simplicits_easy_api tutorial: create a
SimplicitsObject from sample points, add it to a scene with gravity + floor,
and step — the whole solve runs as one jitted XLA program per step.

Run: python examples/simplicits_drop.py  (CPU or TPU)
"""

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.physics.simplicits import (PhysicsPoints, SimplicitsObject,
                                           SimplicitsScene)


def main():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32) \
        + np.array([0.0, 1.0, 0.0], np.float32)
    phys = PhysicsPoints(pts=jnp.asarray(pts), yms=1e5, prs=0.45, rhos=500.0,
                         appx_vol=1.0)

    # analytic skinning field; swap for SimplicitsObject.create_with_mlp to
    # train the weight network like the reference tutorial
    freqs = jnp.asarray(rng.randn(3, 9).astype(np.float32))
    obj = SimplicitsObject.create_from_function(
        phys, lambda x: jnp.sin(x @ freqs))

    scene = SimplicitsScene(timestep=0.03, max_newton_steps=5,
                            max_ls_steps=10)
    obj_idx = scene.add_object(obj, num_qp=256)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=0.0, floor_axis=1,
                          floor_penalty=1000.0)

    for step in range(30):
        scene.run_sim_step()
        if step % 10 == 0:
            y = float(jnp.mean(scene.get_object_deformed_pts(obj_idx)[:, 1]))
            print(f"step {step:3d}: mean height {y:+.3f}")
    y = float(jnp.mean(scene.get_object_deformed_pts(obj_idx)[:, 1]))
    print(f"final mean height {y:+.3f} (fell from +1.0, floor at 0)")


if __name__ == "__main__":
    main()
