"""Newton-bridge example: a soft Simplicits cube coupled to rigid shapes.

Mirrors the reference's experimental Newton tutorials
(``examples/tutorial/physics/newton_rigidbody_coupling.ipynb``): build a
Simplicits object into a Newton-style model (builder → finalize → state →
solver.step), add rigid colliders with soft contact + IPC friction, and roll
the coupled simulation forward. Writes a Timelapse USD checkpoint you can
inspect with the dash3d viewer or any USD tool.

Run: python examples/newton_coupling.py [--steps 120] [--out /tmp/newton_usd]
"""

import argparse

import numpy as np
import jax.numpy as jnp

from kaolin_tpu.experimental.newton import (
    SimplicitsModelBuilder,
    SimplicitsSolver,
)
from kaolin_tpu.physics.simplicits import SkinnedPhysicsPoints
from kaolin_tpu.visualize import Timelapse


def make_soft_cube(num_handles=8, n=5, half=0.25, center=(0.0, 0.6, 0.0)):
    """A baked Simplicits object: grid points + a smooth skinning field
    (stands in for a trained MLP; same shapes as the trained path)."""
    rng = np.random.RandomState(0)
    g = np.linspace(-half, half, n)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pts = (pts + np.asarray(center)).astype(np.float32)
    freqs = rng.randn(3, num_handles - 1).astype(np.float32)
    w = np.concatenate([np.sin(pts @ freqs), np.ones((len(pts), 1))],
                       axis=1).astype(np.float32)
    dwdx = np.zeros((len(pts), num_handles, 3), np.float32)
    dwdx[:, :-1, :] = np.cos(pts @ freqs)[:, :, None] * freqs.T[None]
    return SkinnedPhysicsPoints(pts=pts, yms=5e4, prs=0.45, rhos=500.0,
                                appx_vol=(2 * half) ** 3,
                                skinning_weights=w, dwdx=dwdx)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--dt", type=float, default=0.01)
    ap.add_argument("--out", default="/tmp/newton_usd")
    args = ap.parse_args()

    builder = SimplicitsModelBuilder(up_axis="y", gravity=-9.8)
    builder.add_simplicits_object(make_soft_cube())
    builder.add_ground_plane(height=-0.5, mu=0.4)
    builder.add_shape_sphere(pos=(0.05, -0.1, 0.0), radius=0.2, mu=0.2)
    builder.configure_soft_contact(particle_ke=5e4, particle_mu=0.4,
                                   friction_use_lagged_body_contact_force_norm=True)
    # small scenes need a conv_tol below the reference default: Newton's
    # convergence check runs BEFORE applying the first increment
    # (optimization.py:86-88), and a light cube's first |dx.g| can sit
    # under 1e-4
    model = builder.finalize(timestep=args.dt, max_newton_steps=5,
                             max_ls_steps=10, conv_tol=1e-9)
    model.simplicits_scene.force_dict["pt_wise"][
        "newton_soft_collisions"]["coeff"] = 1.0
    solver = SimplicitsSolver(model)
    state = model.state()

    timelapse = Timelapse(args.out)
    for i in range(args.steps):
        state = solver.step(state)
        if i % 10 == 0:
            q = np.asarray(state.particle_q)
            lo = float(jnp.min(state.particle_q[:, 1]))
            vmax = float(jnp.max(jnp.linalg.norm(state.particle_qd, axis=-1)))
            print(f"step {i:4d}  min_y={lo:+.3f}  max|v|={vmax:.3f}")
            timelapse.add_pointcloud_batch(
                iteration=i, pointcloud_list=[q], category="soft_cube")
    print(f"wrote Timelapse USD to {args.out}")


if __name__ == "__main__":
    main()
