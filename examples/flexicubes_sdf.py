"""FlexiCubes SDF shape optimization (BASELINE config 4).

Optimize a scalar field so the differentiably-extracted mesh matches a target
sphere. Sign topology is refreshed host-side between jitted gradient steps —
the TPU split of the reference's optimization loop.

Run: python examples/flexicubes_sdf.py
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from kaolin_tpu.ops.conversions import FlexiCubes

RES = 12
TARGET_R = 0.35


def main():
    fc = FlexiCubes()
    grid_verts, cube_idx = fc.construct_voxel_grid(RES)
    scale = jnp.asarray([1.6, 0.7, 1.0])  # start from an ellipsoid
    sdf = jnp.linalg.norm(jnp.asarray(grid_verts) * scale, axis=-1) - TARGET_R

    def loss_fn(sdf, topology):
        verts, faces, reg = fc(jnp.asarray(grid_verts), sdf, cube_idx, RES,
                               topology=topology, training=True)[:3]
        d = jnp.abs(jnp.linalg.norm(verts, axis=-1) - TARGET_R)
        return jnp.mean(d) + 0.01 * jnp.mean(reg)

    opt = optax.adam(2e-2)
    state = opt.init(sdf)
    for it in range(25):
        topology = fc.precompute_topology(np.asarray(sdf), cube_idx, RES)
        val, g = jax.value_and_grad(loss_fn)(sdf, topology)
        updates, state = opt.update(g, state)
        sdf = optax.apply_updates(sdf, updates)
        if it % 5 == 0:
            print(f"iter {it:3d}: surface loss {float(val):.4f}")

    topology = fc.precompute_topology(np.asarray(sdf), cube_idx, RES)
    verts = fc(jnp.asarray(grid_verts), sdf, cube_idx, RES,
               topology=topology)[0]
    r = np.linalg.norm(np.asarray(verts), axis=-1)
    print(f"final: {verts.shape[0]} verts, median radius {np.median(r):.3f} "
          f"(target {TARGET_R})")


if __name__ == "__main__":
    main()
