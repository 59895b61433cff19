"""Benchmark driver: Simplicits sim steps/sec on the available accelerator.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Config mirrors the reference's physics benchmark defaults
(``tests/benchmarks/README.md``: ~1000 samples/object in a unit box, dt=0.01,
5 Newton steps, 20 line-search steps, direct solve) on the cube-drop scene of
the FEM regression test. The reference repo publishes no numbers
(BASELINE.md); ``vs_baseline`` is measured against A100_SIM_STEPS_PER_SEC
below — a provisional estimate to be replaced by a measured A100 run.
"""

import json
import time

import numpy as np

A100_SIM_STEPS_PER_SEC = 30.0  # provisional; no published reference numbers


def bench_simplicits(num_qp=1000, num_handles=33, num_steps=50, dt=0.01):
    import jax
    import jax.numpy as jnp

    from kaolin_tpu.physics.simplicits import SimplicitsScene, SkinnedPhysicsPoints

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (num_qp, 3)).astype(np.float32)

    # smooth synthetic skinning field standing in for a trained MLP
    # (same operator shapes/FLOPs as the trained path)
    freqs = rng.randn(3, num_handles - 1).astype(np.float32)
    phases = rng.rand(num_handles - 1).astype(np.float32)

    def weight_fn(x):
        return jnp.sin(x @ jnp.asarray(freqs) + jnp.asarray(phases))

    w = np.asarray(jnp.concatenate(
        [weight_fn(jnp.asarray(pts)), jnp.ones((num_qp, 1))], axis=1))
    eps = 1e-3
    dwdx = np.zeros((num_qp, num_handles, 3), dtype=np.float32)
    for a in range(3):
        pp = pts.copy(); pp[:, a] += eps
        pm = pts.copy(); pm[:, a] -= eps
        wp_ = np.asarray(weight_fn(jnp.asarray(pp)))
        wm_ = np.asarray(weight_fn(jnp.asarray(pm)))
        dwdx[:, :-1, a] = (wp_ - wm_) / (2 * eps)

    baked = SkinnedPhysicsPoints(pts=pts, yms=1e4, prs=0.45, rhos=500.0,
                                 appx_vol=1.0, skinning_weights=w, dwdx=dwdx)
    scene = SimplicitsScene(timestep=dt, max_newton_steps=5, max_ls_steps=20,
                            direct_solve=True)
    scene.add_object(baked)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-1.0, floor_axis=1,
                          floor_penalty=10000.0)

    scene.run_sim_step()  # compile
    jax.block_until_ready(scene.sim_z)

    t0 = time.perf_counter()
    for _ in range(num_steps):
        scene.run_sim_step()
    jax.block_until_ready(scene.sim_z)
    elapsed = time.perf_counter() - t0
    return num_steps / elapsed


def main():
    steps_per_sec = bench_simplicits()
    print(json.dumps({
        "metric": "simplicits_sim_steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / A100_SIM_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
