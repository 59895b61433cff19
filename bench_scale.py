"""Scale sweep + utilization accounting (VERDICT r2 #3).

Measures the north-star workloads across sizes and reports achieved-FLOP /
bandwidth utilization next to wall clock. Writes a markdown table to stdout
(BASELINE.md is updated from it) plus one JSON line per config.

Run on the real TPU: python bench_scale.py [--quick]
"""

import argparse
import json
import time

import numpy as np

# v5-lite (v5e) single-chip peaks for utilization accounting
V5E_PEAK_F32_TFLOPS = 98.0    # bf16 197 TF/s, f32 ~98 via MXU passes
V5E_HBM_GBPS = 819.0


def _time_best(fn, sync, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        n = fn()
        sync()
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def sweep_dibr(configs=((512, 40, 64), (1024, 40, 64), (1024, 90, 112),
                        (1024, 140, 180))):
    """DIB-R fwd+bwd across resolution / face count. Returns rows of
    (res, faces, ms/iter, est GFLOP, util%)."""
    import jax
    import jax.numpy as jnp
    from bench import _uv_sphere
    from kaolin_tpu.render.mesh import suggest_tile_cap
    from kaolin_tpu.render.mesh.dibr import dibr_rasterization

    rows = []
    for res, n_lat, n_lon in configs:
        v, f = _uv_sphere(n_lat, n_lon)
        num_faces = f.shape[0]
        cam = v + np.array([0, 0, -3.0], np.float32)
        z = cam[:, 2]
        img_xy = cam[:, :2] / (-z[:, None]) * 2.0
        fv_z = jnp.asarray(z[f])[None]
        fv_img = jnp.asarray(img_xy[f])[None]
        feat = jnp.asarray(np.random.RandomState(0)
                           .rand(1, num_faces, 3, 3).astype(np.float32))
        nz = jnp.ones((1, num_faces), jnp.float32)
        tile_cap = suggest_tile_cap(fv_img, res, res)

        @jax.jit
        def step(fvi, feats):
            def loss(fvi, feats):
                img, sm, _ = dibr_rasterization(res, res, fv_z, fvi, feats,
                                                nz, tile_cap=tile_cap)
                return jnp.sum(img ** 2) + jnp.sum(sm ** 2)
            return jax.value_and_grad(loss, argnums=(0, 1))(fvi, feats)

        out = step(fv_img, feat)
        jax.block_until_ready(out)
        holder = {}

        def run():
            for _ in range(10):
                holder["o"] = step(fv_img, feat)
            return 10

        sec = _time_best(run, lambda: jax.block_until_ready(holder["o"]))
        # arithmetic floor: every Pallas chunk pass touches all faces per
        # occupied tile; fwd+bwd soft mask ~ 2 x (pixels x faces x ~40 ops)
        # upper-bounded by the all-pairs model the A100 bar uses
        gflop = res * res * num_faces * 8 * 4 / 1e9
        util = gflop / 1e3 / (sec * V5E_PEAK_F32_TFLOPS) * 100
        rows.append((res, num_faces, sec * 1e3, gflop, util))
    return rows


def sweep_simplicits(configs=((1000, 33, 1), (4096, 33, 1), (10240, 64, 4))):
    """Simplicits steps/s across qp / handles / objects (scan rollout)."""
    import jax
    import jax.numpy as jnp
    from bench import _synthetic_skinned_points
    from kaolin_tpu.physics.simplicits import SimplicitsScene

    rows = []
    for num_qp, handles, n_obj in configs:
        rng = np.random.RandomState(0)
        scene = SimplicitsScene(timestep=0.01, max_newton_steps=5,
                                max_ls_steps=20, direct_solve=True)
        per = num_qp // n_obj
        for i in range(n_obj):
            c = np.array([0.0, 0.0, 0.0], np.float32)
            if n_obj > 1:
                ang = 2 * np.pi * i / n_obj
                c = np.array([0.8 * np.cos(ang), 0.0, 0.8 * np.sin(ang)],
                             np.float32)
            pts = (c + rng.uniform(-0.5, 0.5, (per, 3))).astype(np.float32)
            scene.add_object(_synthetic_skinned_points(rng, pts, handles))
        scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
        scene.set_scene_floor(floor_height=-1.0, floor_penalty=10000.0)

        scene.run_sim_step()
        jax.block_until_ready(scene.sim_z)

        def run():
            scene.run_sim_steps(20)
            return 20

        sec = _time_best(run, lambda: jax.block_until_ready(scene.sim_z))
        d = scene.total_dofs
        n = scene.total_qp
        # dominant traffic: B (3N x D) + dFdz (9N x D) matvecs per E/G/H
        # eval, ~(5 newton x ~8 evals); bytes = 4 x (12 N D)
        bytes_per_step = 40 * 4 * 12 * n * d
        bw = bytes_per_step / sec / 1e9
        rows.append((n, handles, n_obj, sec * 1e3, 1.0 / sec, bw,
                     bw / V5E_HBM_GBPS * 100))
    return rows


def sweep_raytrace(configs=((256, 8), (512, 9), (1024, 9))):
    import jax
    from bench import bench_raytrace

    rows = []
    for res, level in configs:
        fps = bench_raytrace(level=level, res=res, num_frames=10)
        if isinstance(fps, tuple):      # (rate, meta) since round 5
            fps = fps[0]
        rows.append((res, level, 1000.0 / fps, fps))
    return rows


def sweep_collision(configs=(2048, 10_000, 50_000)):
    """Grid-broad-phase contact detection across particle counts, at
    physical packing density (box sized so spacing ~ particle radius).
    Returns (N, cells, K, K2, pairs, detect ms)."""
    import jax
    import jax.numpy as jnp
    from bench import _sync
    from kaolin_tpu.physics.common.collisions import Collision

    rows = []
    radius = 0.05
    for n in configs:
        rng = np.random.RandomState(0)
        side = (n * (2 * radius) ** 3 * 10) ** (1 / 3)  # ~10 cells/particle
        x0 = jnp.asarray(rng.uniform(0, side, (n, 3)), jnp.float32)
        obj_ids = jnp.asarray(np.arange(n) % 4, jnp.int32)
        dx = jnp.zeros_like(x0)
        col = Collision(dt=0.01, collision_particle_radius=radius,
                        broad_phase="grid", max_contacting_pairs=8 * n)
        col.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids),
                           margin=0.1)
        detect = jax.jit(col.detect_collisions)
        c = detect(dx, x0, obj_ids)
        _sync(c.valid)

        def run():
            _sync(detect(dx, x0, obj_ids).valid)
            return 1

        sec = _time_best(run, lambda: None)
        pairs = int(np.sum(np.asarray(c.valid)))
        gx, gy, gz = col.grid_dims
        rows.append((n, gx * gy * gz, col.cell_capacity,
                     col.slot_contact_capacity, pairs, sec * 1e3))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    dibr = sweep_dibr(((512, 40, 64), (1024, 40, 64))) if args.quick \
        else sweep_dibr()
    print("\n## DIB-R scale sweep (fwd+bwd)")
    print("| res | faces | ms/iter | est GFLOP | util% of f32 peak |")
    print("|---|---|---|---|---|")
    for r in dibr:
        print(f"| {r[0]} | {r[1]} | {r[2]:.1f} | {r[3]:.1f} | {r[4]:.1f} |")
    print(json.dumps({"dibr_sweep": [list(r) for r in dibr]}))

    sim = sweep_simplicits(((1000, 33, 1),)) if args.quick \
        else sweep_simplicits()
    print("\n## Simplicits scale sweep (scan rollout)")
    print("| qp | handles | objects | ms/step | steps/s | GB/s | % HBM |")
    print("|---|---|---|---|---|---|---|")
    for r in sim:
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]:.2f} | {r[4]:.0f} "
              f"| {r[5]:.0f} | {r[6]:.0f} |")
    print(json.dumps({"simplicits_sweep": [list(r) for r in sim]}))

    rt = sweep_raytrace(((256, 8),)) if args.quick else sweep_raytrace()
    print("\n## SPC raytrace scale sweep")
    print("| res | level | ms/frame | fps |")
    print("|---|---|---|---|")
    for r in rt:
        print(f"| {r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.0f} |")
    print(json.dumps({"raytrace_sweep": [list(r) for r in rt]}))

    co = sweep_collision((2048, 10_000)) if args.quick else sweep_collision()
    print("\n## Contact detection scale sweep (grid broad phase)")
    print("| N | cells | K | K2 | pairs | detect ms |")
    print("|---|---|---|---|---|---|")
    for r in co:
        print(f"| {r[0]} | {r[1]} | {r[2]} | {r[3]} | {r[4]} | {r[5]:.2f} |")
    print(json.dumps({"collision_sweep": [list(r) for r in co]}))


if __name__ == "__main__":
    main()
