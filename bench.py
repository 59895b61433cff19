"""Benchmark driver: the BASELINE.json north-star metrics on the available
accelerator.

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "components": {...}}``

Six components covering all five BASELINE.json configs plus the
collision-at-scale scene (VERDICT r2 #1/#2). Bars are ABSOLUTE A100 targets
derived from the reference kernels' arithmetic (launch counts, memory
traffic, host syncs) — full derivations in BASELINE.md §"A100 comparator":

  1. Simplicits sim steps/s            (config 1)   bar 150 steps/s
  2. DIB-R fwd+bwd fps @512²           (config 2)   bar 40 fps
  3. SPC raytrace fps @512², level 9   (config 3)   bar 2000 fps
  4. FlexiCubes SDF-opt iters/s res 64 (config 4)   bar 300 iters/s
  5. Simulatable-3DGS scene steps/s    (config 5)   bar 120 steps/s
  6. Collision scene N≥10k steps/s     (VERDICT #1)  bar 100 steps/s

``vs_baseline`` is the geometric mean of the six ratios; > 1 means "beats
the A100 reference estimate on one v5-lite chip" (v5p, the stated target
hardware, is faster per chip — treated as an UNMEASURED estimate, see
BASELINE.md).

Robustness (VERDICT r3 #3 — the round-3 driver run timed out with NO
record): the run is governed by a GLOBAL wall deadline enforced by a
watchdog thread (which prints the aggregate JSON and exits even if the main
thread is blocked inside a tunnel RPC — first device contact alone has
measured 140-400+ s on a degraded tunnel), the running aggregate is flushed
to ``BENCH_partial.json`` + echoed as a JSON line on stderr after every
component (so even a SIGKILL'd run leaves a complete record in the driver's
output tail), the JAX persistent compilation cache is enabled (first run
pays the compiles, reruns skip them), and autosized capacities persist to
``bench_capacities.json`` so reruns skip the grow-recompile doublings.
Compile seconds and steady-state rate are reported separately per component.

CLI: ``python bench.py [--component NAME] [--smoke]`` — ``--smoke`` shrinks
every config for a fast CPU correctness pass (numbers meaningless).
``BENCH_DEADLINE_S`` overrides the global wall budget (default 1100 s).
"""

import functools
import argparse
import json
import os
import re
import sys
import threading
import time

import numpy as np

_ANSI_RE = re.compile(r"\x1b\[[0-9;]*[a-zA-Z]")

# failures score BELOW any measurable rate (the slowest rate any component
# has ever measured is raytrace's 0.56 fps / 2000 bar = 2.8e-4; a 1e-3
# floor would reward crashing over running slowly — ADVICE r4)
_FAIL_RATIO = 1e-5


def _clean_error(exc_text):
    """First line of the exception, ANSI escapes stripped (tunnel errors
    embed colored axon log lines — noise in a tracked artifact)."""
    text = _ANSI_RE.sub("", str(exc_text)).strip()
    return text.splitlines()[0][:300] if text else "unknown error"


def _transient(exc):
    """Errors worth one re-jit + retry: the axon remote-compile helper
    returns HTTP 5xx on transient infra failures (BENCH_partial r4 showed
    the same 500 hitting different components on different runs)."""
    s = str(exc)
    return ("remote_compile" in s or "HTTP 50" in s
            or "DEADLINE_EXCEEDED" in s or "UNAVAILABLE" in s)

BARS = {
    "simplicits": 150.0,   # steps/s
    "dibr": 40.0,          # fps
    "raytrace": 2000.0,    # fps
    "flexicubes": 300.0,   # iters/s
    "gaussians_sim": 120.0,  # steps/s
    "collision_10k": 100.0,  # steps/s
}

# fastest-to-measure first: a timeout then starves only the slowest
ORDER = ["dibr", "flexicubes", "raytrace", "simplicits", "gaussians_sim",
         "collision_10k"]

_REPO = os.path.dirname(os.path.abspath(__file__))
_SIDECAR = os.path.join(_REPO, "bench_capacities.json")
_PARTIAL = os.path.join(_REPO, "BENCH_partial.json")


def _enable_compile_cache():
    """Persistent XLA compilation cache: reruns (and the driver's run after
    a builder run) skip the 100-300 s compiles that killed round 3."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(_REPO, ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


def _sidecar_get(key, default=None):
    try:
        with open(_SIDECAR) as f:
            return json.load(f).get(key, default)
    except Exception:
        return default


def _sidecar_set(key, value):
    data = {}
    try:
        with open(_SIDECAR) as f:
            data = json.load(f)
    except Exception:
        pass
    data[key] = value
    try:
        with open(_SIDECAR, "w") as f:
            json.dump(data, f, indent=1, sort_keys=True)
    except Exception:
        pass


def _sync(x):
    """Force completion of everything ``x`` depends on.

    ``jax.block_until_ready`` does NOT block on the axon tunnel platform, so
    a fast program's dispatches can all fit in the device queue and a timed
    loop measures dispatch only. A 4-byte scalar readback is a true fence:
    the host transfer cannot start until the dependent program finishes.
    """
    import jax
    import jax.numpy as jnp
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(jnp.ravel(leaf)[0])


def _best_of(k, fn, sync):
    """Best rate over k timed repetitions (axon tunnel RPC jitter)."""
    best = 0.0
    for _ in range(k):
        t0 = time.perf_counter()
        n = fn()
        sync()
        best = max(best, n / (time.perf_counter() - t0))
    return best


# ---------------------------------------------------------------------------
# 1. Simplicits (config 1)
# ---------------------------------------------------------------------------

def _synthetic_skinned_points(rng, pts, num_handles, yms=1e4, rhos=500.0,
                              appx_vol=1.0):
    """Baked physics points with a smooth synthetic skinning field standing
    in for a trained MLP (same operator shapes/FLOPs as the trained path)."""
    import jax.numpy as jnp
    from kaolin_tpu.physics.simplicits import SkinnedPhysicsPoints

    num_qp = pts.shape[0]
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
    return SkinnedPhysicsPoints(pts=pts, yms=yms, prs=0.45, rhos=rhos,
                                appx_vol=appx_vol, skinning_weights=w,
                                dwdx=dwdx)


def bench_simplicits(num_qp=1000, num_handles=33, num_steps=150, dt=0.01):
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.physics.simplicits import SimplicitsScene

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (num_qp, 3)).astype(np.float32)
    baked = _synthetic_skinned_points(rng, pts, num_handles)
    scene = SimplicitsScene(timestep=dt, max_newton_steps=5, max_ls_steps=10,
                            direct_solve=True)
    scene.add_object(baked)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-1.0, floor_axis=1,
                          floor_penalty=10000.0)

    scene.run_sim_step()  # compile
    _sync(scene.sim_z)

    def run():
        # ONE lax.scan dispatch per window (the framework's rollout path;
        # per-step dispatch through the axon tunnel costs 1-7 ms against a
        # ~2.5 ms device step)
        scene.run_sim_steps(num_steps)
        return num_steps

    run()  # compile the rollout
    _sync(scene.sim_z)
    return _best_of(2, run, lambda: _sync(scene.sim_z))


# ---------------------------------------------------------------------------
# 2. DIB-R (config 2)
# ---------------------------------------------------------------------------

def _uv_sphere(n_lat=40, n_lon=64):
    lat = np.linspace(0.1, np.pi - 0.1, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    th, ph = np.meshgrid(lat, lon, indexing="ij")
    v = np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                  np.sin(th) * np.sin(ph)], -1).reshape(-1, 3)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return v.astype(np.float32), np.asarray(faces, np.int32)


def bench_dibr(height=512, width=512, num_iters=20, n_lat=40, n_lon=64):
    """One pose+texture optimization iteration: dibr_rasterization fwd+bwd."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.render.mesh.dibr import dibr_rasterization

    v, f = _uv_sphere(n_lat, n_lon)
    num_faces = f.shape[0]
    cam = v + np.array([0, 0, -3.0], np.float32)
    z = cam[:, 2]
    img_xy = cam[:, :2] / (-z[:, None]) * 2.0

    fv_z = jnp.asarray(z[f])[None]
    fv_img = jnp.asarray(img_xy[f])[None]
    feat = jnp.asarray(
        np.random.RandomState(0).rand(1, num_faces, 3, 3).astype(np.float32))
    nz = jnp.ones((1, num_faces), jnp.float32)

    from kaolin_tpu.render.mesh import suggest_tile_cap
    tile_cap = suggest_tile_cap(fv_img, height, width)

    @jax.jit
    def step(fvi, feats):
        def loss(fvi, feats):
            img, sm, _ = dibr_rasterization(height, width, fv_z, fvi, feats,
                                            nz, tile_cap=tile_cap)
            return jnp.sum(img ** 2) + jnp.sum(sm ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(fvi, feats)

    out = step(fv_img, feat)
    _sync(out[0])
    holder = {}

    @functools.partial(jax.jit, static_argnames="n")
    def rollout(fvi, feats, n):
        # a REAL optimization rollout (gradient-descent updates thread the
        # params through the scan, so no iteration can be hoisted): one
        # dispatch per window instead of 1-7 ms of axon tunnel per iter
        def body(carry, _):
            fvi, feats = carry
            val, (g_fvi, g_feat) = step(fvi, feats)
            return (fvi - 1e-6 * g_fvi, feats - 1e-6 * g_feat), val
        carry, vals = jax.lax.scan(body, (fvi, feats), None, length=n)
        return carry, vals

    (fvi1, feat1), vals = rollout(fv_img, feat, num_iters)  # compile
    _sync(vals)
    box = {"fvi": fv_img, "feat": feat}

    def run():
        (box["fvi"], box["feat"]), holder["out"] = rollout(
            box["fvi"], box["feat"], num_iters)
        return num_iters

    return _best_of(2, run, lambda: _sync(holder["out"]))


# ---------------------------------------------------------------------------
# 3. SPC raytrace (config 3)
# ---------------------------------------------------------------------------

def bench_raytrace(level=9, res=512, num_frames=60):
    """nglod-style depth render: pinhole camera vs a sphere-shell SPC at
    ``level``; one jitted program per frame = bin units → Pallas tile
    rasterizer → first-hit depth image (``render.spc.raster``; parity with
    the BFS traversal is exact — tests/render/test_spc_raster.py)."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.ops.spc import scan_octrees, unbatched_points_to_octree
    from kaolin_tpu.ops.spc.spc import generate_points
    from kaolin_tpu.render.camera import Camera
    from kaolin_tpu.render.spc.raster import (build_raster_spc,
                                              raster_first_hit,
                                              raster_first_hit_sequence)

    # dense unit-sphere shell voxelized at 2^level (analytic; build cost is
    # one-time setup and excluded, like the reference bench would exclude
    # octree construction from render fps)
    rng = np.random.RandomState(0)
    grid = 2 ** level
    d = rng.randn(400_000, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    # two radii so shells are watertight at level-9 resolution
    pts = np.concatenate([d * 0.62, d * 0.618])
    q = np.unique(np.clip(((pts + 1) * 0.5 * grid).astype(np.int64), 0,
                          grid - 1), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(q.astype(np.int16)), level)
    lengths = np.array([len(octree)], dtype=np.int32)
    _, pyramids, exsum = scan_octrees(octree, lengths)
    ph = generate_points(octree, pyramids, exsum)
    pyramid = np.asarray(pyramids)[0]

    camera = Camera.from_args(eye=jnp.asarray([1.6, 1.1, 1.6]),
                              at=jnp.zeros(3), up=jnp.asarray([0., 1., 0.]),
                              fov=0.8, width=res, height=res)
    rspc = build_raster_spc(ph, pyramid, level)

    # binning capacities: validate once by growing on overflow, persist to
    # the sidecar so reruns skip the doubling recompiles (overflow is still
    # checked every frame — a stale entry only costs one grow). v3 key:
    # iota-built tile-packed rays + sequence-path measurement.
    key = f"raster_caps_v5_l{level}_r{res}"
    tile_px, s_max, c_cap = _sidecar_get(key, [16, 16, 64])

    def render(tpx, sm, cc):
        t, nidx, valid, ov = raster_first_hit(rspc, camera, tile_px=tpx,
                                              s_max=sm, c_cap=cc)
        return t.reshape(res, res), ov

    try:
        while True:
            out, ov = render(tile_px, s_max, c_cap)
            slot_ov = int(np.asarray(ov["slot_overflow"]))
            cap_ov = int(np.asarray(ov["cap_overflow"]))
            if slot_ov == 0 and cap_ov == 0:
                break
            if slot_ov:
                s_max *= 4
            if cap_ov:
                c_cap *= 2
        _sidecar_set(key, [tile_px, s_max, c_cap])
        _sync(out)
        holder = {}
        cams = [camera] * num_frames

        def run():
            # ONE lax.scan dispatch for the whole frame window: the
            # framework's trajectory-rendering path, and robust to the
            # axon tunnel's per-dispatch latency (which varies 1-7 ms)
            holder["out"] = raster_first_hit_sequence(
                rspc, cams, tile_px=tile_px, s_max=s_max, c_cap=c_cap)[0]
            return num_frames

        fps = _best_of(2, run, lambda: _sync(holder["out"]))
        return fps, {"path": "raster-sequence"}
    except Exception as e:
        # fallback chain (VERDICT r4 #1): the component must never score 0
        # because the Pallas kernel failed to compile — fall back to the
        # XLA BFS traversal (slower, but correct and measurable)
        import traceback
        traceback.print_exc()
        print(f"[bench] raytrace: raster path failed "
              f"({_clean_error(e)}); falling back to BFS traversal",
              file=sys.stderr, flush=True)
        from kaolin_tpu.render.camera.raygen import generate_rays
        from kaolin_tpu.render.spc.raytrace import (unbatched_raytrace,
                                                    mark_first_hit)

        origin, direction = generate_rays(camera)

        def render_trav():
            ridx, pidx, depth = unbatched_raytrace(
                octree, ph, pyramids[0], exsum, origin, direction, level)
            first = mark_first_hit(ridx)
            img = jnp.full((res * res,), jnp.inf).at[
                jnp.where(first, ridx, res * res)].min(
                jnp.where(first, depth[:, 0], jnp.inf), mode="drop")
            return img

        out = render_trav()
        _sync(out)
        holder = {}
        frames = max(2, num_frames // 4)

        def run():
            for _ in range(frames):
                holder["out"] = render_trav()
            return frames

        fps = _best_of(2, run, lambda: _sync(holder["out"]))
        return fps, {"path": "traversal_fallback",
                     "raster_error": _clean_error(e)}


# ---------------------------------------------------------------------------
# 4. FlexiCubes SDF optimization (config 4)
# ---------------------------------------------------------------------------

def bench_flexicubes(res=64, num_iters=50):
    """Differentiable SDF→mesh shape-optimization inner loop at the
    reference tutorial resolution. Uses the dense lattice path
    (``dense_extract``): every stage is a shifted-slice stencil or one-hot
    table matmul over the dense cube grid — zero data-dependent gathers, so
    topology + geometry + grad + Adam update compile to ONE gather-free XLA
    program per iteration."""
    import jax
    import jax.numpy as jnp
    import optax
    from kaolin_tpu.ops.conversions import FlexiCubes, dense_extract

    fc = FlexiCubes()
    grid_verts, _ = fc.construct_voxel_grid(res)
    grid_verts = jnp.asarray(grid_verts)
    scale = jnp.asarray([1.6, 0.7, 1.0])
    sdf0 = jnp.linalg.norm(grid_verts * scale, axis=-1) - 0.35

    def loss_fn(sdf):
        # channels-first dense views: the (N, 3) vertex rows pad their
        # 3-wide minor to 128 lanes on TPU, which alone doubled the
        # iteration (12.8 -> 6.5 ms measured on v5-lite); the dense
        # (4, 3, R, R, R) view is the documented fast path for
        # SDF-optimization losses (dense.py module docstring)
        verts, faces, reg, aux = dense_extract(sdf, res, training=True)
        vd = aux["vd_dense"]
        vm = aux["vd_valid_dense"]
        d = jnp.abs(jnp.sqrt(jnp.sum(vd * vd, axis=1)) - 0.35) * vm
        nv = jnp.clip(jnp.sum(vm), 1, None)
        return jnp.sum(d) / nv + 0.01 * jnp.sum(reg) / nv

    opt = optax.adam(2e-2)

    @jax.jit
    def one_iter(sdf, state):
        val, g = jax.value_and_grad(loss_fn)(sdf)
        updates, state = opt.update(g, state)
        return optax.apply_updates(sdf, updates), state

    @functools.partial(jax.jit, static_argnames="n")
    def rollout(sdf, state, n):
        # the whole optimization window as ONE lax.scan dispatch — the
        # standard shape of an on-device SDF-optimization loop, and robust
        # to the axon tunnel's per-dispatch latency (1-7 ms, which at
        # ~3 ms/iter device time would halve the measured rate)
        def body(carry, _):
            sdf, state = carry
            val, g = jax.value_and_grad(loss_fn)(sdf)
            updates, state = opt.update(g, state)
            return (optax.apply_updates(sdf, updates), state), None
        carry, _ = jax.lax.scan(body, (sdf, state), None, length=n)
        return carry

    sdf, state = one_iter(sdf0, opt.init(sdf0))  # compile single-step
    sdf, state = rollout(sdf, state, num_iters)  # compile rollout
    _sync(sdf)
    box = {"sdf": sdf, "state": state}

    def run():
        box["sdf"], box["state"] = rollout(box["sdf"], box["state"],
                                           num_iters)
        return num_iters

    return _best_of(2, run, lambda: _sync(box["sdf"]))


# ---------------------------------------------------------------------------
# 5. Simulatable 3DGS scene (config 5)
# ---------------------------------------------------------------------------

def bench_gaussians_sim(num_gaussians=2000, num_qp=2048, num_handles=16,
                        num_steps=100):
    """simulatable_3dgrut workload: gaussian shell → volumetric densifier →
    Simplicits body with grid collisions (auto default at this qp count) +
    floor → sim steps, LBS-moving the renderable gaussians each step."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.ops.gaussians import sample_points_in_volume
    from kaolin_tpu.physics.simplicits import (PhysicsPoints,
                                               SimplicitsObject,
                                               SimplicitsScene)

    rng = np.random.RandomState(0)
    d = rng.randn(num_gaussians, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xyz = (0.4 * d + np.array([0.0, 0.6, 0.0])).astype(np.float32)
    scales = np.full((num_gaussians, 3), 0.05, np.float32)
    rots = np.tile(np.array([1.0, 0, 0, 0], np.float32), (num_gaussians, 1))
    opac = np.full((num_gaussians,), 0.9, np.float32)

    vol_pts = sample_points_in_volume(xyz, scales, rots, opac,
                                      octree_level=6, num_samples=num_qp,
                                      method="floodfill")
    phys = PhysicsPoints(pts=vol_pts, yms=2e5, prs=0.45, rhos=500.0,
                         appx_vol=4 / 3 * np.pi * 0.4 ** 3)
    freqs = jnp.asarray(rng.randn(3, num_handles - 1).astype(np.float32))
    obj = SimplicitsObject.create_from_function(
        phys, lambda x: jnp.sin(x @ freqs))

    scene = SimplicitsScene(timestep=0.03, max_newton_steps=5,
                            max_ls_steps=10, direct_solve=True)
    obj_idx = scene.add_object(obj, num_qp=num_qp,
                               renderable_pts=jnp.asarray(xyz))
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=0.0, floor_penalty=1000.0)
    scene.enable_collisions()  # auto → grid at this scale

    scene.run_sim_step()
    moved = scene.get_object_deformed_pts(obj_idx, points="rendered")
    _sync(moved)
    holder = {}

    # faithful rollout: the WHOLE window is one lax.scan dispatch and the
    # renderable gaussians are LBS-moved EVERY step (scan ys), exactly the
    # per-step workload of the dispatch loop without the 1-7 ms/step axon
    # tunnel cost; the collision-overflow bitmask is OR-accumulated across
    # the window and checked after timing so capacity drops cannot pass
    # silently
    step_fn, consts = scene.build_functional_step(with_diag=True)
    deformed = scene._deformed_fns[(obj_idx, "rendered")]

    @functools.partial(jax.jit, static_argnames="n")
    def rollout(cs, z, zp, zd, ovf, n):
        def body(carry, _):
            z1, zp1, zd1, flags = step_fn(cs, *carry[:3])
            return (z1, zp1, zd1, carry[3] | flags), deformed(z1)
        carry, moved_all = jax.lax.scan(body, (z, zp, zd, ovf), None,
                                        length=n)
        return carry, moved_all

    state = [scene.sim_z, scene.sim_z_prev, scene.sim_z_dot, jnp.int32(0)]
    _, m = rollout(consts, *state, n=num_steps)  # compile
    _sync(m)

    def run():
        new_state, holder["m"] = rollout(consts, *state, n=num_steps)
        state[:] = new_state
        return num_steps

    rate = _best_of(2, run, lambda: _sync(holder["m"]))
    flags = int(np.asarray(state[3]))
    if flags:
        raise RuntimeError(
            f"collision capacity overflow during gaussians_sim window "
            f"(flags={flags:#x})")
    return rate


# ---------------------------------------------------------------------------
# 6. Collision scene at N >= 10k (VERDICT r2 #1)
# ---------------------------------------------------------------------------

def bench_collision_10k(num_objects=6, qp_per_object=1700, num_handles=6,
                        kinematic_qp=512, num_steps=20, dt=0.02):
    """Multi-object contact at scale: ``num_objects`` soft cubes clustered
    above a kinematic plate, grid broad phase (the auto default at this
    particle count), floor + gravity. N = objects*qp + plate >= 10k contact
    particles, with real inter-object contacts every step."""
    import jax
    import jax.numpy as jnp
    from kaolin_tpu.physics.simplicits import (SimplicitsScene,
                                               SkinnedPhysicsPoints)

    rng = np.random.RandomState(0)
    scene = SimplicitsScene(timestep=dt, max_newton_steps=5, max_ls_steps=10,
                            direct_solve=True)
    # cluster of touching soft cubes (side 0.5) in two stacked rings
    for i in range(num_objects):
        ang = 2 * np.pi * (i % 3) / 3
        center = np.array([0.33 * np.cos(ang), 0.1 + 0.45 * (i // 3),
                           0.33 * np.sin(ang)], np.float32)
        pts = (center + rng.uniform(-0.25, 0.25, (qp_per_object, 3))
               ).astype(np.float32)
        baked = _synthetic_skinned_points(rng, pts, num_handles,
                                          appx_vol=0.125)
        scene.add_object(baked)

    # kinematic plate below
    side = int(np.ceil(np.sqrt(kinematic_qp)))
    gx, gz = np.meshgrid(np.linspace(-0.8, 0.8, side),
                         np.linspace(-0.8, 0.8, side))
    kpts = np.stack([gx.ravel(), np.full(side * side, -0.55), gz.ravel()],
                    axis=1)[:kinematic_qp].astype(np.float32)
    kin = SkinnedPhysicsPoints(
        pts=kpts, yms=1e5, prs=0.45, rhos=1000.0, appx_vol=0.2,
        skinning_weights=np.ones((kinematic_qp, 1), np.float32),
        dwdx=np.zeros((kinematic_qp, 1, 3), np.float32))
    scene.add_object(kin, is_kinematic=True, apply_qr=False,
                     normalize_weights_by_samples=False)

    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-0.6, floor_penalty=10000.0)
    # contact capacity sized to the scene's measured steady state (~14-21k
    # pairs) + headroom: every per-contact term in the Newton loop (energy,
    # gradient, reduced-hessian matmuls, bounds) and the detection row
    # fetch scale with CAPACITY, not real contacts; auto-resize re-jits if
    # the stack ever exceeds it
    scene.enable_collisions(collision_particle_radius=0.03,
                            max_contact_pairs=28000)

    col = scene.force_dict["collision"]["object"]
    if scene.total_qp >= scene.GRID_BROAD_PHASE_THRESHOLD:
        assert col.broad_phase == "grid", \
            "auto default must pick grid at N>=10k"

    def run():
        # the scan rollout is the framework's throughput path (ONE
        # dispatch for the whole window, semantically identical to
        # num_steps run_sim_step calls — simulation.py:897); per-step
        # dispatch through the axon tunnel costs ~5 ms/step, which at
        # the target 100 steps/s would be half the budget
        scene.run_sim_steps(num_steps)
        return num_steps

    # capacities may auto-resize (re-jit) while the stack settles; re-measure
    # after any resize so the recorded rate is the steady state of a grid
    # that drops NOTHING (VERDICT r3 #2a: overflow = failed run)
    rate = 0.0
    for _attempt in range(3):
        scene.run_sim_step()
        scene.check_collision_capacity()
        _sync(scene.sim_z)
        before = scene.collision_resizes
        rate = _best_of(2, run, lambda: _sync(scene.sim_z))
        scene.check_collision_capacity()
        if scene.collision_resizes == before:
            break
    diag = scene.collision_diagnostics()
    overflow = bool(diag.get("cell_overflow", False)) \
        or bool(diag.get("slot_overflow", False)) \
        or bool(diag.get("pp_overflow", False)) \
        or bool(diag["contacts_overflow"])
    rate_meta = {"num_particles": int(scene.total_qp),
                 "num_pairs": int(diag["num_pairs"]),
                 "cell_overflow": bool(diag.get("cell_overflow", False)),
                 "pp_overflow": bool(diag.get("pp_overflow", False)),
                 "contacts_overflow": bool(diag["contacts_overflow"]),
                 "auto_resizes": int(scene.collision_resizes)}
    if overflow:
        raise RuntimeError(
            f"collision capacity overflow persisted after "
            f"{scene.collision_resizes} auto-resizes: {rate_meta}")
    return rate, rate_meta


# ---------------------------------------------------------------------------

def _make_runners(smoke):
    return {
        "simplicits": lambda: bench_simplicits(
            num_qp=64 if smoke else 1000, num_handles=5 if smoke else 33,
            num_steps=3 if smoke else 150),
        "dibr": lambda: bench_dibr(
            height=64 if smoke else 512, width=64 if smoke else 512,
            num_iters=2 if smoke else 20,
            n_lat=8 if smoke else 40, n_lon=12 if smoke else 64),
        "raytrace": lambda: bench_raytrace(
            level=5 if smoke else 9, res=32 if smoke else 512,
            num_frames=2 if smoke else 60),
        "flexicubes": lambda: bench_flexicubes(
            res=12 if smoke else 64, num_iters=2 if smoke else 50),
        "gaussians_sim": lambda: bench_gaussians_sim(
            num_gaussians=200 if smoke else 2000,
            num_qp=128 if smoke else 2048, num_handles=4 if smoke else 16,
            num_steps=3 if smoke else 100),
        "collision_10k": lambda: bench_collision_10k(
            num_objects=2 if smoke else 6,
            qp_per_object=40 if smoke else 1700,
            num_handles=3 if smoke else 6,
            kinematic_qp=16 if smoke else 512,
            num_steps=2 if smoke else 20),
    }


class _Aggregate:
    """Running result set; always renderable to a complete JSON payload."""

    def __init__(self, selected):
        self.selected = list(selected)
        self.lock = threading.Lock()
        self.components = {}
        self.extras = {}
        self.ratios = {}     # name -> ratio (_FAIL_RATIO for failed/timeout)
        self.env = None
        self.final_printed = False

    def set_env(self):
        """Record backend + Pallas mode (VERDICT r4 #3: if the platform
        plugin ever stops reporting 'tpu', kernels would silently run
        interpreted — make that visible in every bench artifact)."""
        try:
            import jax
            from kaolin_tpu.utils.backend import pallas_interpret
            env = {"backend": jax.default_backend(),
                   "pallas_interpret": bool(pallas_interpret())}
            with self.lock:
                self.env = env
        except Exception:
            pass

    def record(self, name, value=None, meta=None, error=None):
        with self.lock:
            if error is not None:
                self.extras[name] = {"error": _clean_error(error)}
                self.ratios[name] = _FAIL_RATIO
                self.components[name] = 0.0
                # stable schema: the _vs_a100 key is always present
                self.components[f"{name}_vs_a100"] = 0.0
            else:
                if meta:
                    self.extras[name] = meta
                self.components[name] = round(value, 2)
                self.ratios[name] = value / BARS[name]
                self.components[f"{name}_vs_a100"] = round(
                    value / BARS[name], 3)

    def payload(self):
        with self.lock:
            ratios = [self.ratios.get(n, _FAIL_RATIO) for n in self.selected]
            missing = [n for n in self.selected if n not in self.ratios]
            geomean = float(np.exp(np.mean(np.log(ratios))))
            payload = {
                "metric": "northstar_speedup_vs_a100_geomean",
                "value": round(geomean, 3),
                "unit": "x",
                "vs_baseline": round(geomean, 3),
                "components": dict(self.components),
            }
            if missing:
                payload["unfinished"] = missing
            if self.env:
                payload["env"] = dict(self.env)
            if self.extras:
                payload["meta"] = {k: dict(v)
                                   for k, v in self.extras.items()}
            return payload

    def flush_partial(self):
        payload = self.payload()
        try:
            with open(_PARTIAL, "w") as f:
                json.dump(payload, f, indent=1)
        except Exception:
            pass
        print("[bench] partial: " + json.dumps(payload), file=sys.stderr,
              flush=True)

    def print_final(self):
        """Idempotent final stdout emission (main thread or watchdog)."""
        with self.lock:
            if self.final_printed:
                return
            self.final_printed = True
        print(json.dumps(self.payload()), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--component", choices=sorted(BARS), default=None)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, CPU-friendly correctness pass")
    ap.add_argument("--deadline", type=float, default=float(
        os.environ.get("BENCH_DEADLINE_S", 1100.0)),
        help="global wall budget in seconds; the watchdog prints the "
             "aggregate and exits when it passes (0 disables)")
    args = ap.parse_args()

    smoke = args.smoke
    if smoke:
        # CPU correctness pass: the axon site plugin overrides the env var
        # alone, so set both (see tests/conftest.py)
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    runners = _make_runners(smoke)
    selected = [args.component] if args.component else ORDER
    agg = _Aggregate(selected)
    t0 = time.perf_counter()

    if args.deadline > 0:
        def watchdog():
            # fires even while the main thread is blocked inside an RPC:
            # record the in-flight component as timed out, emit, hard-exit
            deadline = t0 + args.deadline
            while time.perf_counter() < deadline:
                if agg.final_printed:
                    return
                time.sleep(min(5.0, deadline - time.perf_counter()) + 0.01)
            for name in selected:
                if name not in agg.ratios:
                    agg.record(name, error="timeout: global bench deadline "
                               f"({args.deadline:.0f}s) reached")
            agg.flush_partial()
            agg.print_final()
            os._exit(0)

        threading.Thread(target=watchdog, daemon=True).start()

    for name in selected:
        print(f"[bench] {name}: start (t+{time.perf_counter() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        t_start = time.perf_counter()
        try:
            out = runners[name]()
        except Exception as e:  # record and keep measuring the rest
            import traceback
            traceback.print_exc()
            if _transient(e):
                # transient tunnel/compile-helper failure: one bounded
                # retry after a back-off (ADVICE r4 — a 500 on any
                # component costs ~an order of magnitude of geomean)
                print(f"[bench] {name}: transient error, retrying once",
                      file=sys.stderr, flush=True)
                time.sleep(10.0)
                try:
                    out = runners[name]()
                except Exception as e2:
                    traceback.print_exc()
                    agg.record(name, error=f"{type(e2).__name__}: {e2}")
                    agg.flush_partial()
                    continue
            else:
                agg.record(name, error=f"{type(e).__name__}: {e}")
                agg.flush_partial()
                continue
        meta = None
        if isinstance(out, tuple):
            out, meta = out
        meta = dict(meta) if meta else {}
        meta["wall_s"] = round(time.perf_counter() - t_start, 1)
        agg.record(name, value=out, meta=meta)
        agg.set_env()
        agg.flush_partial()
        print(f"[bench] {name}: {out:.2f} ({out / BARS[name]:.2f}x bar, "
              f"{meta['wall_s']:.0f}s incl. compile)",
              file=sys.stderr, flush=True)

    agg.print_final()


if __name__ == "__main__":
    main()
