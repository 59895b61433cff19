"""Cell-grid collision broad phase vs the dense reference path.

The grid broad phase (dense cell grid + half-stencil slices, the TPU analog
of the reference's ``wp.HashGrid``, ref
``kaolin/physics/common/collisions.py:641``) must find exactly the same
contact set as the exact O(N²) dense path on arbitrary scenes, and surface
capacity overflow instead of silently dropping pairs.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.physics.common.collisions import Collision


def _random_scene(seed, n_per_obj=60, n_obj=3, spread=1.0):
    rng = np.random.RandomState(seed)
    pts, ids = [], []
    for o in range(n_obj):
        center = rng.uniform(-spread, spread, (3,))
        pts.append(center + rng.uniform(-0.3, 0.3, (n_per_obj, 3)))
        ids.append(np.full(n_per_obj, o))
    x0 = jnp.asarray(np.concatenate(pts), dtype=jnp.float32)
    obj_ids = jnp.asarray(np.concatenate(ids), dtype=jnp.int32)
    dx = jnp.asarray(rng.uniform(-0.2, 0.2, x0.shape), dtype=jnp.float32)
    return dx, x0, obj_ids


def _pair_set(contacts):
    ia = np.asarray(contacts.indices_a)
    ib = np.asarray(contacts.indices_b)
    valid = np.asarray(contacts.valid)
    return {tuple(sorted((int(a), int(b))))
            for a, b, v in zip(ia, ib, valid) if v}


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("radius", [0.05, 0.15])
def test_grid_matches_dense_contact_set(seed, radius):
    dx, x0, obj_ids = _random_scene(seed)
    kwargs = dict(dt=0.01, collision_particle_radius=radius,
                  detection_ratio=1.5, max_contacting_pairs=4000)
    dense = Collision(broad_phase="dense", **kwargs)
    grid = Collision(broad_phase="grid", **kwargs)
    # rest-measured capacities (the product path via enable_collisions)
    grid.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids))

    c_dense = dense.detect_collisions(dx, x0, obj_ids)
    c_grid = grid.detect_collisions(dx, x0, obj_ids)
    assert _pair_set(c_dense) == _pair_set(c_grid)

    # scene-level energy agrees (order-invariant sum over contacts)
    e_dense = dense.energy(c_dense, dx, 1.0)
    e_grid = grid.energy(c_grid, dx, 1.0)
    np.testing.assert_allclose(np.asarray(e_dense), np.asarray(e_grid),
                               rtol=1e-5, atol=1e-6)


def test_grid_finds_contacts_in_overlapping_scene():
    """Two interpenetrating objects: both paths find the same nonempty set."""
    rng = np.random.RandomState(0)
    a = rng.uniform(-0.3, 0.3, (80, 3))
    b = rng.uniform(-0.3, 0.3, (80, 3)) + np.array([0.2, 0.0, 0.0])
    x0 = jnp.asarray(np.concatenate([a, b]), dtype=jnp.float32)
    obj_ids = jnp.asarray(np.repeat([0, 1], 80), dtype=jnp.int32)
    dx = jnp.zeros_like(x0)
    kwargs = dict(dt=0.01, collision_particle_radius=0.05,
                  max_contacting_pairs=8000)
    c_dense = Collision(broad_phase="dense", **kwargs).detect_collisions(
        dx, x0, obj_ids)
    grid = Collision(broad_phase="grid", **kwargs)
    grid.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids))
    c_grid = grid.detect_collisions(dx, x0, obj_ids)
    s = _pair_set(c_dense)
    assert s == _pair_set(c_grid)
    assert len(s) > 10


def test_grid_matches_dense_under_jit():
    dx, x0, obj_ids = _random_scene(7)
    grid = Collision(dt=0.01, collision_particle_radius=0.1,
                     broad_phase="grid", max_contacting_pairs=4000)
    # static grid geometry must exist before tracing
    grid.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids))
    dense = Collision(dt=0.01, collision_particle_radius=0.1,
                      broad_phase="dense", max_contacting_pairs=4000)
    c_grid = jax.jit(grid.detect_collisions)(dx, x0, obj_ids)
    c_dense = dense.detect_collisions(dx, x0, obj_ids)
    assert _pair_set(c_dense) == _pair_set(c_grid)


def test_self_collision_immunity_respected():
    # one object folded onto itself: all pairs immune at default ratio
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(-0.1, 0.1, (50, 3)), dtype=jnp.float32)
    obj_ids = jnp.zeros((50,), dtype=jnp.int32)
    dx = jnp.zeros_like(x0)
    for bp in ("dense", "grid"):
        col = Collision(dt=0.01, collision_particle_radius=0.1,
                        broad_phase=bp, max_contacting_pairs=100)
        c = col.detect_collisions(dx, x0, obj_ids)
        assert not np.any(np.asarray(c.valid))


def test_overflow_diagnostics():
    dx, x0, obj_ids = _random_scene(0)
    # deliberately undersized contact buffer: pairs get dropped and the
    # diagnostic reports it
    small = Collision(dt=0.01, collision_particle_radius=0.15,
                      broad_phase="grid", max_contacting_pairs=4000)
    small.configure_grid(np.asarray(x0))
    small.max_contacts = 2
    diag = small.detection_diagnostics(dx, x0, obj_ids)
    assert bool(diag["contacts_overflow"])
    assert int(diag["num_pairs"]) > 2

    # deliberately undersized cell capacity: points get dropped from the
    # grid and the diagnostic reports it
    tiny_cells = Collision(dt=0.01, collision_particle_radius=0.15,
                           broad_phase="grid", max_contacting_pairs=4000)
    tiny_cells.configure_grid(np.asarray(x0))
    tiny_cells.cell_capacity = 1
    diag = tiny_cells.detection_diagnostics(dx, x0, obj_ids)
    assert bool(diag["cell_overflow"])

    # deliberately undersized occupied-cell table: surfaced, not silent
    few_cells = Collision(dt=0.01, collision_particle_radius=0.15,
                          broad_phase="grid", max_contacting_pairs=4000)
    few_cells.configure_grid(np.asarray(x0))
    few_cells.max_occupied_cells = 2
    diag = few_cells.detection_diagnostics(dx, x0, obj_ids)
    assert bool(diag["occ_overflow"])

    # adequately sized (rest-measured capacities): no overflow
    ok = Collision(dt=0.01, collision_particle_radius=0.15,
                   broad_phase="grid", max_contacting_pairs=4000)
    ok.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids))
    diag = ok.detection_diagnostics(dx, x0, obj_ids)
    assert not bool(diag["contacts_overflow"])
    assert not bool(diag["cell_overflow"])


def test_grid_scales_to_50k_points():
    """The dense path materializes (N, N) matrices and dies around N≈20-50k;
    the grid path must handle N=50k at physical packing density (spacing on
    the order of the particle radius, like a multi-body contact scene) fast."""
    rng = np.random.RandomState(0)
    n = 50_000
    x0 = jnp.asarray(rng.uniform(0.0, 4.0, (n, 3)), dtype=jnp.float32)
    # alternate object ids so cross-object contacts exist
    obj_ids = jnp.asarray(np.arange(n) % 2, dtype=jnp.int32)
    dx = jnp.zeros_like(x0)
    col = Collision(dt=0.01, collision_particle_radius=0.05,
                    broad_phase="grid", max_contacting_pairs=200_000)
    # rest-measured capacities + static geometry (required under jit);
    # tight margin keeps the static cell count near the content volume
    col.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids),
                       margin=0.1)
    detect = jax.jit(col.detect_collisions)
    c = detect(dx, x0, obj_ids)
    jax.block_until_ready(c.valid)
    t0 = time.perf_counter()
    c = detect(dx, x0, obj_ids)
    jax.block_until_ready(c.valid)
    elapsed = time.perf_counter() - t0
    num = int(np.sum(np.asarray(c.valid)))
    assert num > 1000, f"expected many contacts at this density, got {num}"
    # sanity bound only — generous because the full suite runs 8 virtual
    # devices on shared CPUs (the TPU number is the real perf gate,
    # tracked in bench.py / bench_scale.py)
    assert elapsed < 60.0, f"grid detection took {elapsed:.2f}s at N=50k"


# ---- product integration: the grid phase through SimplicitsScene ----

def test_scene_broad_phase_auto_default():
    """enable_collisions picks the broad phase by measured narrow-phase
    cost: grid when occupied-cell blocks beat the N² matrix (points sparse
    relative to the detection radius), dense when the scene is packed
    tighter than the radius (grid cells can't shrink below it, so K
    explodes and M·14·K² dwarfs N²) and always dense below the threshold."""
    from kaolin_tpu.parallel.simplicits import make_demo_scene
    from kaolin_tpu.physics.simplicits.simulation import SimplicitsScene

    small = make_demo_scene(0, num_qp=32, with_kinematic=True,
                            broad_phase=None)
    assert small.force_dict["collision"]["object"].broad_phase == "dense"

    # 2048 points packed in a unit box vs a 0.3 detection radius: every
    # radius-sized cell holds hundreds of points — dense is cheaper
    thresh = SimplicitsScene.GRID_BROAD_PHASE_THRESHOLD
    packed = make_demo_scene(0, num_qp=thresh, with_kinematic=False,
                             broad_phase=None, max_contact_pairs=4000)
    col = packed.force_dict["collision"]["object"]
    grid_tests = col.max_occupied_cells * 14 * col.cell_capacity ** 2
    assert col.broad_phase == ("dense" if thresh * thresh < grid_tests
                               else "grid")

    # same count spread over a 20x larger box: cells at the radius are
    # nearly empty, the grid wins and must stay the auto choice
    spread = _spread_scene(num_qp=thresh, scale=20.0)
    assert spread.force_dict["collision"]["object"].broad_phase == "grid"


def _spread_scene(num_qp, scale, seed=0, radius=0.1):
    from kaolin_tpu.physics.simplicits import (SimplicitsScene,
                                               SkinnedPhysicsPoints)
    rng = np.random.RandomState(seed)
    pts = (rng.uniform(-0.5, 0.5, (num_qp, 3)) * scale).astype(np.float32)
    w = np.ones((num_qp, 1), np.float32)
    dwdx = np.zeros((num_qp, 1, 3), np.float32)
    body = SkinnedPhysicsPoints(pts=pts, yms=1e4, prs=0.45, rhos=500.0,
                                appx_vol=1.0, skinning_weights=w, dwdx=dwdx)
    scene = SimplicitsScene(timestep=0.03, max_newton_steps=2, max_ls_steps=3)
    scene.add_object(body, apply_qr=False)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.enable_collisions(collision_particle_radius=radius,
                            broad_phase=None)
    return scene


def test_single_object_self_immune_scene_skips_detection():
    """One collision object whose rest diagonal² is under the
    self-immunity bound can never produce a contact: the scene must prove
    this host-side and build a detection-free step with an IDENTICAL
    trajectory to the collisions-off step (the floor force is separate and
    still active)."""
    from kaolin_tpu.parallel.simplicits import make_demo_scene

    on = make_demo_scene(5, num_qp=40, with_kinematic=False,
                         with_collision=True, broad_phase="dense")
    assert on._collision_provably_empty()
    off = make_demo_scene(5, num_qp=40, with_kinematic=False,
                          with_collision=False)
    for _ in range(6):
        on.run_sim_step()
        off.run_sim_step()
    np.testing.assert_allclose(np.asarray(on.sim_z), np.asarray(off.sim_z),
                               rtol=1e-6, atol=1e-7)

    # two objects (body + plate): NOT provably empty, detection stays
    two = make_demo_scene(5, num_qp=40, with_kinematic=True,
                          broad_phase="dense")
    assert not two._collision_provably_empty()
    # huge spread: rest diagonal² exceeds the immunity bound even for a
    # single object (self-collision is live), detection stays
    huge = _spread_scene(num_qp=64, scale=300.0, radius=0.001)
    assert not huge._collision_provably_empty()


def test_run_sim_step_grid_matches_dense_trajectory():
    """Full product loop (run_sim_step: detection inside the jitted Newton
    step, contact jacobians, QR basis, Armijo bounds): a soft body dropping
    onto a kinematic plate must produce the same trajectory under the grid
    and dense broad phases."""
    from kaolin_tpu.parallel.simplicits import make_demo_scene

    trajs = {}
    for bp in ("dense", "grid"):
        scene = make_demo_scene(3, num_qp=48, kinematic_qp=25,
                                with_kinematic=True, broad_phase=bp,
                                max_contact_pairs=512)
        zs = []
        for _ in range(12):
            scene.run_sim_step()
            zs.append(np.asarray(scene.sim_z))
        trajs[bp] = np.stack(zs)
    assert np.isfinite(trajs["grid"]).all()
    # identical contact SETS in different buffer order: float reduction
    # order differs, and the Newton solve amplifies it over 12 steps
    np.testing.assert_allclose(trajs["grid"], trajs["dense"],
                               rtol=1e-2, atol=2e-4)
    # the scenario actually produced contacts (not vacuous equality)
    scene = make_demo_scene(3, num_qp=48, kinematic_qp=25,
                            with_kinematic=True, broad_phase="grid",
                            max_contact_pairs=512)
    for _ in range(12):
        scene.run_sim_step()
    diag = scene.collision_diagnostics()
    assert int(diag["num_pairs"]) > 0
    assert not bool(diag["cell_overflow"])


# ---- sweep-and-prune broad phase ----

@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("radius", [0.05, 0.15])
def test_sweep_matches_dense_contact_set(seed, radius):
    dx, x0, obj_ids = _random_scene(seed)
    kwargs = dict(dt=0.01, collision_particle_radius=radius,
                  detection_ratio=1.5, max_contacting_pairs=4000)
    dense = Collision(broad_phase="dense", **kwargs)
    sweep = Collision(broad_phase="sweep", sweep_window=128, **kwargs)
    c_dense = dense.detect_collisions(dx, x0, obj_ids)
    c_sweep = sweep.detect_collisions(dx, x0, obj_ids)
    assert _pair_set(c_dense) == _pair_set(c_sweep)
    e_dense = dense.energy(c_dense, dx, 1.0)
    e_sweep = sweep.energy(c_sweep, dx, 1.0)
    np.testing.assert_allclose(np.asarray(e_sweep), np.asarray(e_dense),
                               rtol=1e-5, atol=1e-6)


def test_sweep_window_overflow_surfaced():
    # all points in a tight x-slab: tiny window must report overflow
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(np.stack([np.zeros(100), rng.rand(100),
                               rng.rand(100)], 1), jnp.float32)
    dx = jnp.zeros_like(x0)
    ids = jnp.asarray(np.arange(100) % 2, jnp.int32)
    small = Collision(dt=0.01, collision_particle_radius=0.1,
                      broad_phase="sweep", sweep_window=4,
                      max_contacting_pairs=8000)
    diag = small.detection_diagnostics(dx, x0, ids)
    assert bool(diag["window_overflow"])
    ok = Collision(dt=0.01, collision_particle_radius=0.1,
                   broad_phase="sweep", sweep_window=128,
                   max_contacting_pairs=8000)
    diag = ok.detection_diagnostics(dx, x0, ids)
    assert not bool(diag["window_overflow"])


def test_sweep_under_jit_and_scale():
    rng = np.random.RandomState(0)
    n = 50_000
    x0 = jnp.asarray(rng.uniform(0.0, 10.0, (n, 3)), jnp.float32)
    obj_ids = jnp.asarray(np.arange(n) % 2, jnp.int32)
    dx = jnp.zeros_like(x0)
    # uniform volume at N=50k: slab density sets the window (~800 here)
    col = Collision(dt=0.01, collision_particle_radius=0.05,
                    broad_phase="sweep", sweep_window=1024,
                    max_contacting_pairs=200_000)
    detect = jax.jit(col.detect_collisions)
    c = detect(dx, x0, obj_ids)
    jax.block_until_ready(c.valid)
    dense_ref = Collision(dt=0.01, collision_particle_radius=0.05,
                          broad_phase="grid", max_contacting_pairs=200_000)
    dense_ref.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids))
    c_ref = dense_ref.detect_collisions(dx, x0, obj_ids)
    assert _pair_set(c) == _pair_set(c_ref)


def test_run_sim_step_sweep_matches_dense_trajectory():
    from kaolin_tpu.parallel.simplicits import make_demo_scene
    trajs = {}
    for bp in ("dense", "sweep"):
        scene = make_demo_scene(3, num_qp=48, kinematic_qp=25,
                                with_kinematic=True, broad_phase=bp,
                                max_contact_pairs=512)
        zs = []
        for _ in range(12):
            scene.run_sim_step()
            zs.append(np.asarray(scene.sim_z))
        trajs[bp] = np.stack(zs)
    # same contact sets, different buffer order → float drift (see grid test)
    np.testing.assert_allclose(trajs["sweep"], trajs["dense"],
                               rtol=1e-2, atol=2e-4)


# ---- q-form (Kronecker-factored) contact math vs the explicit jacobian ----

def _qform_setup(seed=0, n=60, h=5):
    """Contacts detected both ways on one scene + a raw-basis DOF state.

    The q-form stores per-side factors w (H,) and [x;1] (4,) of each
    contact's LBS jacobian row; every quantity it produces must match the
    legacy path that materializes the (3C, 12H) jacobian from lbs_matrix.
    """
    from kaolin_tpu.physics.simplicits.precomputed import lbs_matrix

    rng = np.random.RandomState(seed)
    x0 = jnp.asarray(rng.uniform(-0.4, 0.4, (n, 3)), jnp.float32)
    w = jnp.asarray(rng.uniform(0.05, 1.0, (n, h)), jnp.float32)
    obj_ids = jnp.asarray(np.arange(n) % 3, jnp.int32)
    B = lbs_matrix(x0, w)                                   # (3N, 12H)
    z0 = jnp.asarray(rng.randn(12 * h) * 0.02, jnp.float32)
    dz = jnp.asarray(rng.randn(12 * h) * 0.01, jnp.float32)
    dx0 = (B @ z0).reshape(-1, 3)
    dx = (B @ (z0 + dz)).reshape(-1, 3)

    col = Collision(dt=0.01, collision_particle_radius=0.08,
                    broad_phase="dense", max_contacting_pairs=2000)
    c_leg = col.detect_collisions(dx0, x0, obj_ids)
    c_q = col.detect_collisions(dx0, x0, obj_ids, weights=w)
    assert int(np.sum(np.asarray(c_leg.valid))) > 5
    np.testing.assert_array_equal(np.asarray(c_leg.indices_a),
                                  np.asarray(c_q.indices_a))
    np.testing.assert_array_equal(np.asarray(c_leg.indices_b),
                                  np.asarray(c_q.indices_b))
    return col, c_leg, c_q, B, dx, dz, rng


def test_qform_energy_gradient_hessian_match_legacy():
    col, c_leg, c_q, B, dx, dz, _ = _qform_setup()
    e_leg = col.energy(c_leg, dx=dx)
    e_q = col.energy(c_q, zq=dz)
    np.testing.assert_allclose(np.asarray(e_q), np.asarray(e_leg),
                               rtol=1e-5, atol=1e-6)
    g_leg = col.gradient(c_leg, dx=dx)
    g_q = col.gradient(c_q, zq=dz)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_leg),
                               rtol=1e-4, atol=1e-6)
    h_leg = col.hessian(c_leg, dx=dx)
    h_q = col.hessian(c_q, zq=dz)
    # the log-barrier's 2nd derivatives amplify f32 noise in the offsets
    # (~3e-8) by ~1/dp^2 — tolerance reflects precision, not math
    np.testing.assert_allclose(np.asarray(h_q), np.asarray(h_leg),
                               rtol=2e-3, atol=1e-2)


def test_qform_pullbacks_match_explicit_jacobian():
    from kaolin_tpu.physics.utils.torch_utilities import hess_reduction

    col, c_leg, c_q, B, dx, dz, _ = _qform_setup()
    cJ, _, _ = col.calculate_jacobian(c_leg, B)
    g = col.gradient(c_leg, dx=dx)
    want_g = cJ.T @ g.reshape(-1)
    got_g = col.pullback_gradient(c_q, col.gradient(c_q, zq=dz))
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=1e-4, atol=1e-5)

    h = col.hessian(c_leg, dx=dx)
    want_H = hess_reduction(cJ, h)
    got_H = col.reduced_hessian(c_q, col.hessian(c_q, zq=dz))
    # f32 barrier-hessian noise (see above) + reordered reductions
    np.testing.assert_allclose(np.asarray(got_H), np.asarray(want_H),
                               rtol=2e-3, atol=5e-2)


def test_qform_bounds_match_legacy():
    col, c_leg, c_q, B, dx, dz, rng = _qform_setup()
    dz2 = jnp.asarray(rng.randn(dz.shape[0]).astype(np.float32) * 0.2)
    _, cJa, cJb = col.calculate_jacobian(c_leg, B)
    want = col.get_bounds(c_leg, (B @ dz2).reshape(-1, 3), dx, cJa, cJb)
    got = col.get_bounds_q(c_q, dz2, dz)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_pp_overflow_surfaced_and_resized():
    """Per-point fan-out capacity (the grid top-k) must surface overflow
    via its own diag key + bitmask bit, and the scene auto-resize must grow
    point_contact_capacity, after which detection is drop-free."""
    dx, x0, obj_ids = _random_scene(0)
    col = Collision(dt=0.01, collision_particle_radius=0.15,
                    broad_phase="grid", max_contacting_pairs=4000)
    col.configure_grid(np.asarray(x0), obj_ids=np.asarray(obj_ids))
    auto_pp = col.point_contact_capacity
    col.point_contact_capacity = 1      # starve the per-point top-k
    diag = col.detection_diagnostics(dx, x0, obj_ids)
    assert bool(diag["pp_overflow"])
    assert int(diag["pp_dropped_pairs"]) > 0
    flags = int(np.asarray(Collision.diag_flags(diag)))
    assert flags & Collision.FLAG_PP_OVERFLOW
    # pairs recovered at the auto-measured capacity match the dense oracle
    col.point_contact_capacity = auto_pp
    diag = col.detection_diagnostics(dx, x0, obj_ids)
    assert not bool(diag["pp_overflow"])
    dense = Collision(dt=0.01, collision_particle_radius=0.15,
                      broad_phase="dense", max_contacting_pairs=4000)
    c_g = col.detect_collisions(dx, x0, obj_ids)
    c_d = dense.detect_collisions(dx, x0, obj_ids)

    def pair_set(c):
        ia = np.asarray(c.indices_a)[np.asarray(c.valid)]
        ib = np.asarray(c.indices_b)[np.asarray(c.valid)]
        return set(map(tuple, np.sort(np.stack([ia, ib], 1), axis=1)
                       .tolist()))
    assert pair_set(c_g) == pair_set(c_d)
