"""Heterogeneous scene batching (VERDICT r2 #8): scenes with different
qp/handle counts pad to per-bucket maxima (phantom zero-mass points, phantom
handles supported only on them) and shard together, matching their
sequential unpadded runs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.parallel.simplicits import (
    pad_skinned_physics_points,
    sharded_scene_batch_step,
    stack_scenes,
)
from kaolin_tpu.physics.simplicits import (SimplicitsScene,
                                           SkinnedPhysicsPoints)


def _baked(seed, num_qp, num_handles):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.5, 0.5, (num_qp, 3)).astype(np.float32)
    freqs = rng.randn(3, num_handles - 1).astype(np.float32)
    w = np.concatenate([np.sin(pts @ freqs),
                        np.ones((num_qp, 1), np.float32)], axis=1)
    dwdx = np.zeros((num_qp, num_handles, 3), np.float32)
    dwdx[:, :-1, :] = np.cos(pts @ freqs)[:, :, None] * freqs.T[None]
    return SkinnedPhysicsPoints(pts=pts, yms=1e4, prs=0.45, rhos=500.0,
                                appx_vol=1.0, skinning_weights=w, dwdx=dwdx)


def _scene(baked, dt=0.03, collisions=False, origin_shift=0):
    scene = SimplicitsScene(timestep=dt, max_newton_steps=3, max_ls_steps=5)
    scene.add_object(baked, apply_qr=True,
                     normalize_weights_by_samples=True)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-1.0)
    if collisions:
        scene.enable_collisions(collision_particle_radius=0.15,
                                max_contact_pairs=256, broad_phase="grid")
    return scene


@pytest.mark.parametrize("pad_handles", [0, 2])
def test_padded_scene_matches_unpadded_trajectory(pad_handles):
    """Zero-mass phantom qp + phantom handles leave the REAL dynamics
    exactly unchanged through 10 product sim steps."""
    baked = _baked(0, num_qp=40, num_handles=4)
    padded = pad_skinned_physics_points(baked, num_qp=64,
                                        num_handles=4 + pad_handles)

    ref_scene = _scene(baked)
    pad_scene = _scene(padded)
    for _ in range(10):
        ref_scene.run_sim_step()
        pad_scene.run_sim_step()
    ref_pts = np.asarray(ref_scene.get_object_deformed_pts(0))
    pad_pts = np.asarray(pad_scene.get_object_deformed_pts(0))[:40]
    np.testing.assert_allclose(pad_pts, ref_pts, rtol=1e-4, atol=1e-5)


def test_padded_scene_with_collisions_matches():
    baked = _baked(1, num_qp=48, num_handles=3)
    padded = pad_skinned_physics_points(baked, num_qp=80, num_handles=5)
    ref_scene = _scene(baked, collisions=True)
    pad_scene = _scene(padded, collisions=True)
    # equal contact capacity requires equal N... capacities differ; compare
    # trajectories only (each scene uses its own capacity)
    for _ in range(8):
        ref_scene.run_sim_step()
        pad_scene.run_sim_step()
    np.testing.assert_allclose(
        np.asarray(pad_scene.get_object_deformed_pts(0))[:48],
        np.asarray(ref_scene.get_object_deformed_pts(0)),
        rtol=1e-4, atol=1e-5)


def test_three_different_sized_scenes_shard_together():
    """VERDICT done-criterion: a sharded batch of 3 different-sized scenes
    matches their sequential (unpadded) runs."""
    from kaolin_tpu.parallel.simplicits import bucket_pad_targets
    sizes = [(40, 3), (56, 4), (24, 5)]
    qp_max, h_max = bucket_pad_targets(sizes)

    baked = [_baked(10 + i, nq, nh) for i, (nq, nh) in enumerate(sizes)]
    padded = [pad_skinned_physics_points(b, qp_max, h_max) for b in baked]

    # sequential unpadded truth
    seq = []
    for b in baked:
        s = _scene(b)
        for _ in range(5):
            s.run_sim_step()
        seq.append(np.asarray(s.get_object_deformed_pts(0)))

    # padded scenes stack; shard over a 1-device mesh locally... use all
    # devices if the batch divides (conftest gives 8 CPU devices; batch of 3
    # doesn't divide 8, so run the vmapped stacked step directly)
    scenes = [_scene(p) for p in padded]
    step, consts, state = stack_scenes(scenes)
    for _ in range(5):
        state = jax.jit(jax.vmap(step))(consts, *state)
    z = state[0]
    for i, s in enumerate(scenes):
        s.sim_z = z[i]
        got = np.asarray(s.get_object_deformed_pts(0))[:sizes[i][0]]
        np.testing.assert_allclose(got, seq[i], rtol=1e-4, atol=1e-5), i


def test_three_sizes_sharded_on_mesh():
    """Same, through shard_map on a real device mesh (batch 4 on 2 devices,
    two scene sizes)."""
    from jax.sharding import Mesh

    devs = jax.devices()[:2]
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    from kaolin_tpu.parallel.simplicits import bucket_pad_targets
    sizes = [(40, 3), (24, 4), (40, 3), (24, 4)]
    qp_max, h_max = bucket_pad_targets(sizes)
    baked = [_baked(20 + i, nq, nh) for i, (nq, nh) in enumerate(sizes)]
    seq = []
    for b in baked:
        s = _scene(b)
        for _ in range(4):
            s.run_sim_step()
        seq.append(np.asarray(s.get_object_deformed_pts(0)))

    scenes = [_scene(pad_skinned_physics_points(b, qp_max, h_max))
              for b in baked]
    mesh = Mesh(np.array(devs), ("dp",))
    state = None
    for _ in range(4):
        state = sharded_scene_batch_step(mesh, scenes, state=state)
    for i, s in enumerate(scenes):
        s.sim_z = state[0][i]
        got = np.asarray(s.get_object_deformed_pts(0))[:sizes[i][0]]
        np.testing.assert_allclose(got, seq[i], rtol=1e-4, atol=1e-5), i


def test_stack_scenes_raises_helpfully_on_mismatch():
    scenes = [_scene(_baked(0, 40, 3)), _scene(_baked(1, 56, 3))]
    with pytest.raises(ValueError, match="pad_skinned_physics_points"):
        stack_scenes(scenes)


def test_padded_scene_diagnostics_ignore_phantoms():
    """Phantom padding points leave NO footprint in collision diagnostics:
    no cell_overflow/dropped_points noise from the far-away phantom cluster
    (they are excluded from detection entirely)."""
    baked = _baked(1, num_qp=48, num_handles=3)
    padded = pad_skinned_physics_points(baked, num_qp=90, num_handles=5)
    scene = _scene(padded, collisions=True)
    scene.run_sim_step()
    diag = scene.collision_diagnostics()
    assert not bool(diag["cell_overflow"])
    assert int(diag["dropped_points"]) == 0
    assert int(diag["out_of_bounds"]) == 0
