"""Sharded Simplicits training and multi-scene simulation.

(a) ``sharded_mlp_train_step`` — data-parallel loss/grad over sample points:
    each device evaluates the elastic+ortho loss on its shard, gradients are
    psum-reduced over the ``dp`` axis, replicated params take an SGD step.

(b) ``sharded_scene_batch_step`` — scene-parallel implicit time stepping:
    a stacked batch of independent scenes (vmapped functional sim step) with
    the scene axis sharded across the mesh. Scenes never communicate, so the
    only collective is layout movement — embarrassingly parallel throughput.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from kaolin_tpu.physics.simplicits.losses import loss_elastic, loss_ortho
from kaolin_tpu.physics.simplicits.network import mlp_apply

__all__ = ["sharded_mlp_train_step", "sharded_scene_batch_step"]


def sharded_mlp_train_step(mesh, params, pts, yms, prs, rhos, appx_vol, key,
                           batch_size=4, lr=1e-3, en_interp=0.5,
                           le_coeff=1e-1, lo_coeff=1e6):
    """One dp-sharded training step. pts (B, 3) sharded over 'dp'; params
    replicated. Returns (new_params, loss)."""

    def local_loss(p, local_pts, local_yms, local_prs, local_rhos, k):
        model = lambda x: mlp_apply(p, x)  # noqa: E731
        tfms = 0.1 * jax.random.normal(
            k, (batch_size, mlp_apply(p, local_pts[:1]).shape[-1], 3, 4))
        le = le_coeff * loss_elastic(model, local_pts, local_yms, local_prs,
                                     local_rhos, tfms, appx_vol, en_interp)
        w = model(local_pts)
        lo = lo_coeff * loss_ortho(w)
        return le + lo

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P("dp"), P("dp"), P()),
        out_specs=(P(), P()),
        check_vma=False)
    def step(p, local_pts, local_yms, local_prs, local_rhos, k):
        loss, grads = jax.value_and_grad(local_loss)(
            p, local_pts, local_yms, local_prs, local_rhos, k)
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        new_p = jax.tree_util.tree_map(lambda a, g: a - lr * g, p, grads)
        return new_p, loss

    return jax.jit(step)(params, pts, yms, prs, rhos, key)


def make_demo_scene(seed, num_qp=32, num_handles=3, dt=0.03,
                    with_collision=True, with_kinematic=True,
                    kinematic_qp=16, max_contact_pairs=64,
                    broad_phase="grid"):
    """Build a REAL :class:`SimplicitsScene` for scene-batch parallelism
    demos/tests: one dynamic soft body (QR-conditioned, analytic skinning
    field standing in for a trained MLP) dropping under gravity onto a floor,
    optionally colliding with a kinematic plate object.

    Every scene built with the same structural arguments (counts/flags) has
    an identical functional-step pytree structure, so a list of them can be
    stacked and vmapped/sharded (ref behavior: simulation.py:1346 per scene).
    """
    from kaolin_tpu.physics.simplicits import (SimplicitsScene,
                                               SkinnedPhysicsPoints)

    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.5, 0.5, (num_qp, 3)).astype(np.float32)
    freqs = rng.randn(3, num_handles - 1).astype(np.float32)
    w = np.concatenate([np.sin(pts @ freqs), np.ones((num_qp, 1), np.float32)],
                       axis=1).astype(np.float32)
    dwdx = np.zeros((num_qp, num_handles, 3), dtype=np.float32)
    dwdx[:, :-1, :] = np.cos(pts @ freqs)[:, :, None] * freqs.T[None]
    soft = SkinnedPhysicsPoints(pts=pts, yms=1e4, prs=0.45, rhos=500.0,
                                appx_vol=1.0, skinning_weights=w, dwdx=dwdx)

    scene = SimplicitsScene(timestep=dt, max_newton_steps=3, max_ls_steps=5)
    scene.add_object(soft, apply_qr=True, normalize_weights_by_samples=True)

    if with_kinematic:
        # rigid plate below the soft body: one constant handle, kinematic
        side = int(np.ceil(np.sqrt(kinematic_qp)))
        gx, gz = np.meshgrid(np.linspace(-0.6, 0.6, side),
                             np.linspace(-0.6, 0.6, side))
        kpts = np.stack([gx.ravel(), np.full(side * side, -0.85),
                         gz.ravel()], axis=1)[:kinematic_qp].astype(np.float32)
        kin = SkinnedPhysicsPoints(
            pts=kpts, yms=1e5, prs=0.45, rhos=1000.0, appx_vol=0.1,
            skinning_weights=np.ones((kinematic_qp, 1), np.float32),
            dwdx=np.zeros((kinematic_qp, 1, 3), np.float32))
        scene.add_object(kin, is_kinematic=True, apply_qr=False,
                         normalize_weights_by_samples=False)

    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-1.0)
    if with_collision:
        # grid by default so the multichip dryrun exercises the product
        # broad phase (the auto threshold would pick dense at demo scale)
        scene.enable_collisions(collision_particle_radius=0.15,
                                max_contact_pairs=max_contact_pairs,
                                broad_phase=broad_phase)
    return scene


def stack_scenes(scenes):
    """Stack the functional-step constants of structurally identical scenes.

    Returns ``(step_fn, stacked_consts, (z, z_prev, z_dot))`` where
    ``step_fn`` is the REAL per-scene step from
    :meth:`SimplicitsScene.build_functional_step` and every leaf of
    ``stacked_consts`` / state gains a leading scene axis.
    """
    pairs = [s.build_functional_step() for s in scenes]
    step = pairs[0][0]
    consts = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c for _, c in pairs])
    z = jnp.stack([s.sim_z for s in scenes])
    z_prev = jnp.stack([s.sim_z_prev for s in scenes])
    z_dot = jnp.stack([s.sim_z_dot for s in scenes])
    return step, consts, (z, z_prev, z_dot)


def sharded_scene_batch_step(mesh, scenes, state=None, axis_name="dp"):
    """One implicit time step for a batch of REAL independent scenes, scene
    axis sharded over the mesh. The per-device computation is the full
    product simulator (collisions, kinematic DOFs, QR basis, Newton + Armijo
    — the same ``build_functional_step`` used by ``run_sim_step``), vmapped
    over the local scene shard; scenes never communicate.

    Args:
        mesh: a ``jax.sharding.Mesh`` with axis ``axis_name``.
        scenes: list of structurally identical ``SimplicitsScene``s (length
            divisible by the mesh axis size).
        state: optional ``(z, z_prev, z_dot)`` stacked batch state; defaults
            to the scenes' current state.

    Returns:
        ``(z, z_prev, z_dot)`` stacked new state, sharded over the mesh.
    """
    step, consts, init_state = stack_scenes(scenes)
    if state is None:
        state = init_state

    spec = P(axis_name)
    sharding = NamedSharding(mesh, spec)
    consts = jax.device_put(consts, sharding)
    state = jax.device_put(state, sharding)

    @jax.jit
    @functools.partial(shard_map, mesh=mesh,
                       in_specs=(spec, (spec, spec, spec)),
                       out_specs=(spec, spec, spec),
                       check_vma=False)
    def batch_step(c, st):
        return jax.vmap(step)(c, *st)

    return batch_step(consts, state)
