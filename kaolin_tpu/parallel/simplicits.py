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

__all__ = ["sharded_mlp_train_step", "sharded_scene_batch_step",
           "pad_skinned_physics_points", "bucket_pad_targets"]


def bucket_pad_targets(sizes):
    """Smallest (num_qp, num_handles) bucket targets for a list of
    ``(num_qp, num_handles)`` scene sizes, honoring the 4-phantom-points-
    per-phantom-handle rank requirement of
    :func:`pad_skinned_physics_points`."""
    h_max = max(h for _, h in sizes)
    qp_max = max(nq + 4 * (h_max - nh) for nq, nh in sizes)
    return qp_max, h_max


def pad_skinned_physics_points(baked, num_qp, num_handles=None,
                               phantom_origin=(0.0, 1.0e5, 0.0),
                               phantom_spacing=10.0):
    """Pad a :class:`SkinnedPhysicsPoints` to ``num_qp`` quadrature points
    and ``num_handles`` handles so DIFFERENT-SIZED scenes share one
    functional-step pytree and can be stacked/sharded together
    (:func:`stack_scenes`). The padding is physics-exact:

    * phantom points carry ZERO volume and mass (``num_real_qp`` marks the
      real prefix), so every volume/mass-weighted energy ignores them; they
      are placed in a lattice at ``phantom_origin`` — far above any floor
      and outside every collision radius — and are self-collision-immune
      (one cluster per object, within the immunity radius of itself);
    * phantom handles get support ONLY on phantom points (4+ non-coplanar
      points each keep the LBS operator full column rank, so the QR
      conditioning basis stays invertible); their B/dFdz columns are zero at
      every real point, their BMB rows/columns are zero (massless support),
      and their gradient is identically zero, so Newton leaves their DOFs at
      exactly 0 (the Hessian regularizer keeps the system SPD — keep
      ``newton_hessian_regularizer > 0``, the default, in padded scenes);
    * the constant handle stays LAST (phantom handle columns are inserted
      just before it), preserving ``init_transform`` semantics.

    Returns a new ``SkinnedPhysicsPoints``; trajectories of the real DOFs
    are bit-comparable to the unpadded scene (see
    ``tests/parallel/test_heterogeneous_batch.py``).
    """
    from kaolin_tpu.physics.simplicits import SkinnedPhysicsPoints

    n, h = baked.pts.shape[0], baked.num_handles
    if num_handles is None:
        num_handles = h
    if num_qp < n or num_handles < h:
        raise ValueError(f"pad target ({num_qp} qp, {num_handles} handles) "
                         f"smaller than input ({n} qp, {h} handles)")
    h_pad = num_handles - h
    q_pad = num_qp - n
    if h_pad > 0 and q_pad < 4 * h_pad:
        raise ValueError(
            f"padding {h_pad} handles needs >= {4 * h_pad} phantom points "
            f"to keep the LBS operator full rank; got {q_pad} — raise the "
            f"qp target")
    if q_pad == 0 and h_pad == 0:
        return baked

    dtype = np.asarray(baked.pts).dtype
    # non-coplanar 4-point tetra pattern, tiled into a spaced lattice
    tetra = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype)
    reps = -(-q_pad // 4)
    offsets = (np.arange(reps, dtype=dtype)[:, None]
               * np.asarray([phantom_spacing, 0, 0], dtype))
    lattice = (tetra[None] + offsets[:, None]).reshape(-1, 3)[:q_pad]
    ppts = np.asarray(phantom_origin, dtype) + lattice

    pw = np.zeros((q_pad, num_handles), dtype)
    pdw = np.zeros((q_pad, num_handles, 3), dtype)
    for k in range(h_pad):
        pw[4 * k:4 * k + 4, h - 1 + k] = 1.0  # before the constant handle

    w = np.asarray(baked.skinning_weights)
    dw = np.asarray(baked.dwdx)
    w_pad = np.concatenate(
        [w[:, :h - 1], np.zeros((n, h_pad), dtype), w[:, h - 1:]], axis=1)
    dw_pad = np.concatenate(
        [dw[:, :h - 1], np.zeros((n, h_pad, 3), dtype), dw[:, h - 1:]],
        axis=1)

    return SkinnedPhysicsPoints(
        pts=np.concatenate([np.asarray(baked.pts), ppts]),
        yms=np.concatenate([np.asarray(baked.yms),
                            np.full(q_pad, np.asarray(baked.yms)[0], dtype)]),
        prs=np.concatenate([np.asarray(baked.prs),
                            np.full(q_pad, np.asarray(baked.prs)[0], dtype)]),
        rhos=np.concatenate([np.asarray(baked.rhos),
                             np.full(q_pad, np.asarray(baked.rhos)[0],
                                     dtype)]),
        appx_vol=baked.appx_vol,
        skinning_weights=np.concatenate([w_pad, pw]),
        dwdx=np.concatenate([dw_pad, pdw]),
        renderable=baked.renderable,
        num_real_qp=n)


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
        # explicit capacities: the grid's static shapes must be identical
        # across scenes built with the same structural args for stacking
        # (auto capacities are measured per-scene and could differ by seed)
        scene.enable_collisions(collision_particle_radius=0.15,
                                max_contact_pairs=max_contact_pairs,
                                broad_phase=broad_phase,
                                cell_capacity=32,
                                max_occupied_cells=512)
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
    flat = [jax.tree_util.tree_flatten(c) for _, c in pairs]
    sigs = [(tuple(jnp.shape(x) for x in leaves), treedef)
            for leaves, treedef in flat]
    if any(s != sigs[0] for s in sigs[1:]):
        raise ValueError(
            "scenes have different operator shapes (different qp/handle "
            "counts) — pad each object to the bucket maxima with "
            "kaolin_tpu.parallel.simplicits.pad_skinned_physics_points "
            "before add_object, then stack")
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
