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


def _mini_scene_constants(num_qp, num_handles, seed):
    """Tiny synthetic scene constants (analytic weight field)."""
    from kaolin_tpu.physics.simplicits.precomputed import dFdz_matrix, lbs_matrix
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.5, 0.5, (num_qp, 3)).astype(np.float32)
    freqs = rng.randn(3, num_handles - 1).astype(np.float32)
    w = np.concatenate([np.sin(pts @ freqs),
                        np.ones((num_qp, 1), np.float32)], axis=1)
    dwdx = np.zeros((num_qp, num_handles, 3), dtype=np.float32)
    dwdx[:, :-1, :] = np.transpose(
        np.cos(pts @ freqs)[:, :, None] * freqs.T[None], (0, 1, 2))
    B = np.asarray(lbs_matrix(jnp.asarray(pts), jnp.asarray(w)))
    dFdz = np.asarray(dFdz_matrix(jnp.asarray(w), jnp.asarray(dwdx),
                                  jnp.asarray(pts)))
    masses = np.full((num_qp,), 500.0 / num_qp, dtype=np.float32)
    BMB = B.T @ (np.repeat(masses, 3)[:, None] * B)
    vols = np.full((num_qp,), 1.0 / num_qp, dtype=np.float32)
    return dict(pts=pts, B=B, dFdz=dFdz, BMB=BMB, vols=vols, masses=masses)


def _functional_sim_step(consts, z, z_prev, z_dot, dt=0.03, newton_iters=3):
    """Minimal gravity+floor+neohookean implicit step over one scene's
    constants — the vmappable core used for scene-parallel batching."""
    from kaolin_tpu.physics.common.optimization import newtons_method
    from kaolin_tpu.physics.materials.neohookean_elastic_material import (
        neohookean_energy, neohookean_gradient, neohookean_hessian)
    from kaolin_tpu.physics.utils.torch_utilities import hess_reduction

    B, dFdz, BMB = consts["B"], consts["dFdz"], consts["BMB"]
    pts, vols, masses = consts["pts"], consts["vols"], consts["masses"]
    mu = jnp.full((pts.shape[0], 1), 1e4 / 2.9)
    lam = jnp.full((pts.shape[0], 1), 1e4 * 0.45 / (1.45 * 0.1)) + mu
    g = jnp.asarray([0.0, 9.8, 0.0])
    floor_h, floor_pen = -1.0, 10000.0
    eye3 = jnp.eye(3)

    def pe(z_):
        dx = (B @ z_).reshape(-1, 3)
        F = (dFdz @ z_).reshape(-1, 3, 3) + eye3
        grav = jnp.sum((dx + pts) @ g * masses)
        p = (dx + pts)[:, 1] - floor_h
        floor = floor_pen * jnp.sum(jnp.where(p < 0, p ** 2, 0.0))
        elast = jnp.sum(neohookean_energy(mu, lam, F, vols[:, None]))
        return grav + floor + elast

    def energy(z_):
        delta = z_ - z_prev - dt * z_dot
        return 0.5 * delta @ (BMB @ delta) + dt * dt * pe(z_)

    def grad(z_):
        delta = z_ - z_prev - dt * z_dot
        return BMB @ delta + dt * dt * jax.grad(pe)(z_)

    def hess(z_):
        dx = (B @ z_).reshape(-1, 3)
        F = (dFdz @ z_).reshape(-1, 3, 3) + eye3
        p = (dx + pts)[:, 1] - floor_h
        h_floor = jnp.zeros((pts.shape[0], 3, 3)).at[:, 1, 1].set(
            jnp.where(p < 0, 2.0 * floor_pen, 0.0))
        h_mat = neohookean_hessian(mu, lam, F, vols[:, None])
        H = hess_reduction(B, h_floor) + hess_reduction(dFdz, h_mat)
        return BMB + dt * dt * H + 1e-4 * jnp.eye(B.shape[1])

    z_new = newtons_method(z, energy, grad, hess, nm_max_iters=newton_iters,
                           max_ls_steps=5)
    return z_new, (z_new - z) / dt


def sharded_scene_batch_step(mesh, num_scenes, num_qp=32, num_handles=3,
                             dt=0.03):
    """Run one sim step for ``num_scenes`` independent scenes, scene axis
    sharded over the mesh's 'dp' axis. Returns the (num_scenes, D) new DOFs."""
    consts = [_mini_scene_constants(num_qp, num_handles, seed=s)
              for s in range(num_scenes)]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *consts)
    d = 12 * num_handles
    z = jnp.zeros((num_scenes, d))
    z_prev = jnp.zeros_like(z)
    z_dot = jnp.zeros_like(z)

    sharding = NamedSharding(mesh, P("dp"))
    stacked = jax.device_put(stacked, NamedSharding(mesh, P("dp")))
    z = jax.device_put(z, sharding)
    z_prev = jax.device_put(z_prev, sharding)
    z_dot = jax.device_put(z_dot, sharding)

    @jax.jit
    def batch_step(c, z_, zp, zd):
        step = functools.partial(_functional_sim_step, dt=dt)
        return jax.vmap(step)(c, z_, zp, zd)[0]

    return batch_step(stacked, z, z_prev, z_dot)
