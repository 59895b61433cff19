"""End-to-end differentiable SDF shape optimization (BASELINE config 4):
optimize a scalar field so the FlexiCubes / marching-tetrahedra extracted
mesh matches a target sphere — the DMTet/FlexiCubes tutorial inner loop.

The topology (sign structure) is host-precomputed; the per-step geometry is
differentiable, so the optimization alternates jitted gradient steps with
host topology refreshes — the TPU-native split of the reference's loop."""

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions import FlexiCubes
from kaolin_tpu.ops.conversions.tetmesh import marching_tetrahedra_fixed

RES = 12


def _target_sdf_sphere(points, r=0.35):
    return jnp.linalg.norm(points, axis=-1) - r


def _sample_loss(verts, mask, target_r):
    """Mean |(|v| - r)| over valid extracted vertices: 0 when the surface
    lies exactly on the target sphere."""
    d = jnp.abs(jnp.linalg.norm(verts, axis=-1) - target_r)
    w = mask.astype(verts.dtype)
    return jnp.sum(d * w) / jnp.clip(jnp.sum(w), 1.0, None)


def test_flexicubes_sdf_optimization_reduces_loss():
    fc = FlexiCubes()
    grid_verts, cube_idx = fc.construct_voxel_grid(RES)
    # init: ellipsoid (wrong shape), optimize toward a sphere of r=0.35
    scale = jnp.asarray([1.6, 0.7, 1.0])
    sdf = jnp.linalg.norm(jnp.asarray(grid_verts) * scale, axis=-1) - 0.35
    target_r = 0.35

    def loss_fn(sdf, topology):
        out = fc(jnp.asarray(grid_verts), sdf, cube_idx, RES,
                 topology=topology, training=True)
        verts, faces, reg = out[0], out[1], out[2]
        mask = jnp.ones(verts.shape[0], dtype=bool) if verts.ndim == 2 \
            else None
        return _sample_loss(verts, mask, target_r) + 0.01 * jnp.mean(reg)

    import optax
    opt = optax.adam(2e-2)
    opt_state = opt.init(sdf)
    losses = []
    for it in range(25):
        topology = fc.precompute_topology(np.asarray(sdf), cube_idx, RES)
        val, g = jax.value_and_grad(loss_fn)(sdf, topology)
        losses.append(float(val))
        updates, opt_state = opt.update(g, opt_state)
        sdf = optax.apply_updates(sdf, updates)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses

    # final surface is near the target sphere
    topology = fc.precompute_topology(np.asarray(sdf), cube_idx, RES)
    verts = fc(jnp.asarray(grid_verts), sdf, cube_idx, RES,
               topology=topology)[0]
    r = np.linalg.norm(np.asarray(verts), axis=-1)
    assert abs(np.median(r) - target_r) < 0.03


def test_dmtet_sdf_optimization_reduces_loss():
    # tet grid from the cube lattice: split each cube into 5 tets
    g = np.linspace(-0.5, 0.5, RES + 1)
    gx, gy, gz = np.meshgrid(g, g, g, indexing="ij")
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)

    def vid(i, j, k):
        return (i * (RES + 1) + j) * (RES + 1) + k

    tets = []
    for i in range(RES):
        for j in range(RES):
            for k in range(RES):
                c = [vid(i + a, j + b, k + d) for a in (0, 1)
                     for b in (0, 1) for d in (0, 1)]
                # 5-tet decomposition of the cube
                tets += [[c[0], c[1], c[2], c[4]], [c[1], c[2], c[3], c[7]],
                         [c[1], c[4], c[5], c[7]], [c[2], c[4], c[6], c[7]],
                         [c[1], c[2], c[4], c[7]]]
    tets = np.asarray(tets, np.int32)
    verts_j = jnp.asarray(verts)

    scale = jnp.asarray([1.5, 0.8, 1.0])
    sdf = jnp.linalg.norm(verts_j * scale, axis=-1) - 0.3
    target_r = 0.3

    @jax.jit
    def loss_fn(sdf):
        out = marching_tetrahedra_fixed(verts_j, tets, sdf)
        return _sample_loss(out["verts"], out["vert_mask"], target_r)

    import optax
    opt = optax.adam(2e-2)
    opt_state = opt.init(sdf)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    losses = []
    for it in range(40):
        val, grad = grad_fn(sdf)
        losses.append(float(val))
        updates, opt_state = opt.update(grad, opt_state)
        sdf = optax.apply_updates(sdf, updates)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses
