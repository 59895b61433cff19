"""Dense (gather-free) FlexiCubes path vs the capacity-compacted jit path:
same triangles, same regularizer sum, same gradients — with no
data-dependent gathers/scatters anywhere in the dense program."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops.conversions import FlexiCubes
from kaolin_tpu.ops.conversions.flexicubes.dense import dense_extract

RES = 12


@pytest.fixture(scope="module")
def grid():
    fc = FlexiCubes()
    grid_verts, cube_idx = fc.construct_voxel_grid(RES)
    return fc, jnp.asarray(grid_verts), cube_idx


def _sdfs(grid_verts):
    v = np.asarray(grid_verts)
    yield np.linalg.norm(v, axis=-1) - 0.35
    yield np.linalg.norm(v * [1.6, 0.7, 1.0], axis=-1) - 0.35
    rng = np.random.RandomState(0)
    yield (np.linalg.norm(v, axis=-1) - 0.3
           + 0.08 * np.sin(7 * v[:, 0]) * np.cos(5 * v[:, 1])
           + 0.02 * rng.randn(v.shape[0]))


def _tris(verts, faces, mask=None):
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    if mask is not None:
        faces = faces[np.asarray(mask)]
    return verts[faces]                                     # (F, 3, 3)


def assert_same_triangles(a, b, atol=1e-5):
    """Order/permutation-robust triangle-set equality: the two paths compute
    identical geometry with different float arithmetic, so lexsort-based
    canonicalization flips at rounding boundaries — match by centroid
    nearest-neighbor instead, then compare matched triangles as vertex sets."""
    assert a.shape == b.shape, (a.shape, b.shape)
    if len(a) == 0:
        return
    ca = a.mean(axis=1)
    cb = b.mean(axis=1)
    d = np.linalg.norm(ca[:, None] - cb[None], axis=-1)     # (F, F)
    j = np.argmin(d, axis=1)
    assert len(np.unique(j)) == len(j), "centroid matching not one-to-one"
    np.testing.assert_allclose(d[np.arange(len(a)), j], 0, atol=atol)
    bm = b[j]
    # vertex-set comparison per matched triangle
    dv = np.linalg.norm(a[:, :, None] - bm[:, None], axis=-1)  # (F, 3, 3)
    assert (dv.min(axis=2) < atol).all()


@pytest.mark.parametrize("training", [False, True])
def test_dense_matches_jit_extract(grid, training):
    fc, grid_verts, cube_idx = grid
    for i, sdf_np in enumerate(_sdfs(grid_verts)):
        sdf = jnp.asarray(sdf_np, jnp.float32)
        jv, jf, jreg, jaux = fc.jit_extract(grid_verts, sdf, cube_idx, RES,
                                            training=training)
        dv, df, dreg, daux = dense_extract(sdf, RES, training=training)
        assert_same_triangles(_tris(dv, df, daux["face_mask"]),
                              _tris(jv, jf, jaux["face_mask"]))
        np.testing.assert_allclose(float(jnp.sum(dreg)), float(jnp.sum(jreg)),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_array_equal(
            int(daux["counts"]["surf_cubes"]),
            int(jaux["counts"]["surf_cubes"]))
        np.testing.assert_array_equal(int(daux["counts"]["quads"]),
                                      int(jaux["counts"]["quads"]))


def test_dense_with_weights_matches_jit(grid):
    fc, grid_verts, cube_idx = grid
    sdf = jnp.asarray(np.linalg.norm(np.asarray(grid_verts) * [1.3, 0.8, 1.0],
                                     axis=-1) - 0.33, jnp.float32)
    rng = np.random.RandomState(1)
    n = cube_idx.shape[0]
    beta = jnp.asarray(rng.randn(n, 12).astype(np.float32) * 0.5)
    alpha = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.5)
    gamma = jnp.asarray(rng.randn(n).astype(np.float32))

    jv, jf, _, jaux = fc.jit_extract(grid_verts, sdf, cube_idx, RES,
                                     beta=beta, alpha=alpha, gamma_f=gamma,
                                     training=True)
    dv, df, _, daux = dense_extract(sdf, RES, beta=beta, alpha=alpha,
                                    gamma_f=gamma, training=True)
    assert_same_triangles(_tris(dv, df, daux["face_mask"]),
                          _tris(jv, jf, jaux["face_mask"]))


def test_dense_gradients_match_jit(grid):
    fc, grid_verts, cube_idx = grid
    sdf0 = jnp.asarray(np.linalg.norm(np.asarray(grid_verts), axis=-1) - 0.35,
                       jnp.float32)

    # order-invariant scalar loss: total squared distance of face centroids
    def jit_loss(sdf):
        v, f, _, aux = fc.jit_extract(grid_verts, sdf, cube_idx, RES,
                                      training=True)
        cent = jnp.mean(v[f], axis=1)
        return jnp.sum(jnp.where(aux["face_mask"], jnp.sum(cent ** 2, -1),
                                 0.0))

    def dense_loss(sdf):
        v, f, _, aux = dense_extract(sdf, RES, training=True)
        cent = jnp.mean(v[f], axis=1)
        return jnp.sum(jnp.where(aux["face_mask"], jnp.sum(cent ** 2, -1),
                                 0.0))

    g_jit = jax.grad(jax.jit(jit_loss))(sdf0)
    g_dense = jax.grad(jax.jit(dense_loss))(sdf0)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_jit),
                               rtol=1e-3, atol=1e-5)


def test_dense_vertexmask_loss_grads(grid):
    """The bench-style loss (masked dense vertices + reg) is differentiable
    and finite, and topology changes don't retrigger compilation."""
    fc, grid_verts, cube_idx = grid

    @jax.jit
    def loss(sdf):
        v, _, reg, aux = dense_extract(sdf, RES, training=True)
        vm = aux["vertex_mask"]
        d = jnp.abs(jnp.linalg.norm(v, axis=-1) - 0.35) * vm
        return (jnp.sum(d) / jnp.clip(jnp.sum(vm), 1, None)
                + 0.01 * jnp.sum(reg))

    sdf = jnp.asarray(np.linalg.norm(np.asarray(grid_verts), axis=-1) - 0.35,
                      jnp.float32)
    v1, g1 = jax.value_and_grad(loss)(sdf)
    v2, g2 = jax.value_and_grad(loss)(sdf * 0.7 + 0.02)  # different topology
    for v, g in ((v1, g1), (v2, g2)):
        assert np.isfinite(float(v))
        assert np.all(np.isfinite(np.asarray(g)))
