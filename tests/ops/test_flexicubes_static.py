"""The fully on-device static-capacity FlexiCubes path (jit_extract) vs the
host-topology path: same triangle geometry, same regularizer, same gradients
— with static shapes so a whole SDF-opt iteration compiles once."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops.conversions import FlexiCubes

RES = 12


@pytest.fixture(scope="module")
def grid():
    fc = FlexiCubes()
    grid_verts, cube_idx = fc.construct_voxel_grid(RES)
    return fc, jnp.asarray(grid_verts), cube_idx


def _sdfs(grid_verts):
    v = np.asarray(grid_verts)
    yield np.linalg.norm(v, axis=-1) - 0.35                       # sphere
    yield np.linalg.norm(v * [1.6, 0.7, 1.0], axis=-1) - 0.35     # ellipsoid
    rng = np.random.RandomState(0)
    yield (np.linalg.norm(v, axis=-1) - 0.3
           + 0.08 * np.sin(7 * v[:, 0]) * np.cos(5 * v[:, 1])
           + 0.02 * rng.randn(v.shape[0]))                        # bumpy


def _canon_tris(verts, faces, mask=None):
    verts = np.asarray(verts)
    faces = np.asarray(faces)
    if mask is not None:
        faces = faces[np.asarray(mask)]
    tris = verts[faces]                                           # (F, 3, 3)
    # canonicalize: sort the 3 verts of each tri lexicographically, then
    # sort the triangles
    tris = np.array([t[np.lexsort(t.T[::-1])] for t in tris])
    order = np.lexsort(tris.reshape(len(tris), -1).T[::-1])
    return tris[order]


@pytest.mark.parametrize("training", [False, True])
def test_static_matches_host_topology(grid, training):
    fc, grid_verts, cube_idx = grid
    for i, sdf_np in enumerate(_sdfs(grid_verts)):
        sdf = jnp.asarray(sdf_np, jnp.float32)
        topo = fc.precompute_topology(np.asarray(sdf), cube_idx, RES)
        hv, hf, hreg = fc(grid_verts, sdf, cube_idx, RES, topology=topo,
                          training=training)[:3]
        sv, sf, sreg, aux = fc.jit_extract(grid_verts, sdf, cube_idx, RES,
                                           training=training)
        c = aux["counts"]
        assert int(c["surf_cubes"]) <= aux["capacities"]["surf_cubes"]
        assert int(c["quads"]) <= aux["capacities"]["quads"]
        ht = _canon_tris(hv, hf)
        st = _canon_tris(sv, sf, aux["face_mask"])
        assert ht.shape == st.shape, (i, ht.shape, st.shape)
        np.testing.assert_allclose(st, ht, atol=1e-5), i
        # regularizer sum matches (static pads with exact zeros)
        np.testing.assert_allclose(float(jnp.sum(sreg)), float(jnp.sum(hreg)),
                                   rtol=1e-4, atol=1e-6)


def test_static_with_weights_matches_host(grid):
    fc, grid_verts, cube_idx = grid
    sdf = jnp.asarray(np.linalg.norm(np.asarray(grid_verts) * [1.3, 0.8, 1.0],
                                     axis=-1) - 0.33, jnp.float32)
    rng = np.random.RandomState(1)
    n = cube_idx.shape[0]
    beta = jnp.asarray(rng.randn(n, 12).astype(np.float32) * 0.5)
    alpha = jnp.asarray(rng.randn(n, 8).astype(np.float32) * 0.5)
    gamma = jnp.asarray(rng.randn(n).astype(np.float32))

    topo = fc.precompute_topology(np.asarray(sdf), cube_idx, RES)
    hv, hf, _ = fc(grid_verts, sdf, cube_idx, RES, topology=topo,
                   beta=beta, alpha=alpha, gamma_f=gamma, training=True)[:3]
    sv, sf, _, aux = fc.jit_extract(grid_verts, sdf, cube_idx, RES,
                                    beta=beta, alpha=alpha, gamma_f=gamma,
                                    training=True)
    np.testing.assert_allclose(_canon_tris(sv, sf, aux["face_mask"]),
                               _canon_tris(hv, hf), atol=1e-5)


def test_static_gradients_match_host(grid):
    fc, grid_verts, cube_idx = grid
    sdf0 = jnp.asarray(np.linalg.norm(np.asarray(grid_verts), axis=-1) - 0.35,
                       jnp.float32)
    topo = fc.precompute_topology(np.asarray(sdf0), cube_idx, RES)

    # identical scalar loss on both paths: sum over REAL surface area-ish
    # quantity that is invariant to vertex ordering — total squared distance
    # of face centroids from origin
    def host_loss(sdf):
        v, f, _ = fc(grid_verts, sdf, cube_idx, RES, topology=topo,
                     training=True)[:3]
        cent = jnp.mean(v[f], axis=1)
        return jnp.sum(cent ** 2)

    def static_loss(sdf):
        v, f, _, aux = fc.jit_extract(grid_verts, sdf, cube_idx, RES,
                                      training=True)
        cent = jnp.mean(v[f], axis=1)
        return jnp.sum(jnp.where(aux["face_mask"], jnp.sum(cent ** 2, -1),
                                 0.0))

    g_host = jax.grad(host_loss)(sdf0)
    g_static = jax.grad(jax.jit(static_loss))(sdf0)
    np.testing.assert_allclose(np.asarray(g_static), np.asarray(g_host),
                               rtol=1e-3, atol=1e-5)


def test_static_is_jittable_and_stable_across_topology_changes(grid):
    """One compiled function serves different sign patterns (the whole point:
    no recompilation when the SDF topology changes during optimization)."""
    fc, grid_verts, cube_idx = grid

    @jax.jit
    def extract_count(sdf):
        _, _, _, aux = fc.jit_extract(grid_verts, sdf, cube_idx, RES)
        return aux["counts"]["surf_cubes"], aux["counts"]["quads"]

    counts = []
    for sdf_np in _sdfs(grid_verts):
        counts.append(tuple(int(x) for x in
                            extract_count(jnp.asarray(sdf_np, jnp.float32))))
    assert len({c for c in counts}) > 1  # genuinely different topologies
    assert all(c[0] > 0 and c[1] > 0 for c in counts)
