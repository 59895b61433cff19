import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.metrics import pointcloud as pc


def _naive_sided(p1, p2):
    d = np.sum((p1[:, None, :] - p2[None, :, :]) ** 2, axis=-1)
    return d.min(axis=1), d.argmin(axis=1)


@pytest.fixture
def clouds(key):
    k1, k2 = jax.random.split(key)
    p1 = jax.random.normal(k1, (2, 100, 3))
    p2 = jax.random.normal(k2, (2, 173, 3))
    return p1, p2


def test_sided_distance_matches_naive(clouds):
    p1, p2 = clouds
    dist, idx = pc.sided_distance(p1, p2)
    for b in range(2):
        nd, ni = _naive_sided(np.asarray(p1[b]), np.asarray(p2[b]))
        np.testing.assert_allclose(dist[b], nd, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(idx[b], ni)


def test_sided_distance_tiling(clouds, key):
    """Exercise multiple p2 tiles."""
    p1, _ = clouds
    p2 = jax.random.normal(key, (2, 5000, 3))
    dist, idx = pc.sided_distance(p1, p2)
    nd, ni = _naive_sided(np.asarray(p1[0]), np.asarray(p2[0]))
    np.testing.assert_allclose(dist[0], nd, rtol=1e-4, atol=1e-5)


def test_chamfer_symmetric(clouds):
    p1, p2 = clouds
    c12 = pc.chamfer_distance(p1, p2)
    c21 = pc.chamfer_distance(p2, p1)
    np.testing.assert_allclose(c12, c21, rtol=1e-5)
    assert c12.shape == (2,)


def test_chamfer_zero_self(clouds):
    p1, _ = clouds
    np.testing.assert_allclose(pc.chamfer_distance(p1, p1), 0.0, atol=1e-6)


def test_chamfer_grad(clouds):
    p1, p2 = clouds

    def loss(a, b):
        return jnp.sum(pc.chamfer_distance(a, b))

    g1, g2 = jax.grad(loss, argnums=(0, 1))(p1, p2)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()
    # numerical check on one coordinate
    eps = 1e-3
    p1p = p1.at[0, 0, 0].add(eps)
    p1m = p1.at[0, 0, 0].add(-eps)
    num = (loss(p1p, p2) - loss(p1m, p2)) / (2 * eps)
    np.testing.assert_allclose(g1[0, 0, 0], num, rtol=1e-2, atol=1e-3)


def test_f_score(clouds):
    p1, p2 = clouds
    f_same = pc.f_score(p1, p1, radius=0.01)
    np.testing.assert_allclose(f_same, 1.0, atol=1e-5)
    f_diff = pc.f_score(p1, p2, radius=0.01)
    assert np.all(np.asarray(f_diff) < 0.5)
