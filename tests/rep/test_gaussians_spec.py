"""PointSamples / GaussianSplatModel behavioral spec, ported from the
reference matrix (ref ``tests/python/kaolin/rep/test_gaussians.py``):
constructors, SH-degree helpers, masked get/set, cat (incl. baked
transforms, mismatched attrs, permissive mode), as_transformed consistency,
and float dtype conversion.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.rep import GaussianSplatModel, PointSamples


def _rng_model(seed=0, n=20, sh_deg=1, transform=None):
    rng = np.random.RandomState(seed)
    q = rng.randn(n, 4)
    q = q / np.linalg.norm(q, axis=1, keepdims=True)
    return GaussianSplatModel(
        positions=jnp.asarray(rng.randn(n, 3), jnp.float32),
        orientations=jnp.asarray(q, jnp.float32),
        scales=jnp.asarray(rng.rand(n, 3) + 0.1, jnp.float32),
        opacities=jnp.asarray(rng.rand(n), jnp.float32),
        sh_coeff=jnp.asarray(rng.randn(n, (sh_deg + 1) ** 2, 3), jnp.float32),
        transform=transform)


def _translation(t):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = t
    return jnp.asarray(m)


def test_default_construction_fills_identity_attrs():
    g = GaussianSplatModel(positions=jnp.zeros((5, 3)))
    assert g.orientations.shape == (5, 4)
    np.testing.assert_allclose(np.asarray(g.orientations[:, 0]), 1.0)
    assert g.scales.shape == (5, 3)
    assert g.opacities.shape == (5,)
    assert g.sh_degree == 0


def test_sh_degree_helpers():
    assert GaussianSplatModel.compute_sh_degree(1) == 0
    assert GaussianSplatModel.compute_sh_degree(4) == 1
    assert GaussianSplatModel.compute_sh_degree(16) == 3
    assert GaussianSplatModel.compute_num_sh_coeff(2) == 9
    with pytest.raises(ValueError):
        GaussianSplatModel.compute_sh_degree(5)


def test_getitem_selects_all_point_attributes():
    g = _rng_model(n=10)
    mask = np.zeros(10, bool)
    mask[[1, 4, 7]] = True
    sub = g[mask]
    assert len(sub) == 3
    np.testing.assert_allclose(np.asarray(sub.positions),
                               np.asarray(g.positions)[mask])
    np.testing.assert_allclose(np.asarray(sub.opacities),
                               np.asarray(g.opacities)[mask])
    np.testing.assert_allclose(np.asarray(sub.sh_coeff),
                               np.asarray(g.sh_coeff)[mask])
    assert sub.sh_degree == g.sh_degree


def test_setitem_writes_back():
    g = _rng_model(n=10)
    mask = np.zeros(10, bool)
    mask[[0, 3]] = True
    sub = g[mask]
    shifted = GaussianSplatModel(
        positions=sub.positions + 1.0, orientations=sub.orientations,
        scales=sub.scales, opacities=sub.opacities, sh_coeff=sub.sh_coeff)
    g[mask] = shifted
    np.testing.assert_allclose(np.asarray(g.positions[0]),
                               np.asarray(shifted.positions[0]))
    np.testing.assert_allclose(np.asarray(g.positions[1]),
                               np.asarray(_rng_model(n=10).positions[1]))


def test_cat_concatenates_points():
    a, b = _rng_model(0, n=4), _rng_model(1, n=6)
    out = GaussianSplatModel.cat([a, b])
    assert len(out) == 10
    np.testing.assert_allclose(np.asarray(out.positions[:4]),
                               np.asarray(a.positions))
    np.testing.assert_allclose(np.asarray(out.opacities[4:]),
                               np.asarray(b.opacities))


def test_cat_bakes_stored_transforms():
    """Ref :383: stored transforms are applied before concatenation and the
    result has transform=None."""
    a = _rng_model(0, n=4, transform=_translation([1.0, 0.0, 0.0]))
    b = _rng_model(1, n=3)
    out = GaussianSplatModel.cat([a, b])
    assert out.transform is None
    np.testing.assert_allclose(
        np.asarray(out.positions[:4]),
        np.asarray(a.positions) + np.array([1.0, 0.0, 0.0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.positions[4:]),
                               np.asarray(b.positions))


def test_cat_empty_raises():
    with pytest.raises(ValueError):
        GaussianSplatModel.cat([])


def test_cat_single_returns_model():
    a = _rng_model(0, n=4)
    assert GaussianSplatModel.cat([a]) is a


def test_point_samples_cat_mismatched_features():
    a = PointSamples(positions=jnp.zeros((3, 3)),
                     features=jnp.ones((3, 2)))
    b = PointSamples(positions=jnp.ones((2, 3)))
    with pytest.raises(ValueError):
        PointSamples.cat([a, b])
    out = PointSamples.cat([a, b], skip_errors=True)
    assert len(out) == 5
    assert getattr(out, "features", None) is None


def test_as_transformed_composition():
    """as_transformed(extra) == bake(extra @ stored)."""
    t1 = _translation([0.0, 2.0, 0.0])
    g = _rng_model(0, n=6, transform=t1)
    t2 = _translation([1.0, 0.0, 0.0])
    out = g.as_transformed(t2)
    want = np.asarray(g.positions) + np.array([1.0, 2.0, 0.0])
    np.testing.assert_allclose(np.asarray(out.positions), want, rtol=1e-6)
    # scales/opacities untouched by a pure translation
    np.testing.assert_allclose(np.asarray(out.scales), np.asarray(g.scales),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.opacities),
                               np.asarray(g.opacities))


def test_float_tensors_to():
    g = _rng_model(0, n=4)
    out = g.float_tensors_to(jnp.float16)
    assert out.positions.dtype == jnp.float16
    assert out.sh_coeff.dtype == jnp.float16
