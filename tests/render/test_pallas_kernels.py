"""Pallas TPU kernel parity tests (interpret mode on CPU).

The Pallas kernels must match their XLA formulations exactly (search) or to
float tolerance (soft mask — the lane product runs as exp∘Σlog in-kernel).
Unlike the capacity-bounded XLA paths, the kernels loop over ALL faces with
chunk-occupancy skipping, so they are exact at any face density — including
scenes that overflow the XLA tile capacity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.render.mesh.dibr import (
    _soft_mask_unbatched,
    _soft_raw_binned,
    _soft_raw_pallas,
    dibr_rasterization,
)
from kaolin_tpu.render.mesh.rasterization import rasterize


def _random_faces(seed, f, scale=0.3, shift=0.0):
    rng = np.random.RandomState(seed)
    tri = rng.randn(f, 3, 3).astype(np.float32) * scale
    tri[..., :2] += shift
    return tri


@pytest.mark.parametrize("f,h,w,tile_px", [(6, 32, 32, 16), (50, 64, 64, 16),
                                           (200, 128, 64, 32)])
def test_soft_mask_pallas_matches_xla_binned(f, h, w, tile_px):
    tri = _random_faces(0, f)
    fvi = jnp.asarray(tri[..., :2]) * 1000.0
    args = (7000.0, 0.02, 1000.0, h, w, (tile_px, f))
    out_x = _soft_raw_binned(fvi, *args)
    out_p = _soft_raw_pallas(fvi, *args)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-5)

    def lx(v):
        return jnp.sum(_soft_raw_binned(v, *args) ** 2)

    def lp(v):
        return jnp.sum(_soft_raw_pallas(v, *args) ** 2)

    gx = jax.grad(lx)(fvi)
    gp = jax.grad(lp)(fvi)
    scale = float(jnp.max(jnp.abs(gx))) + 1e-9
    np.testing.assert_allclose(np.asarray(gp) / scale,
                               np.asarray(gx) / scale, atol=2e-5)


def test_soft_mask_pallas_exact_where_xla_cap_drops():
    """A scene that overflows the XLA per-tile capacity: the Pallas kernel
    still matches the all-faces oracle."""
    f, h, w = 200, 128, 64
    tri = _random_faces(3, f)
    fvi = jnp.asarray(tri[..., :2]) * 1000.0
    fidx = jnp.full((h, w), -1, jnp.int32)
    oracle = _soft_mask_unbatched(fvi, fidx, 7000.0, 0.02, 1000.0, h, w)
    capped = _soft_raw_binned(fvi, 7000.0, 0.02, 1000.0, h, w, (32, 64))
    pallas = _soft_raw_pallas(fvi, 7000.0, 0.02, 1000.0, h, w, (32, 64))
    assert float(jnp.max(jnp.abs(oracle - capped))) > 0.1, \
        "test scene should overflow the capped XLA path"
    np.testing.assert_allclose(np.asarray(pallas), np.asarray(oracle),
                               atol=1e-5)


@pytest.mark.parametrize("seed", [0, 1])
def test_search_pallas_matches_brute_exactly(seed):
    rng = np.random.RandomState(seed)
    b, f, h, w = 2, 1200, 64, 64
    tri = rng.randn(b, f, 3, 3).astype(np.float32) * 0.4
    fvz = jnp.asarray(tri[..., 2] - 2.0)
    fvi = jnp.asarray(tri[..., :2])
    feats = jnp.asarray(rng.rand(b, f, 3, 4).astype(np.float32))
    valid = jnp.asarray(rng.rand(b, f) > 0.2)

    img_b, fidx_b = rasterize(h, w, fvz, fvi, feats, valid_faces=valid,
                              backend="brute", impl="xla")
    img_p, fidx_p = rasterize(h, w, fvz, fvi, feats, valid_faces=valid,
                              impl="pallas")
    np.testing.assert_array_equal(np.asarray(fidx_b), np.asarray(fidx_p))
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_p),
                               atol=1e-6)

    def loss(fvi_, feats_, **kw):
        img, _ = rasterize(h, w, fvz, fvi_, feats_, valid_faces=valid, **kw)
        return jnp.sum(img ** 2)

    gb = jax.grad(loss, argnums=(0, 1))(fvi, feats, backend="brute",
                                        impl="xla")
    gp = jax.grad(loss, argnums=(0, 1))(fvi, feats, impl="pallas")
    np.testing.assert_allclose(np.asarray(gb[0]), np.asarray(gp[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb[1]), np.asarray(gp[1]),
                               atol=1e-5)


def test_dibr_rasterization_pallas_pipeline():
    """Full DIB-R through the Pallas path on a small sphere cap."""
    rng = np.random.RandomState(0)
    f, h, w = 60, 64, 64
    tri = _random_faces(0, f, scale=0.2)
    fvz = jnp.asarray(tri[..., 2] - 2.0)[None]
    fvi = jnp.asarray(tri[..., :2])[None]
    feats = jnp.asarray(rng.rand(1, f, 3, 3).astype(np.float32))
    nz = jnp.ones((1, f), jnp.float32)

    def loss(fvi_, impl):
        img, sm, _ = dibr_rasterization(h, w, fvz, fvi_, feats, nz)
        return jnp.sum(img ** 2) + jnp.sum(sm ** 2)

    gx = jax.grad(lambda v: loss(v, "xla"))(fvi)
    assert np.all(np.isfinite(np.asarray(gx)))
