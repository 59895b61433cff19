"""Spherical-gaussian / spherical-harmonic lighting parity vs the reference's
pure-torch implementations (``kaolin/render/lighting/sg.py``, ``sh.py``)."""

import numpy as np
import jax.numpy as jnp
import pytest
import sys

sys.path.insert(0, "tests")
from reference_shim import import_reference_kaolin  # noqa: E402

from kaolin_tpu.render.lighting import (  # noqa: E402
    cosine_lobe_sg,
    project_onto_sh9,
    sg_diffuse_fitted,
    sg_diffuse_inner_product,
    sg_from_sun,
    sg_irradiance_fitted,
    sg_irradiance_inner_product,
    sg_warp_specular_term,
    sh9_diffuse,
    sh9_irradiance,
    unbatched_reduced_sg_inner_product,
    unbatched_sg_inner_product,
)


@pytest.fixture(scope="module")
def ref():
    return import_reference_kaolin()


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    num_sg = 4
    n = 32
    amplitude = np.abs(rng.rand(num_sg, 3).astype(np.float32)) * 3
    direction = rng.randn(num_sg, 3).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=1, keepdims=True)
    sharpness = (rng.rand(num_sg).astype(np.float32) * 8 + 1)
    normals = rng.randn(n, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    albedo = rng.rand(n, 3).astype(np.float32)
    roughness = rng.rand(n).astype(np.float32) * 0.8 + 0.1
    view = rng.randn(n, 3).astype(np.float32)
    view /= np.linalg.norm(view, axis=1, keepdims=True)
    return dict(amplitude=amplitude, direction=direction,
                sharpness=sharpness, normals=normals, albedo=albedo,
                roughness=roughness, view=view)


def _t(x):
    import torch
    return torch.as_tensor(np.asarray(x))


def test_sg_inner_product_parity(ref, data):
    d = data
    mine = unbatched_sg_inner_product(
        jnp.asarray(d["amplitude"]), jnp.asarray(d["direction"]),
        jnp.asarray(d["sharpness"]), jnp.asarray(d["amplitude"][::-1].copy()),
        jnp.asarray(d["direction"][::-1].copy()),
        jnp.asarray(d["sharpness"][::-1].copy()))
    want = ref.render.lighting.sg.unbatched_sg_inner_product(
        _t(d["amplitude"]), _t(d["direction"]), _t(d["sharpness"]),
        _t(d["amplitude"][::-1].copy()), _t(d["direction"][::-1].copy()),
        _t(d["sharpness"][::-1].copy()))
    np.testing.assert_allclose(np.asarray(mine), want.numpy(), rtol=2e-4,
                               atol=1e-5)


def test_sg_reduced_inner_product_parity(ref, data):
    d = data
    # <8 'other' lobes keeps the reference on its pure-torch branch (the
    # fused path calls the CUDA kernel, unavailable under the CPU shim)
    other_amp = np.abs(np.random.RandomState(1).rand(6, 3)).astype(
        np.float32)
    other_dir = data["normals"][:6]
    other_sharp = np.full((6,), 4.0, np.float32)
    mine = unbatched_reduced_sg_inner_product(
        jnp.asarray(d["amplitude"]), jnp.asarray(d["direction"]),
        jnp.asarray(d["sharpness"]), jnp.asarray(other_amp),
        jnp.asarray(other_dir), jnp.asarray(other_sharp))
    want = ref.render.lighting.sg.unbatched_reduced_sg_inner_product(
        _t(d["amplitude"]), _t(d["direction"]), _t(d["sharpness"]),
        _t(other_amp), _t(other_dir), _t(other_sharp))
    np.testing.assert_allclose(np.asarray(mine), want.numpy(), rtol=2e-4,
                               atol=1e-5)


def test_sg_irradiance_parity(ref, data):
    d = data
    args = (jnp.asarray(d["amplitude"]), jnp.asarray(d["direction"]),
            jnp.asarray(d["sharpness"]), jnp.asarray(d["normals"]))
    targs = (_t(d["amplitude"]), _t(d["direction"]), _t(d["sharpness"]),
             _t(d["normals"]))
    np.testing.assert_allclose(
        np.asarray(sg_irradiance_fitted(*args)),
        ref.render.lighting.sg_irradiance_fitted(*targs).numpy(),
        rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sg_irradiance_inner_product(*args)),
        ref.render.lighting.sg_irradiance_inner_product(*targs).numpy(),
        rtol=2e-4, atol=1e-5)


def test_sg_diffuse_and_specular_parity(ref, data):
    d = data
    np.testing.assert_allclose(
        np.asarray(sg_diffuse_fitted(
            jnp.asarray(d["amplitude"]), jnp.asarray(d["direction"]),
            jnp.asarray(d["sharpness"]), jnp.asarray(d["normals"]),
            jnp.asarray(d["albedo"]))),
        ref.render.lighting.sg_diffuse_fitted(
            _t(d["amplitude"]), _t(d["direction"]), _t(d["sharpness"]),
            _t(d["normals"]), _t(d["albedo"])).numpy(),
        rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sg_diffuse_inner_product(
            jnp.asarray(d["amplitude"]), jnp.asarray(d["direction"]),
            jnp.asarray(d["sharpness"]), jnp.asarray(d["normals"]),
            jnp.asarray(d["albedo"]))),
        ref.render.lighting.sg_diffuse_inner_product(
            _t(d["amplitude"]), _t(d["direction"]), _t(d["sharpness"]),
            _t(d["normals"]), _t(d["albedo"])).numpy(),
        rtol=2e-4, atol=1e-5)
    spec_albedo = data["albedo"][:, ::-1].copy()
    np.testing.assert_allclose(
        np.asarray(sg_warp_specular_term(
            jnp.asarray(d["amplitude"]), jnp.asarray(d["direction"]),
            jnp.asarray(d["sharpness"]), jnp.asarray(d["normals"]),
            jnp.asarray(d["roughness"]), jnp.asarray(d["view"]),
            jnp.asarray(spec_albedo))),
        ref.render.lighting.sg_warp_specular_term(
            _t(d["amplitude"]), _t(d["direction"]), _t(d["sharpness"]),
            _t(d["normals"]), _t(d["roughness"]), _t(d["view"]),
            _t(spec_albedo)).numpy(),
        rtol=2e-3, atol=1e-4)


def test_sg_from_sun_and_cosine_lobe_parity(ref):
    direction = np.array([[0.3, -0.8, 0.52]], np.float32)
    direction = direction / np.linalg.norm(direction)
    strength = np.array([2.5], np.float32)
    angle = np.array([0.7], np.float32)
    color = np.array([[1.0, 0.9, 0.7]], np.float32)
    mine = sg_from_sun(jnp.asarray(direction), jnp.asarray(strength),
                       jnp.asarray(angle), jnp.asarray(color))
    want = ref.render.lighting.sg_from_sun(
        _t(direction), _t(strength), _t(angle), _t(color))
    for m, w in zip(mine, want):
        np.testing.assert_allclose(np.asarray(m),
                                   np.asarray(w).reshape(np.asarray(m).shape),
                                   rtol=1e-5)
    lobe_m = cosine_lobe_sg(jnp.asarray(direction))
    lobe_w = ref.render.lighting.cosine_lobe_sg(_t(direction))
    for m, w in zip(lobe_m, lobe_w):
        np.testing.assert_allclose(np.asarray(m),
                                   np.asarray(w).reshape(np.asarray(m).shape),
                                   rtol=1e-5)


def test_sh9_parity(ref, data):
    d = data
    np.testing.assert_allclose(
        np.asarray(project_onto_sh9(jnp.asarray(d["normals"]))),
        ref.render.lighting.project_onto_sh9(_t(d["normals"])).numpy(),
        rtol=1e-5, atol=1e-6)
    lights = jnp.asarray(np.random.RandomState(2).rand(9).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(sh9_irradiance(lights, jnp.asarray(d["normals"]))),
        ref.render.lighting.sh9_irradiance(_t(lights),
                                           _t(d["normals"])).numpy(),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh9_diffuse(jnp.asarray(d["normals"][0]),
                               jnp.asarray(d["normals"]),
                               jnp.asarray(d["albedo"]))),
        ref.render.lighting.sh9_diffuse(_t(d["normals"][0]),
                                        _t(d["normals"]),
                                        _t(d["albedo"])).numpy(),
        rtol=1e-5, atol=1e-6)


def test_sg_from_environment_map_reconstructs():
    """Fitting SGs to an equirect env map reproduces it (the reference
    declares this API but raises NotImplementedError, sg.py:121)."""
    import math
    import numpy as np
    import jax.numpy as jnp
    from kaolin_tpu.render.lighting import SgLightingParameters

    h, w = 32, 64
    el = (0.5 - (np.arange(h) + 0.5) / h) * math.pi
    az = ((np.arange(w) + 0.5) / w - 0.5) * 2 * math.pi
    ce = np.cos(el)[:, None]
    dirs = np.stack([ce * np.cos(az)[None],
                     np.broadcast_to(np.sin(el)[:, None], (h, w)),
                     ce * np.sin(az)[None]], -1)
    # smooth env: warm light from +x, cool from -y
    img = np.stack([0.8 * np.clip(dirs[..., 0], 0, 1) + 0.1,
                    0.3 * np.clip(dirs[..., 0], 0, 1) + 0.1,
                    0.6 * np.clip(-dirs[..., 1], 0, 1) + 0.1],
                   -1).astype(np.float32)

    params = SgLightingParameters.from_environment_map(img, num_sg=48)
    assert params.amplitude.shape == (48, 3)

    # reconstruct and compare
    lob = np.asarray(params.direction)
    amp = np.asarray(params.amplitude)
    sh = np.asarray(params.sharpness)
    basis = np.exp(sh[None] * (dirs.reshape(-1, 3) @ lob.T - 1.0))
    recon = (basis @ amp).reshape(h, w, 3)
    err = np.abs(recon - img).mean() / img.mean()
    assert err < 0.08, err
