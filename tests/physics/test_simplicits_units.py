import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.physics.materials import (
    linear_elastic_material as lin,
    neohookean_elastic_material as neo,
    to_lame,
)
from kaolin_tpu.physics.simplicits.network import SkinningFn
from kaolin_tpu.physics.simplicits.precomputed import (
    dFdz_matrix,
    jacobian_dF_dz,
    lbs_matrix,
)
from kaolin_tpu.physics.simplicits.skinning import standard_lbs

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()


@pytest.fixture
def rand_F(key):
    f = jnp.eye(3) + 0.1 * jax.random.normal(key, (8, 3, 3))
    return f


def test_to_lame():
    mus, lams = to_lame(jnp.asarray([1e5]), jnp.asarray([0.45]))
    np.testing.assert_allclose(mus, 1e5 / 2.9, rtol=1e-5)
    np.testing.assert_allclose(lams, 1e5 * 0.45 / (1.45 * 0.1), rtol=1e-5)


def test_neohookean_energy_at_rest(rand_F):
    mu = jnp.ones((8, 1))
    lam = jnp.ones((8, 1))
    f_rest = jnp.broadcast_to(jnp.eye(3), (8, 3, 3))
    np.testing.assert_allclose(neo.neohookean_energy(mu, lam, f_rest), 0.0,
                               atol=1e-6)
    assert np.all(np.asarray(neo.neohookean_energy(mu, lam, rand_F)) > -1e-5)


def test_neohookean_gradient_matches_ad(rand_F):
    mu = jnp.full((8, 1), 2.0)
    lam = jnp.full((8, 1), 3.0)

    def e(f):
        return jnp.sum(neo.neohookean_energy(mu, lam, f))

    g_ad = jax.grad(e)(rand_F)
    g_cl = neo.neohookean_gradient(mu, lam, rand_F)
    np.testing.assert_allclose(g_cl, g_ad, rtol=1e-4, atol=1e-5)


def test_neohookean_hessian_matches_ad(rand_F):
    mu = jnp.full((8, 1), 2.0)
    lam = jnp.full((8, 1), 3.0)

    def e_single(f):
        return neo.neohookean_energy(mu[:1], lam[:1], f[None])[0, 0]

    h_ad = jax.vmap(jax.hessian(e_single))(rand_F)  # (8, 3,3,3,3)
    h_ad = h_ad.reshape(8, 9, 9)
    h_cl = neo.neohookean_hessian(mu, lam, rand_F)
    np.testing.assert_allclose(h_cl, h_ad, rtol=1e-3, atol=1e-4)


def test_linear_energy_gradient_ad(rand_F):
    mu = jnp.full((8, 1), 2.0)
    lam = jnp.full((8, 1), 3.0)

    def e(f):
        return jnp.sum(lin.linear_elastic_energy(mu, lam, f))

    np.testing.assert_allclose(lin.linear_elastic_gradient(mu, lam, rand_F),
                               jax.grad(e)(rand_F), rtol=1e-4, atol=1e-5)


def _analytic_skin():
    """Smooth analytic 2-learned-handle weight field."""
    def f(x):
        return jnp.stack([jnp.sin(x[:, 0]) * 0.5 + 0.2 * x[:, 1],
                          jnp.cos(x[:, 1]) * 0.3 + 0.1 * x[:, 2] ** 2], axis=1)
    return SkinningFn.from_function(f)


def test_lbs_matrix_consistency(key):
    """B @ z must equal standard_lbs displacement."""
    pts = jax.random.uniform(key, (20, 3))
    skin = _analytic_skin()
    w = skin.compute_skinning_weights(pts)
    tfms = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (1, 3, 3, 4))
    B = lbs_matrix(pts, w)
    dx = (B @ tfms.reshape(-1)).reshape(-1, 3)
    x_lbs = standard_lbs(pts, tfms, w).reshape(-1, 3)
    np.testing.assert_allclose(dx + pts, x_lbs, rtol=1e-4, atol=1e-5)


def test_lbs_matrix_parity_with_reference(key):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    from kaolin.physics.simplicits.precomputed import lbs_matrix as ref_lbs
    pts = np.random.RandomState(0).rand(15, 3).astype(np.float32)
    w = np.random.RandomState(1).rand(15, 4).astype(np.float32)
    ours = lbs_matrix(jnp.asarray(pts), jnp.asarray(w))
    theirs = ref_lbs(torch.tensor(pts), torch.tensor(w)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_dFdz_matches_ad_oracle(key):
    pts = jax.random.uniform(key, (6, 3))
    skin = _analytic_skin()
    w = skin.compute_skinning_weights(pts)
    dwdx = skin.compute_dwdx(pts)
    dFdz = dFdz_matrix(w, dwdx, pts)
    z = jnp.zeros((w.shape[1] * 12,))
    oracle = jacobian_dF_dz(skin, pts, z)
    np.testing.assert_allclose(dFdz, oracle, rtol=1e-3, atol=1e-4)


def test_skinning_fn_weights_and_grad(key):
    skin = _analytic_skin()
    pts = jax.random.uniform(key, (10, 3))
    w = skin.compute_skinning_weights(pts)
    assert w.shape == (10, 3)
    np.testing.assert_allclose(w[:, -1], 1.0)
    dwdx = skin.compute_dwdx(pts)
    assert dwdx.shape == (10, 3, 3)
    np.testing.assert_allclose(dwdx[:, -1], 0.0, atol=1e-6)
    # finite diff check on handle 0, x-direction
    eps = 1e-4
    wp = skin.compute_skinning_weights(pts.at[:, 0].add(eps))
    wm = skin.compute_skinning_weights(pts.at[:, 0].add(-eps))
    np.testing.assert_allclose(dwdx[:, 0, 0], (wp - wm)[:, 0] / (2 * eps),
                               rtol=1e-2, atol=1e-4)


def test_loss_parity_with_reference(key):
    """Elastic + ortho losses must match the reference pure-torch versions."""
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    from kaolin.physics.simplicits.losses import (
        loss_elastic as ref_le,
        loss_ortho as ref_lo,
    )
    from kaolin.physics.simplicits.network import SkinningModule

    from kaolin_tpu.physics.simplicits.losses import loss_elastic, loss_ortho

    rng = np.random.RandomState(0)
    pts = rng.rand(30, 3).astype(np.float32)
    yms = np.full((30, 1), 1e4, dtype=np.float32)
    prs = np.full((30, 1), 0.45, dtype=np.float32)
    rhos = np.full((30, 1), 100.0, dtype=np.float32)
    tfms = (0.1 * rng.randn(4, 2, 3, 4)).astype(np.float32)  # H = 2 learned handles

    wmat = rng.rand(3, 2).astype(np.float32)

    def jf(x):
        return jnp.tanh(x @ jnp.asarray(wmat))

    def tf(x):
        return torch.tanh(x @ torch.tensor(wmat))

    ours = loss_elastic(jf, jnp.asarray(pts), jnp.asarray(yms), jnp.asarray(prs),
                        jnp.asarray(rhos), jnp.asarray(tfms), appx_vol=2.0,
                        interp_step=0.4)
    ref_model = SkinningModule.from_function(tf)
    theirs = ref_le(ref_model, torch.tensor(pts), torch.tensor(yms),
                    torch.tensor(prs), torch.tensor(rhos), torch.tensor(tfms),
                    appx_vol=2.0, interp_step=0.4)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-3)

    w = rng.rand(30, 5).astype(np.float32)
    np.testing.assert_allclose(float(loss_ortho(jnp.asarray(w))),
                               float(ref_lo(torch.tensor(w))), rtol=1e-5)


def test_run_sim_steps_scan_matches_stepwise():
    """lax.scan rollout (run_sim_steps) == repeated run_sim_step calls,
    including collisions, kinematic object, and QR basis."""
    from kaolin_tpu.parallel.simplicits import make_demo_scene

    a = make_demo_scene(seed=3, num_qp=24, num_handles=3)
    b = make_demo_scene(seed=3, num_qp=24, num_handles=3)
    n = 4
    a.run_sim_steps(n)
    for _ in range(n):
        b.run_sim_step()
    assert a.current_sim_step == b.current_sim_step == n
    np.testing.assert_allclose(np.asarray(a.sim_z), np.asarray(b.sim_z),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(a.sim_z_dot),
                               np.asarray(b.sim_z_dot), atol=1e-6)
