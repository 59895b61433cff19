import jax.numpy as jnp
import numpy as np

from kaolin_tpu.physics.simplicits.rkpm import RKPM, SimplicitsRKPM


def _kernel(seed=0, n_nodes=20):
    rng = np.random.RandomState(seed)
    nodes = rng.rand(n_nodes, 3)
    radius = np.full(n_nodes, 0.4)
    k = RKPM(n_nodes)
    k.set_kernels(nodes, radius)
    return k, rng


def test_rkpm_polynomial_reproduction():
    """First-order RKPM must reproduce linear functions exactly."""
    k, rng = _kernel()
    x = rng.rand(50, 3) * 0.8 + 0.1
    phi = k.phi(x)
    # partition of unity
    np.testing.assert_allclose(phi.sum(1), 1.0, atol=1e-8)
    # linear reproduction: sum_i phi_i * node_i == x
    np.testing.assert_allclose(phi @ k.nodes, x, atol=1e-8)


def test_rkpm_grad_phi_finite_diff():
    k, rng = _kernel()
    x = rng.rand(10, 3) * 0.8 + 0.1
    gp = k.grad_phi(x)
    eps = 1e-6
    for d in range(3):
        xp = x.copy(); xp[:, d] += eps
        xm = x.copy(); xm[:, d] -= eps
        num = (k.phi(xp) - k.phi(xm)) / (2 * eps)
        np.testing.assert_allclose(gp[:, :, d], num, atol=1e-5)


def test_simplicits_rkpm_modes():
    rng = np.random.RandomState(0)
    pts = rng.rand(400, 3)
    yms = np.full(400, 1e4)
    prs = np.full(400, 0.45)
    rhos = np.full(400, 500.0)
    skin = SimplicitsRKPM(num_handles=6, num_nodes=32)
    skin.init(pts, yms, prs, rhos, appx_vol=1.0)
    w = skin.compute_skinning_weights(pts)
    assert w.shape == (400, 6)
    np.testing.assert_allclose(np.asarray(w[:, -1]), 1.0)
    dwdx = skin.compute_dwdx(pts)
    assert dwdx.shape == (400, 6, 3)
    np.testing.assert_allclose(np.asarray(dwdx[:, -1]), 0.0)
    assert np.isfinite(np.asarray(w)).all()
    # learned handles vary over space (non-constant eigenmodes)
    assert np.asarray(w[:, :-1]).std(0).min() > 1e-4


def test_create_with_rkpm_and_simulate():
    """RKPM-weighted object must simulate stably for a few steps."""
    from kaolin_tpu.physics.simplicits import (
        PhysicsPoints,
        SimplicitsObject,
        SimplicitsScene,
    )
    rng = np.random.RandomState(0)
    pts = (rng.rand(300, 3) - 0.5).astype(np.float32)
    phys = PhysicsPoints(pts, yms=1e4, prs=0.45, rhos=500.0, appx_vol=1.0)
    obj = SimplicitsObject.create_with_rkpm(phys, num_handles=5, num_nodes=24)
    scene = SimplicitsScene(timestep=0.03, max_newton_steps=3, max_ls_steps=5)
    oid = scene.add_object(obj, num_qp=300)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=-1.0)
    for _ in range(5):
        scene.run_sim_step()
    p = np.asarray(scene.get_object_deformed_pts(oid))
    assert np.isfinite(p).all()
    assert p[:, 1].mean() < 0.0  # fell under gravity
