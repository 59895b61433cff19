"""Newton solver / line-search unit tests.

The vectorized line search precomputes all candidate energies and resolves
the reference's sequential grow/shrink automaton
(ref ``kaolin/physics/common/optimization.py:89``) in closed form; this
verifies the closed form against a literal Python simulation of that
automaton for every budget m and thousands of random sufficiency patterns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.physics.common.optimization import (
    _resolve_ls_automaton,
    newtons_method,
)


def _simulate_reference_automaton(suff, m):
    """Literal transcription of the reference's sequential line search over
    the step grid (index m ↔ t=1; lower index ↔ larger t). Returns the index
    of the returned direction."""
    idx = m              # t = 1
    can_break = False
    for _ in range(m):   # max_steps iterations
        s = bool(suff[idx]) if 0 <= idx <= 2 * m else False
        if s:
            if can_break:
                return idx
            can_break = True
            idx -= 1     # t /= beta (grow)
        else:
            idx += 1     # t *= beta (shrink)
    return idx           # budget exhausted: current direction


@pytest.mark.parametrize("m", [1, 2, 3, 5, 10, 20])
def test_ls_automaton_closed_form_matches_sequential(m):
    rng = np.random.RandomState(0)
    patterns = [rng.rand(2 * m + 1) < p for p in (0.1, 0.3, 0.5, 0.8)
                for _ in range(200)]
    # plus structured corner cases
    patterns += [np.zeros(2 * m + 1, bool), np.ones(2 * m + 1, bool)]
    for k in range(2 * m + 1):
        one = np.zeros(2 * m + 1, bool)
        one[k] = True
        patterns.append(one)
        patterns.append(~one)
    for suff in patterns:
        expect = _simulate_reference_automaton(suff, m)
        got = int(_resolve_ls_automaton(jnp.asarray(suff), m))
        assert got == expect, f"m={m} suff={suff.astype(int)}"


def test_newtons_method_quadratic_exact():
    """On a convex quadratic, one Newton step lands on the optimum."""
    A = jnp.asarray(np.diag([1.0, 4.0, 9.0]), dtype=jnp.float32)
    b = jnp.asarray([1.0, -2.0, 3.0], dtype=jnp.float32)

    def e(x):
        return 0.5 * x @ (A @ x) - b @ x

    x = newtons_method(jnp.zeros(3), e, jax.grad(e), jax.hessian(e),
                       nm_max_iters=3, max_ls_steps=10)
    np.testing.assert_allclose(np.asarray(x),
                               np.asarray(jnp.linalg.solve(A, b)),
                               rtol=1e-5, atol=1e-5)


def test_newtons_method_rosenbrock_descends():
    def e(x):
        return (1 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    x0 = jnp.asarray([-0.5, 0.5])
    x = newtons_method(x0, e, jax.grad(e), jax.hessian(e),
                       nm_max_iters=10, max_ls_steps=15)
    assert float(e(x)) < float(e(x0)) * 0.1


def test_newtons_method_differentiable_mode():
    """differentiable=True runs Newton as a fixed-trip loop so jax.grad
    flows (the default while_loop early-exit is not reverse-differentiable);
    both modes agree on the solution."""
    rng = np.random.RandomState(0)
    a_half = rng.randn(6, 6).astype(np.float32)
    A = jnp.asarray(a_half @ a_half.T + 6 * np.eye(6, dtype=np.float32))

    def solve(b, differentiable):
        e = lambda x: 0.5 * (x - b) @ A @ (x - b)
        g = lambda x: A @ (x - b)
        h = lambda x: A
        return newtons_method(jnp.zeros(6), e, g, h, nm_max_iters=4,
                              differentiable=differentiable)

    b0 = jnp.asarray(rng.randn(6).astype(np.float32))
    np.testing.assert_allclose(np.asarray(solve(b0, True)),
                               np.asarray(solve(b0, False)), atol=1e-6)
    grad = jax.grad(lambda b: jnp.sum(solve(b, True) ** 2))(b0)
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.max(jnp.abs(grad))) > 0
    with pytest.raises(ValueError):
        jax.grad(lambda b: jnp.sum(solve(b, False) ** 2))(b0)


def test_scene_differentiable_step_grad():
    """A differentiable=True scene supports jax.grad through its functional
    sim step (the API the newton-bridge builder promises for
    requires_grad=True)."""
    from kaolin_tpu.physics.simplicits import (PhysicsPoints,
                                               SimplicitsObject,
                                               SimplicitsScene)
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.4, 0.4, (40, 3)).astype(np.float32)
    phys = PhysicsPoints(pts=jnp.asarray(pts), yms=1e4, prs=0.45,
                         rhos=500.0, appx_vol=0.5)
    freqs = jnp.asarray(rng.randn(3, 4).astype(np.float32))
    obj = SimplicitsObject.create_from_function(
        phys, lambda x: jnp.sin(x @ freqs))
    scene = SimplicitsScene(timestep=0.02, max_newton_steps=3,
                            max_ls_steps=6, differentiable=True)
    scene.add_object(obj, num_qp=40)
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    step, consts = scene.build_functional_step()

    def loss(z):
        z_new, _, _ = step(consts, z, scene.sim_z_prev, scene.sim_z_dot)
        return jnp.sum(z_new ** 2)

    g = jax.grad(loss)(scene.sim_z)
    assert np.isfinite(np.asarray(g)).all()
