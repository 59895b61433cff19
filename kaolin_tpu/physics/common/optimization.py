"""Projected Newton with backtracking Armijo line search — fully jittable.

TPU-native analog of reference ``kaolin/physics/common/optimization.py``
(newtons_method :143, _line_search :89, _apply_bounds :46). The reference
round-trips host↔device every Newton iteration (energy ``.numpy()`` readback,
python line-search control flow); here the entire solve is traced: the Newton
loop is a ``lax.fori_loop``, the line search a ``lax.while_loop``, and the
linear solve a dense ``jnp.linalg.solve`` (or CG) on the reduced system —
zero host syncs inside a sim step.

Kinematic DOFs are removed by a static index list (``dyn_idx``) instead of a
sparse projection matrix: gathers/scatters compile to cheap XLA ops.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["newtons_method"]


def _apply_bounds(direction, bounds, t, qr_tfm, qr_tfm_inv):
    """Element-wise clamp of the step by min(bounds, t); optionally performed
    in the pre-QR basis (ref _apply_bounds :46)."""
    min_bounds = jnp.minimum(bounds, t)
    if qr_tfm is None or qr_tfm_inv is None:
        return direction * min_bounds
    direction_old = qr_tfm @ direction
    return qr_tfm_inv @ (direction_old * min_bounds)


def _line_search(energy_red_fn, x, direction, gradient, bounds,
                 alpha, beta, max_steps, qr_tfm, qr_tfm_inv):
    """Backtracking Armijo line search (ref _line_search :89). Returns the
    bounded update (direction scaled by the accepted step).

    TPU formulation: the sequential search only ever visits step sizes on the
    grid t = β^k (grow by 1/β while sufficient, shrink by β otherwise), so
    ALL candidate energies are evaluated in ONE vmapped batch and the
    reference's grow/shrink/accept automaton is resolved in CLOSED FORM over
    the precomputed sufficiency bits (see :func:`_resolve_ls_automaton`) —
    max_steps sequential energy evaluations collapse into a single fused one
    and the control flow into a handful of vector ops."""
    f = energy_red_fn(x)

    # step grid exactly as the sequential multiply/divide chain produces it:
    # index m = t=1; indices m-1..0 grow (÷β each); m+1..2m shrink (×β each)
    m = max_steps
    dtype = x.dtype
    grow = jnp.cumprod(jnp.full((m,), 1.0 / beta, dtype=dtype))[::-1]
    shrink = jnp.cumprod(jnp.full((m,), beta, dtype=dtype))
    ts = jnp.concatenate([grow, jnp.ones((1,), dtype=dtype), shrink])

    bounded_k = jax.vmap(
        lambda t: _apply_bounds(direction, bounds, t, qr_tfm, qr_tfm_inv))(ts)
    f_k = jax.vmap(lambda b: energy_red_fn(x + b))(bounded_k)
    suff = f_k <= f + alpha * (bounded_k @ gradient)
    return bounded_k[_resolve_ls_automaton(suff, m)]


def _resolve_ls_automaton(suff, m):
    """Closed-form replay of the reference's sequential line search
    (ref _line_search :89) over precomputed sufficiency bits.

    The sequential automaton (t=1 start; on success set can_break and grow
    t/β; on a success with can_break set, accept; on failure shrink t·β;
    after max_steps return the CURRENT direction) only ever produces:

    * ``suff[m]``   → accept index m-1 if ``suff[m-1]`` (or m == 1, where the
      budget runs out right after the grow), else bounce back and accept m.
    * otherwise     → walk up to the first sufficient index k in [m+1, 2m-1];
      accepting k costs (k-m)+3 iterations, so with budget m the walk ends at
      min(k, 2m-2); if no k exists the walk runs off the grid to index 2m.
    """
    idx_grid = jnp.arange(2 * m + 1)
    if m == 1:
        grow_res = jnp.asarray(m - 1)
    else:
        grow_res = jnp.where(suff[m - 1], m - 1, m)
    shrink_hits = suff & (idx_grid > m) & (idx_grid <= 2 * m - 1)
    k = jnp.argmax(shrink_hits)
    found = jnp.any(shrink_hits)
    shrink_res = jnp.where(found, jnp.minimum(k, 2 * m - 2), 2 * m)
    return jnp.where(suff[m], grow_res, shrink_res)


def newtons_method(x,
                   energy_fcn,
                   gradient_fcn,
                   hessian_fcn,
                   bounds_fcn=None,
                   dyn_idx=None,
                   nm_max_iters=5,
                   cg_tol=1e-4,
                   cg_iters=100,
                   conv_tol=1e-4,
                   direct_solve=True,
                   ls_alpha=1e-3,
                   ls_beta=0.6,
                   max_ls_steps=10,
                   bounds_qr_tfm=None,
                   bounds_qr_tfm_inv=None,
                   differentiable=False):
    """Minimize an implicit-integration energy over DOFs x. Ref :143.

    Args:
        x: (D,) initial guess (full DOF vector).
        energy_fcn: x → scalar.
        gradient_fcn: x → (D,).
        hessian_fcn: x → (D, D) dense.
        bounds_fcn: (dx_full, x) → (D,) per-DOF step bounds, or None.
        dyn_idx: static numpy int array of dynamic (non-kinematic) DOF
            indices, or None for all.
        direct_solve: dense Cholesky-style solve vs CG.
        bounds_qr_tfm / bounds_qr_tfm_inv: (R, R) reduced-basis rotation for
            clamping bounds in the raw pre-QR basis.

    Returns:
        (D,) optimized DOFs. Fully traceable under jit.
    """
    d = x.shape[0]
    if dyn_idx is None:
        dyn_idx = np.arange(d)
    all_dynamic = len(np.asarray(dyn_idx)) == d
    dyn_idx = jnp.asarray(np.asarray(dyn_idx), dtype=jnp.int32)

    if all_dynamic:
        def red_to_full(red):
            return red

        def full_to_red(full):
            return full
    else:
        def red_to_full(red):
            return jnp.zeros((d,), dtype=x.dtype).at[dyn_idx].set(red)

        def full_to_red(full):
            return full[dyn_idx]

    x_kinematic = x - red_to_full(full_to_red(x))

    def energy_red(red):
        return energy_fcn(red_to_full(red) + x_kinematic)

    def newton_iter(carry):
        i, x_cur, converged = carry
        g = gradient_fcn(x_cur)
        H = hessian_fcn(x_cur)
        red_H = H if all_dynamic else H[jnp.ix_(dyn_idx, dyn_idx)]
        red_g = full_to_red(g)
        red_x = full_to_red(x_cur)

        if direct_solve:
            # H is SPD in the implicit-integration setting (BMB + dt²·H_e +
            # reg·I): Cholesky beats LU on TPU (~0.42 vs 0.59 ms at 396²).
            # Far from a minimum the elastic Hessian can be indefinite and
            # Cholesky NaNs out — fall back to LU for that iteration only.
            cf = jax.scipy.linalg.cho_factor(red_H)
            dx_chol = jax.scipy.linalg.cho_solve(cf, red_g)
            red_dx = -jax.lax.cond(
                jnp.all(jnp.isfinite(dx_chol)),
                lambda: dx_chol,
                lambda: jnp.linalg.solve(red_H, red_g))
        else:
            diag = jnp.clip(jnp.diagonal(red_H), 1e-8, None)
            sol, _ = jax.scipy.sparse.linalg.cg(
                lambda v: red_H @ v, red_g, tol=cg_tol, maxiter=cg_iters,
                M=lambda v: v / diag)
            red_dx = -sol

        now_converged = jnp.abs(red_dx @ red_g) < conv_tol
        converged_new = converged | now_converged

        full_dx = red_to_full(red_dx)
        if bounds_fcn is None:
            bounds = jnp.ones_like(red_x)
        else:
            b = bounds_fcn(full_dx, x_cur)
            bounds = full_to_red(b)

        bounded_update = _line_search(
            energy_red, red_x, red_dx, red_g, bounds, ls_alpha, ls_beta,
            max_ls_steps, bounds_qr_tfm, bounds_qr_tfm_inv)

        red_x_new = red_x + jnp.where(converged_new, 0.0, bounded_update)
        x_new = red_to_full(red_x_new) + x_kinematic
        return (i + 1, x_new, converged_new)

    if differentiable:
        # fixed-trip fori_loop: converged iterations still run (masked to
        # no-ops by the `converged` flag inside newton_iter) but the loop is
        # reverse-mode differentiable — lax.while_loop is not. Use for
        # differentiable-physics pipelines (grad through the sim step).
        carry = (jnp.asarray(0), x, jnp.asarray(False))
        carry = jax.lax.fori_loop(0, nm_max_iters,
                                  lambda _, c: newton_iter(c), carry)
        return carry[1]
    # while_loop with the reference's convergence break (ref :254-257):
    # converged solves stop paying for the remaining Newton iterations
    _, x_final, _ = jax.lax.while_loop(
        lambda c: (c[0] < nm_max_iters) & ~c[2],
        newton_iter,
        (jnp.asarray(0), x, jnp.asarray(False)))
    return x_final
