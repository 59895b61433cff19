"""Precomputed LBS operators: dense B and dFdz.

TPU-native analog of reference ``kaolin/physics/simplicits/precomputed.py``
(sparse_lbs_matrix :158, sparse_dFdz_matrix :270, dense lbs_matrix :358,
autograd jacobian_dF_dz :475).

The reference stores B/dFdz as Warp BSR sparse matrices; their sparsity only
comes from the per-point block structure (every point touches every handle).
At Simplicits scale (N≈1e3-1e4 points, H≈10-40 handles) the dense
(3N × 12H) / (9N × 12H) forms are small and their products are large matmuls
that saturate the MXU, so dense is strictly better on TPU (SURVEY §7).

DOF layout matches the reference exactly: z = flatten((H, 3, 4)) row-major;
F is flattened row-major (3, 3) → 9.
"""

import jax.numpy as jnp

__all__ = ["lbs_matrix", "dFdz_matrix", "jacobian_dF_dz"]


def lbs_matrix(x0, w):
    """Dense LBS Jacobian B with flatten(dx) = B @ flatten(T).

    Args:
        x0: (N, 3) rest points.
        w: (N, H) skinning weights.

    Returns:
        (3N, 12H). Row 3i+r, column 12j+4r+c holds w_ij * [x0_i; 1]_c.
        Ref :358.
    """
    n = x0.shape[0]
    h = w.shape[1]
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=1)  # (N, 4)
    # (N, H, 3, 3, 4): delta_{r,r'} w_ij x0h_c
    blocks = jnp.einsum("nh,nc,rs->nhrsc", w, x0h, jnp.eye(3, dtype=x0.dtype))
    # rearrange to (N, 3, H, 3, 4) → (3N, 12H)
    blocks = jnp.transpose(blocks, (0, 2, 1, 3, 4))
    return blocks.reshape(3 * n, 12 * h)


def dFdz_matrix(w, dwdx, x0):
    """Dense deformation-gradient Jacobian dF/dz, (9N, 12H).

    With x(X) = Σ_j w_j(X) T_j [X;1] + X:
        F = I + Σ_j ( w_j T_j[:, :3]  +  (T_j [X;1]) ∇w_jᵀ )
    so for F entry (r, c) and T_j entry (r', c'):
        dF[r,c]/dT_j[r',c'] = delta_{r,r'} (w_j delta_{c'=c, c'<3}
                              + [X;1]_{c'} ∇w_j[c]).

    Args:
        w: (N, H) weights; dwdx: (N, H, 3) weight spatial gradients;
        x0: (N, 3) rest points.

    Returns:
        (9N, 12H), F flattened row-major. Matches the reference sparse
        triplets (``sparse_dFdz_matrix`` :270) densified.
    """
    n, h = w.shape
    dtype = w.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    x0h = jnp.concatenate([x0, jnp.ones_like(x0[:, :1])], axis=1)  # (N, 4)

    # term1[n, h, r, c, r', c'] = delta_{r,r'} w_nh delta_{c,c'} (c' < 3)
    sel3 = jnp.zeros((3, 4), dtype=dtype).at[:, :3].set(eye3)  # (c, c')
    term1 = jnp.einsum("nh,rp,cq->nhrcpq", w, eye3, sel3)
    # term2[n, h, r, c, r', c'] = delta_{r,r'} x0h_{c'} dwdx[n,h,c]
    term2 = jnp.einsum("nhc,nq,rp->nhrcpq", dwdx, x0h, eye3)
    blocks = term1 + term2  # (N, H, 3, 3, 3, 4)
    # rows: (n, r, c) → 9N; cols: (h, r', c') → 12H
    blocks = jnp.transpose(blocks, (0, 2, 3, 1, 4, 5))
    return blocks.reshape(9 * n, 12 * h)


def jacobian_dF_dz(model, x0, z):
    """dF/dz via exact AD through the skinning function — the reference's
    autograd oracle (``jacobian_dF_dz`` :475), used for testing the closed
    form above."""
    import jax

    num_samples = x0.shape[0]

    def compute_f(z_flat):
        tfms = z_flat.reshape(1, -1, 3, 4)
        fcn = (model.compute_skinning_weights
               if hasattr(model, "compute_skinning_weights") else model)

        def x_of(X):
            Xb = X.reshape(-1, 3)
            w = fcn(Xb)
            x0h = jnp.concatenate([Xb, jnp.ones_like(Xb[:, :1])], axis=1)
            out = jnp.einsum("nh,bhik,nk->nbi", w, tfms, x0h)[:, 0] + Xb
            return out

        f = jax.vmap(lambda X: jax.jacfwd(lambda p: x_of(p)[0])(X))(x0)
        return (f + 0.0).reshape(9 * num_samples)

    return jax.jacfwd(compute_f)(z.reshape(-1))


def lumped_mass_matrix(rhos, total_volume, dim=3):
    """Diagonal lumped mass + inverse-mass matrices (3N×3N) for uniformly
    sampled points with per-point density. Ref ``precomputed.py:339``."""
    rhos = jnp.asarray(rhos).reshape(-1)
    vol_per_sample = total_volume / rhos.shape[0]
    pt_mass = jnp.repeat(rhos * vol_per_sample, dim)
    return jnp.diag(pt_mass), jnp.diag(1.0 / pt_mass)


def sparse_lbs_matrix(sim_weights, sim_pts):
    """Reference-name wrapper for the LBS Jacobian B (3N×12H). On TPU the
    reduced-order operator is DENSE (MXU matmuls beat sparse bookkeeping at
    these sizes); name/argument order kept for API parity with
    ``precomputed.py:158``."""
    return lbs_matrix(sim_pts, sim_weights)


def sparse_dFdz_matrix(sim_weights, sim_weights_jac, sim_pts):
    """Reference-name wrapper for dF/dz (9N×12H), dense on TPU.
    Ref ``precomputed.py:270``."""
    return dFdz_matrix(sim_weights, sim_weights_jac, sim_pts)


def sparse_dFdz_matrix_from_dense(enriched_weights_fcn, pts):
    """dF/dz via autodiff of the weight function (the reference densifies a
    torch-autograd Jacobian; here it IS the dense matrix).
    Ref ``precomputed.py:248``."""
    weights = enriched_weights_fcn(pts)
    num_handles = weights.shape[1]
    z = jnp.zeros((num_handles * 12, 1), dtype=weights.dtype)
    return jacobian_dF_dz(enriched_weights_fcn, pts, z)


def sparse_mass_matrix(sim_rhos):
    """Diagonal 3N×3N mass matrix from densities (dense diagonal on TPU).
    Ref ``precomputed.py:320``."""
    rhos = jnp.asarray(sim_rhos).reshape(-1)
    return jnp.diag(jnp.repeat(rhos, 3))


def sparse_collision_jacobian_matrix(sim_weights, sim_pts, indices,
                                     cp_is_static=None):
    """LBS Jacobian rows at the collision points ``sim_pts[indices]``
    (zero rows for static objects). Dense (3K×12H). Ref
    ``precomputed.py:195``."""
    idx = jnp.asarray(indices).reshape(-1)
    w = sim_weights[idx]
    x = sim_pts[idx]
    jac = lbs_matrix(x, w)
    if cp_is_static is not None:
        static = jnp.asarray(cp_is_static).reshape(-1)
        mask = jnp.repeat(~static, 3).astype(jac.dtype)
        jac = jac * mask[:, None]
    return jac
