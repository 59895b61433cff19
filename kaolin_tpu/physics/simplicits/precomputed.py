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
