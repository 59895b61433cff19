"""Dense linear-algebra helpers for the physics solver.

Analog of reference ``kaolin/physics/utils/torch_utilities.py`` (name kept
for discoverability; everything is jnp).
"""

import jax.numpy as jnp

__all__ = ["standard_transform_to_relative", "hess_reduction",
           "create_projection_mask"]


def standard_transform_to_relative(transform):
    """4x4 or 3x4 standard transform → 3x4 relative (minus identity). Ref :24."""
    t = jnp.asarray(transform)
    t = t[:3, :4]
    return t - jnp.eye(3, 4, dtype=t.dtype)


def hess_reduction(dense_ja, block_wise_h, dense_jb=None):
    """Jaᵀ H Jb for block-diagonal per-point H.

    dense_ja: (N·b, R); block_wise_h: (N, b, b); dense_jb: (N·b, R2).
    Returns (R, R2). Ref :68 — a single einsum chain on the MXU.
    """
    if dense_jb is None:
        dense_jb = dense_ja
    n, b, _ = block_wise_h.shape
    jb = dense_jb.reshape(n, b, -1)
    # H·J as b unrolled VPU multiply-adds: a batched (n, b, b)x(n, b, R)
    # dot_general pads the tiny b×b operands onto full MXU tiles (~10x
    # waste at b=9); the unrolled broadcast form fuses into one
    # elementwise loop instead
    hj = sum(block_wise_h[:, :, j, None] * jb[:, None, j, :]
             for j in range(b))
    # the n- and b-axes reduce together: one big (R, n·b)x(n·b, R) matmul
    return dense_ja.reshape(n * b, -1).T @ hj.reshape(n * b, -1)


def create_projection_mask(num_dofs, kin_dofs):
    """Boolean mask of dynamic DOFs (host-side numpy). Ref
    create_projection_matrix :45 — we keep indices, not a sparse matrix."""
    import numpy as np
    mask = np.ones(num_dofs, dtype=bool)
    mask[np.asarray(kin_dofs)] = False
    return np.nonzero(mask)[0]


def create_projection_matrix(num_dofs, list_of_kin_dofs):
    """Dense selection matrix removing kinematic DOF rows:
    (num_dofs - k, num_dofs). Ref ``torch_utilities.py:45``."""
    import numpy as np
    mask = np.ones(num_dofs, dtype=bool)
    mask[np.asarray(list_of_kin_dofs, dtype=np.int64)] = False
    return jnp.asarray(np.eye(num_dofs, dtype=np.float32)[mask])
