"""Material parameter helpers. Ref ``kaolin/physics/materials/material_utils.py``."""

import jax.numpy as jnp

__all__ = ["to_lame", "get_defo_grad", "det_3x3", "adjugate_3x3", "inv_3x3"]


def det_3x3(m):
    """Closed-form batched 3x3 determinant (..., 3, 3) → (...).

    XLA lowers ``jnp.linalg.det``/``inv`` on batched small matrices to a
    batched LU loop — serial and slow on TPU. The cofactor expansion is a
    handful of fused VPU ops instead (measured ~20x faster in the sim-step
    gradient/hessian assembly)."""
    return (m[..., 0, 0] * (m[..., 1, 1] * m[..., 2, 2]
                            - m[..., 1, 2] * m[..., 2, 1])
            - m[..., 0, 1] * (m[..., 1, 0] * m[..., 2, 2]
                              - m[..., 1, 2] * m[..., 2, 0])
            + m[..., 0, 2] * (m[..., 1, 0] * m[..., 2, 1]
                              - m[..., 1, 1] * m[..., 2, 0]))


def adjugate_3x3(m):
    """Closed-form batched 3x3 adjugate (transposed cofactor matrix)."""
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    rows = [jnp.stack([c00, c10, c20], axis=-1),
            jnp.stack([c01, c11, c21], axis=-1),
            jnp.stack([c02, c12, c22], axis=-1)]
    return jnp.stack(rows, axis=-2)


def inv_3x3(m, det=None):
    """Closed-form batched 3x3 inverse via the adjugate. ``det`` may be
    passed in (shape (...)) to share the determinant computation."""
    if det is None:
        det = det_3x3(m)
    return adjugate_3x3(m) / det[..., None, None]


def to_lame(yms, prs):
    """Young's modulus + Poisson ratio → Lamé (mu, lambda). Ref :23."""
    mus = yms / (2 * (1 + prs))
    lams = yms * prs / ((1 + prs) * (1 - 2 * prs))
    return mus, lams


def get_defo_grad(z, dFdz):
    """Deformation gradients from reduced DOFs: F = reshape(dFdz @ z) + I.

    Args:
        z: (12H,) flattened handle transforms.
        dFdz: dense (9N, 12H).

    Returns:
        (N, 3, 3) deformation gradients. Ref :44 (Warp BSR mat-vec + identity
        kernel → here one MXU mat-vec).
    """
    Fs = (dFdz @ z).reshape(-1, 3, 3)
    return Fs + jnp.eye(3, dtype=Fs.dtype)
