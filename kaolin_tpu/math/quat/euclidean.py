"""Euclidean (SE(3)) 4x4 transforms. Ref ``kaolin/math/quat/euclidean.py``."""

import jax.numpy as jnp

__all__ = [
    "euclidean_identity",
    "euclidean_from_rotation_translation",
    "euclidean_rotation_matrix",
    "euclidean_translation_vector",
    "is_euclidean_valid",
    "euclidean_inverse",
]


def euclidean_identity(batch_size, dtype=jnp.float32):
    """Identity SE(3) matrices (b, 4, 4). Ref :36."""
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), (batch_size, 4, 4))


def euclidean_from_rotation_translation(r=None, t=None):
    """Build (b, 4, 4) from rotation (b,3,3) and/or translation (b,3). Ref :50."""
    if r is None and t is None:
        raise ValueError("need rotation or translation")
    if r is not None:
        batch = r.shape[:-2]
        dtype = r.dtype
    else:
        batch = t.shape[:-1]
        dtype = t.dtype
    out = jnp.broadcast_to(jnp.eye(4, dtype=dtype), batch + (4, 4))
    if r is not None:
        out = out.at[..., :3, :3].set(r)
    if t is not None:
        out = out.at[..., :3, 3].set(t)
    return out


def euclidean_rotation_matrix(x):
    """Extract rotation block. Ref :82."""
    return x[..., :3, :3]


def euclidean_translation_vector(x):
    """Extract translation column. Ref :95."""
    return x[..., :3, 3]


def is_euclidean_valid(x, throw=False):
    """Bottom row must be [0,0,0,1]; rotation orthonormal. Ref :108."""
    bottom = jnp.allclose(x[..., 3, :],
                          jnp.array([0, 0, 0, 1], dtype=x.dtype), atol=1e-5)
    r = x[..., :3, :3]
    ortho = jnp.allclose(r @ jnp.swapaxes(r, -1, -2), jnp.eye(3, dtype=x.dtype), atol=1e-4)
    ok = bool(bottom) and bool(ortho)
    if throw and not ok:
        raise ValueError("invalid euclidean transform")
    return ok


def euclidean_inverse(x):
    """Closed-form SE(3) inverse. Ref :128."""
    r = x[..., :3, :3]
    t = x[..., :3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    out = jnp.broadcast_to(jnp.eye(4, dtype=x.dtype), x.shape)
    out = out.at[..., :3, :3].set(rt)
    return out.at[..., :3, 3].set(-jnp.einsum("...ij,...j->...i", rt, t))
