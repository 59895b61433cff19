"""Tetrahedral-mesh quality metrics. Ref ``kaolin/metrics/tetmesh.py``."""

import jax.numpy as jnp

__all__ = ["tetrahedron_volume", "equivolume", "amips"]


def _validate(tet_vertices):
    if tet_vertices.ndim != 4 or tet_vertices.shape[-2:] != (4, 3):
        raise ValueError(f"expected (B, T, 4, 3), got {tet_vertices.shape}")


def tetrahedron_volume(tet_vertices):
    """Signed volume of batched tets (B, T, 4, 3) → (B, T). Ref :20."""
    _validate(tet_vertices)
    a, b, c, d = [tet_vertices[..., i, :] for i in range(4)]
    return jnp.sum((a - d) * jnp.cross(b - d, c - d), axis=-1) / 6.0


def equivolume(tet_vertices, tetrahedrons_mean=None, pow=4):
    """DefTet EquiVolume loss → (B, 1). Ref :52."""
    _validate(tet_vertices)
    volumes = tetrahedron_volume(tet_vertices)
    if tetrahedrons_mean is None:
        tetrahedrons_mean = jnp.mean(volumes, axis=-1)
    tetrahedrons_mean = jnp.reshape(tetrahedrons_mean, (1, -1))
    return jnp.mean(jnp.abs(volumes - tetrahedrons_mean) ** pow,
                    axis=-1, keepdims=True)


def amips(tet_vertices, inverse_offset_matrix):
    """AMIPS energy over tets with positive Jacobian det → (B, 1). Ref :112."""
    _validate(tet_vertices)
    a = tet_vertices[..., 0:1, :]
    offset = jnp.concatenate([tet_vertices[..., 1:2, :] - a,
                              tet_vertices[..., 2:3, :] - a,
                              tet_vertices[..., 3:4, :] - a], axis=-2)
    jac = jnp.matmul(offset, inverse_offset_matrix)
    j_det = jnp.linalg.det(jac)
    trace = jnp.trace(jnp.matmul(jac, jnp.swapaxes(jac, -1, -2)),
                      axis1=-2, axis2=-1)
    denominator = (j_det ** 2 + 1e-10) ** (1.0 / 3.0)
    return jnp.mean((trace / denominator) * (j_det >= 0).astype(trace.dtype),
                    axis=1, keepdims=True)
