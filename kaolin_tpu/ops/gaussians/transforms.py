"""3D-gaussian transforms: rigid/scaled transforms + SH rotation.

TPU-native analog of reference ``kaolin/ops/gaussians/transforms.py``
(transform_gaussians :63, transform_shs :125). SH rotation uses the
Ivanic-Ruedenberg recurrence (J. Phys. Chem. 1996) for real-SH Wigner-D
matrices, bands 1..3: per-band sparse tables are precomputed host-side once
and applied as gather-multiply-scatter (segment_sum) — the same math as the
reference's fused band kernels.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["transform_gaussians", "transform_shs"]


def _decompose_4x4(transform):
    """(N, 4, 4) → (translation, rotation (N,3,3), scale (N,3))."""
    translation = transform[:, :3, 3]
    rs = transform[:, :3, :3]
    scale = jnp.linalg.norm(rs, axis=1)  # column norms
    rotation = rs / scale[:, None, :]
    return translation, rotation, scale


def _quat_to_mat_wxyz(q):
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)


def _mat_to_quat_wxyz(m):
    from kaolin_tpu.math.quat import quat_from_rot33
    q_xyzw = quat_from_rot33(m)
    return jnp.concatenate([q_xyzw[..., 3:4], q_xyzw[..., :3]], axis=-1)


def transform_gaussians(positions, orientations, scales, transform,
                        sh_coeff=None, use_log_scales=False, use_xyzw=False):
    """Apply a 4x4 affine transform to gaussian splats. Quaternions are wxyz
    by default. Returns (positions, orientations, scales[, sh_coeff]).
    Ref :63."""
    transform = jnp.asarray(transform)
    if transform.ndim == 2:
        transform = transform[None]
    _, rot, scale = _decompose_4x4(transform)

    ph = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=1)
    new_positions = jnp.einsum("nij,nj->ni",
                               jnp.broadcast_to(transform,
                                                (positions.shape[0], 4, 4)),
                               ph)[:, :3]

    if use_xyzw:
        q_wxyz = jnp.concatenate([orientations[:, 3:4], orientations[:, :3]],
                                 axis=1)
    else:
        q_wxyz = orientations
    rmat = _quat_to_mat_wxyz(q_wxyz)
    new_rmat = rot @ rmat
    new_q = _mat_to_quat_wxyz(new_rmat)
    if use_xyzw:
        new_orientations = jnp.concatenate([new_q[:, 1:], new_q[:, :1]], axis=1)
    else:
        new_orientations = new_q

    if use_log_scales:
        new_scales = scales * (jnp.log(scale) / scales + 1)
    else:
        new_scales = scales * scale

    if sh_coeff is None:
        return new_positions, new_orientations, new_scales, None
    return (new_positions, new_orientations, new_scales,
            transform_shs(sh_coeff, rot))


# ---------------------------------------------------------------------------
# real-SH Wigner-D rotation (Ivanic & Ruedenberg 1996 recurrence)
# ---------------------------------------------------------------------------

# D^1 = Q R Q^{-1}: permutation [1, 2, 0] with this sign pattern (3DGS real-SH
# basis ordering y, z, x)
_S_3DGS = np.array([[1, -1, 1], [-1, 1, -1], [1, -1, 1]], dtype=np.float64)


@functools.lru_cache(maxsize=8)
def _band_tables(l):
    """Sparse recurrence tables for band l: lists of
    (coeff, out_m, out_n, r1_row, r1_col, prev_row, prev_col)."""
    lm1 = l - 1
    entries = []

    def p_terms(i, a, b):
        ri = i + 1
        if b == l:
            return [(ri, 2, a + lm1, 2 * lm1, 1.0),
                    (ri, 0, a + lm1, 0, -1.0)]
        if b == -l:
            return [(ri, 2, a + lm1, 0, 1.0),
                    (ri, 0, a + lm1, 2 * lm1, 1.0)]
        return [(ri, 1, a + lm1, b + lm1, 1.0)]

    def add(mi, ni, scalar, terms):
        for (rr, rc, pr, pc, s) in terms:
            entries.append((scalar * s, mi, ni, rr, rc, pr, pc))

    for m in range(-l, l + 1):
        for n in range(-l, l + 1):
            mi, ni, am = m + l, n + l, abs(m)
            d = float((l + n) * (l - n)) if abs(n) < l else float(2 * l * (2 * l - 1))
            if d == 0:
                continue
            num_u = float((l + m) * (l - m))
            if num_u > 0:
                add(mi, ni, math.sqrt(num_u / d), p_terms(0, m, n))
            if m == 0:
                inner = float(l * (l - 1))
                if inner > 0:
                    add(mi, ni, -0.5 * math.sqrt(2.0 * inner / d),
                        p_terms(1, 1, n) + p_terms(-1, -1, n))
            elif m > 0:
                num_v = float((l + m - 1) * (l + m))
                if num_v > 0:
                    v = 0.5 * math.sqrt(num_v / d)
                    dm1 = 1.0 if m == 1 else 0.0
                    s1, s2 = math.sqrt(1 + dm1), -(1 - dm1)
                    terms = [(rr, rc, pr, pc, s * s1)
                             for rr, rc, pr, pc, s in p_terms(1, m - 1, n)]
                    if abs(s2) > 1e-15:
                        terms += [(rr, rc, pr, pc, s * s2)
                                  for rr, rc, pr, pc, s in p_terms(-1, -m + 1, n)]
                    add(mi, ni, v, terms)
            else:
                num_v = float((l + am - 1) * (l + am))
                if num_v > 0:
                    v = 0.5 * math.sqrt(num_v / d)
                    dm1 = 1.0 if m == -1 else 0.0
                    s1, s2 = (1 - dm1), math.sqrt(1 + dm1)
                    terms = []
                    if abs(s1) > 1e-15:
                        terms += [(rr, rc, pr, pc, s * s1)
                                  for rr, rc, pr, pc, s in p_terms(1, m + 1, n)]
                    terms += [(rr, rc, pr, pc, s * s2)
                              for rr, rc, pr, pc, s in p_terms(-1, -m - 1, n)]
                    add(mi, ni, v, terms)
            if am != 0:
                iw = float((l - am - 1) * (l - am))
                if iw > 0:
                    w = -0.5 * math.sqrt(iw / d)
                    if m > 0:
                        add(mi, ni, w,
                            p_terms(1, m + 1, n) + p_terms(-1, -m - 1, n))
                    else:
                        terms = p_terms(1, m - 1, n)
                        terms += [(rr, rc, pr, pc, -s)
                                  for rr, rc, pr, pc, s in p_terms(-1, -m + 1, n)]
                        add(mi, ni, w, terms)

    arr = np.asarray(entries, dtype=np.float64)
    coeff = arr[:, 0]
    idx = arr[:, 1:].astype(np.int64)
    return coeff, idx


def _apply_wigner(l, d1_pad, d_prev):
    """Band-l Wigner matrix from padded D^1 (N, 3, 3 → rows indexed 0..2 via
    p_terms' row+1 convention) and D^(l-1)."""
    coeff, idx = _band_tables(l)
    dim = 2 * l + 1
    coeff_j = jnp.asarray(coeff, dtype=d_prev.dtype)
    mi, ni, rr, rc, pr, pc = [jnp.asarray(idx[:, k]) for k in range(6)]
    products = coeff_j[None] * d1_pad[:, rr, rc] * d_prev[:, pr, pc]
    out_idx = mi * dim + ni
    flat = jax.vmap(lambda p: jax.ops.segment_sum(p, out_idx,
                                                  num_segments=dim * dim))(products)
    return flat.reshape(-1, dim, dim)


def transform_shs(shs_feat, R):
    """Rotate real SH coefficients (bands 0..3, DC passthrough).
    shs_feat (N, (deg+1)², 3); R (N or 1, 3, 3). Ref :125."""
    num_coeffs = shs_feat.shape[1]
    degree = math.isqrt(num_coeffs) - 1
    assert (degree + 1) ** 2 == num_coeffs
    if degree > 3:
        raise NotImplementedError("transform_shs supports degree <= 3")
    R = jnp.asarray(R)
    if R.ndim == 2:
        R = R[None]
    if R.shape[0] == 1 and shs_feat.shape[0] > 1:
        R = jnp.broadcast_to(R, (shs_feat.shape[0], 3, 3))

    parts = [shs_feat[:, :1]]
    if degree >= 1:
        perm = jnp.asarray([1, 2, 0])
        s = jnp.asarray(_S_3DGS, dtype=shs_feat.dtype)
        d1 = R[:, perm][:, :, perm] * s
        parts.append(d1 @ shs_feat[:, 1:4])
    if degree >= 2:
        d2 = _apply_wigner(2, d1, d1)
        parts.append(d2 @ shs_feat[:, 4:9])
    if degree >= 3:
        d3 = _apply_wigner(3, d1, d2)
        parts.append(d3 @ shs_feat[:, 9:16])
    return jnp.concatenate(parts, axis=1)
