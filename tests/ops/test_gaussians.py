import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops.conversions import gs_to_voxelgrid
from kaolin_tpu.ops.gaussians import (
    sample_points_in_volume,
    transform_gaussians,
    transform_shs,
)
from kaolin_tpu.rep import GaussianSplatModel

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()


def _sphere_gaussians(n=1000, radius=0.5, sigma=0.06, seed=0):
    """Gaussians on a sphere shell."""
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xyz = (radius * d).astype(np.float32)
    scales = np.full((n, 3), sigma, dtype=np.float32)
    rots = np.zeros((n, 4), dtype=np.float32)
    rots[:, 0] = 1.0
    opac = np.full((n,), 0.9, dtype=np.float32)
    return xyz, scales, rots, opac


def test_gs_to_voxelgrid_shell():
    xyz, scales, rots, opac = _sphere_gaussians()
    points, opacity = gs_to_voxelgrid(xyz, scales, rots, opac, level=5)
    pts = np.asarray(points)
    assert pts.shape[0] > 0
    centers = (pts + 0.5) / 16.0 - 1.0
    r = np.linalg.norm(centers, axis=1)
    # shell voxels near radius 0.5
    assert r.min() > 0.2 and r.max() < 0.85
    assert np.all(np.asarray(opacity) > 0) and np.all(np.asarray(opacity) <= 1)


def test_sample_points_in_volume_fills_interior():
    xyz, scales, rots, opac = _sphere_gaussians()
    # floodfill backend (fast path)
    pts = sample_points_in_volume(xyz, scales, rots, opac, octree_level=6,
                                  num_samples=2000, method="floodfill",
                                  clip_samples_to_input_bbox=False)
    p = np.asarray(pts)
    r = np.linalg.norm(p, axis=1)
    # interior (including center region) is filled
    assert (r < 0.25).mean() > 0.02
    assert r.max() < 0.75


def test_sample_points_in_volume_carve():
    # the reference pipeline: multi-view raytrace + Bayesian-fusion carving.
    # A reduced viewpoint set keeps the CPU test fast.
    xyz, scales, rots, opac = _sphere_gaussians()
    d = 4.0
    views = np.array([
        [d, 0, 0.3], [-d, 0, 0.3], [0, d, 0.3], [0, -d, 0.3],
        [0.3, 0.3, d], [0.3, 0.3, -d],
        [2.3, 2.3, 2.3], [-2.3, -2.3, -2.3],
    ], dtype=np.float32)
    pts = sample_points_in_volume(xyz, scales, rots, opac, octree_level=6,
                                  num_samples=2000, method="carve",
                                  viewpoints=views,
                                  clip_samples_to_input_bbox=False)
    p = np.asarray(pts)
    assert p.shape[0] > 100
    r = np.linalg.norm(p, axis=1)
    assert (r < 0.25).mean() > 0.02  # interior filled
    assert r.max() < 0.8


def test_transform_gaussians_rigid():
    xyz, scales, rots, opac = _sphere_gaussians(20)
    angle = 0.7
    c, s = np.cos(angle), np.sin(angle)
    t = np.array([[c, -s, 0, 1.0], [s, c, 0, 2.0],
                  [0, 0, 1, 3.0], [0, 0, 0, 1]], dtype=np.float32)
    new_pos, new_rot, new_scales, _ = transform_gaussians(
        jnp.asarray(xyz), jnp.asarray(rots), jnp.asarray(scales), t)
    want = xyz @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(new_pos, want, atol=1e-5)
    np.testing.assert_allclose(new_scales, scales, atol=1e-5)  # rigid
    np.testing.assert_allclose(np.linalg.norm(np.asarray(new_rot), axis=1),
                               1.0, atol=1e-5)


def test_transform_gaussians_scale():
    xyz, scales, rots, opac = _sphere_gaussians(10)
    t = np.diag([2.0, 2.0, 2.0, 1.0]).astype(np.float32)
    _, _, new_scales, _ = transform_gaussians(
        jnp.asarray(xyz), jnp.asarray(rots), jnp.asarray(scales), t)
    np.testing.assert_allclose(new_scales, scales * 2.0, rtol=1e-5)


def _sh_eval(sh, dirs):
    """Evaluate real SH (bands 0..2, 3DGS y/z/x ordering) at directions."""
    x, y, z = dirs[:, 0], dirs[:, 1], dirs[:, 2]
    basis = np.stack([
        np.full_like(x, 0.28209479177),
        -0.4886025119 * y, 0.4886025119 * z, -0.4886025119 * x,
        1.0925484305920792 * x * y, -1.0925484305920792 * y * z,
        0.31539156525 * (3 * z * z - 1), -1.0925484305920792 * x * z,
        0.5462742152960396 * (x * x - y * y),
    ], axis=-1)  # (D, 9)
    return np.einsum("dc,ncr->ndr", basis, sh)


def test_transform_shs_rotation_equivariance():
    """Rotating SH coefficients must equal evaluating at inverse-rotated
    directions."""
    rng = np.random.RandomState(0)
    sh = rng.randn(4, 9, 3).astype(np.float32)
    angle = 0.6
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)
    sh_rot = np.asarray(transform_shs(jnp.asarray(sh), jnp.asarray(R)[None]))
    dirs = rng.randn(50, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    lhs = _sh_eval(sh_rot, dirs)
    rhs = _sh_eval(sh, dirs @ R)  # f'(d) = f(R^-1 d); rows: (R^T d)^T = d@R
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_transform_shs_parity_with_reference():
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    rng = np.random.RandomState(1)
    sh = rng.randn(5, 16, 3).astype(np.float32)
    from scipy.spatial.transform import Rotation
    R = Rotation.random(5, random_state=0).as_matrix().astype(np.float32)
    ours = transform_shs(jnp.asarray(sh), jnp.asarray(R))
    theirs = ref_kaolin.ops.gaussians.transform_shs(
        torch.tensor(sh), torch.tensor(R))
    np.testing.assert_allclose(ours, theirs.numpy(), atol=5e-4)


def test_gaussian_splat_model():
    xyz, scales, rots, opac = _sphere_gaussians(30)
    sh = np.random.RandomState(0).randn(30, 4, 3).astype(np.float32)
    g = GaussianSplatModel(positions=xyz, orientations=rots, scales=scales,
                           opacities=opac, sh_coeff=sh)
    assert len(g) == 30
    assert g.sh_degree == 1
    sub = g[np.arange(30) < 10]
    assert len(sub) == 10
    both = GaussianSplatModel.cat([sub, sub])
    assert len(both) == 20
    t = np.eye(4, dtype=np.float32)
    t[:3, 3] = [1, 0, 0]
    g.transform = t
    g2 = g.as_transformed()
    np.testing.assert_allclose(np.asarray(g2.positions),
                               xyz + np.array([1, 0, 0]), atol=1e-5)
    assert GaussianSplatModel.compute_num_sh_coeff(2) == 9
