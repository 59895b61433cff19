"""Bayesian-fusion reconstruction (3-state octrees from RGBD).

No golden data ships with the reference for bf_recon, so these tests check
the algorithm's invariants end-to-end: carving a raytraced sphere SPC from
several views must mark outside space empty (-1), inside space unseen (< -1),
and reconstruct occupied voxels on the sphere surface.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops.spc import (
    RayTracedSPCDataset,
    bf_recon,
    scan_octrees,
    unbatched_points_to_octree,
)
from kaolin_tpu.ops.spc.bf_recon import (
    bq_profile,
    dbq_profile,
    extract_bq,
    fuse_bf,
    process_frame,
    unbatched_query,
)

LEVEL = 6


@pytest.fixture(scope="module")
def sphere_spc():
    """Solid-shell sphere octree at LEVEL."""
    res = 2 ** LEVEL
    g = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt(x * x + y * y + z * z)
    shell = np.abs(r - 0.6) < (2.5 / res)
    pts = np.stack(np.nonzero(shell), axis=-1).astype(np.int16)
    octree = unbatched_points_to_octree(jnp.asarray(pts), LEVEL)
    return octree


# distance-6 cameras: the 0.644-rad frusta cover the whole [-1, 1] cube,
# so all outside space is observed empty
_VIEWS = np.array([
    [6.0, 0.0, 0.9], [-6.0, 0.0, 0.9], [0.0, 6.0, 0.9],
    [0.0, -6.0, 0.9], [0.9, 0.9, 6.0], [0.9, 0.9, -6.0],
], dtype=np.float32)


@pytest.fixture(scope="module")
def recon(sphere_spc):
    dataset = RayTracedSPCDataset(_VIEWS, sphere_spc, res=7)
    octree, empty, colors, normals = bf_recon(dataset, final_level=LEVEL,
                                              sigma=0.05)
    assert octree is not None, "reconstruction degenerated"
    return octree, empty, colors, normals


def test_profile_curve_limits():
    x = jnp.asarray([-5.0, -3.0, 7.0, 100.0])
    p = np.asarray(bq_profile(x))
    np.testing.assert_allclose(p[:2], 0.0, atol=1e-7)
    np.testing.assert_allclose(p[2:], 0.5, atol=1e-7)
    xs = jnp.linspace(-4.0, 7.0, 441)
    ps = np.asarray(bq_profile(xs))
    # p(0) = 0.5 exactly at the surface, rising through it
    np.testing.assert_allclose(
        np.asarray(bq_profile(jnp.asarray([0.0]))), 0.5, atol=1e-3)
    # peaks at ~0.9 just behind the surface, then decays back to 0.5
    assert 0.85 < ps.max() < 0.95
    assert np.all(ps >= -1e-6) and np.all(ps <= 1.0)
    # derivative consistent with finite differences
    d = np.asarray(dbq_profile(xs))
    fd = np.gradient(ps, np.asarray(xs))
    np.testing.assert_allclose(d, fd, atol=0.05)


def test_bf_recon_structure(recon):
    octree, empty, colors, normals = recon
    # valid paired encoding: every octree bit must also be set in empty
    o = np.asarray(octree)
    e = np.asarray(empty)
    assert o.shape == e.shape
    assert np.all((o & e) == o)
    # scan must succeed and give LEVEL levels
    level, pyr, exsum = scan_octrees(jnp.asarray(o),
                                     np.array([len(o)], dtype=np.int32))
    assert level == LEVEL
    n_leaves = int(np.asarray(pyr)[0, 0, LEVEL])
    assert colors.shape == (n_leaves, 4)
    assert normals.shape == (n_leaves, 3)


def test_bf_recon_three_states(recon, sphere_spc):
    octree, empty, _, _ = recon
    level, pyr, exsum = scan_octrees(
        jnp.asarray(octree), np.array([len(octree)], dtype=np.int32))

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.95, 0.95, (4096, 3)).astype(np.float32)
    r = np.linalg.norm(pts, axis=-1)
    pidx = np.asarray(unbatched_query(
        octree, empty, exsum, jnp.asarray(pts), LEVEL))

    far_outside = r > 0.75
    deep_inside = r < 0.45
    near_surface = np.abs(r - 0.6) < 0.02

    # outside: seen-through by the cameras → empty (-1)
    frac_out_empty = (pidx[far_outside] == -1).mean()
    assert frac_out_empty > 0.95, frac_out_empty
    # inside: never observed → unseen (< -1)
    frac_in_unseen = (pidx[deep_inside] < -1).mean()
    assert frac_in_unseen > 0.95, frac_in_unseen
    # surface band: mostly resolved to occupied leaves
    frac_surf_occ = (pidx[near_surface] >= 0).mean()
    assert frac_surf_occ > 0.5, frac_surf_occ


def test_bf_recon_surface_radius(recon):
    octree, empty, _, _ = recon
    from kaolin_tpu.ops.spc import generate_points
    level, pyr, exsum = scan_octrees(
        jnp.asarray(octree), np.array([len(octree)], dtype=np.int32))
    ph = np.asarray(generate_points(jnp.asarray(octree), pyr, exsum))
    pyr0 = np.asarray(pyr)[0]
    start = int(pyr0[1, LEVEL])
    num = int(pyr0[0, LEVEL])
    leaves = ph[start:start + num]
    centers = (leaves + 0.5) / (2 ** LEVEL) * 2.0 - 1.0
    r = np.linalg.norm(centers, axis=-1)
    # occupied voxels concentrate near the sphere surface (r=0.6)
    assert np.median(np.abs(r - 0.6)) < 0.05
    assert (np.abs(r - 0.6) < 0.1).mean() > 0.95


def test_extract_bq(recon, sphere_spc):
    dataset = RayTracedSPCDataset(_VIEWS, sphere_spc, res=7)
    spc0 = None
    for batch in dataset:
        if not batch[9]:
            continue
        frame = process_frame(batch, LEVEL, 0.05)
        spc0 = frame if spc0 is None else fuse_bf(spc0, frame)
    octree, empty, colors, normals = extract_bq(spc0)
    assert octree is not None and len(octree) > 0
    level, pyr, exsum = scan_octrees(
        jnp.asarray(octree), np.array([len(octree)], dtype=np.int32))
    assert level == LEVEL
    n_leaves = int(np.asarray(pyr)[0, 0, LEVEL])
    assert n_leaves > 0
    assert colors.shape[0] == n_leaves
