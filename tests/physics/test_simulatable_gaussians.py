"""End-to-end "simulatable 3DGS scene" (BASELINE.json config 5; reference
simulatable_3dgrut tutorial): gaussian splats → sample_points_in_volume
densifier → SimplicitsObject → SimplicitsScene with collisions + floor →
simulate → LBS-deform the renderable gaussian centers."""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.gaussians import sample_points_in_volume
from kaolin_tpu.physics.simplicits import (
    PhysicsPoints,
    SimplicitsObject,
    SimplicitsScene,
)


@pytest.fixture(scope="module")
def gaussian_shell():
    """Sphere-shell gaussians at radius 0.4 centered at (0, 0.5, 0)."""
    rng = np.random.RandomState(0)
    n = 600
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    xyz = (0.4 * d + np.array([0.0, 0.5, 0.0])).astype(np.float32)
    scales = np.full((n, 3), 0.06, dtype=np.float32)
    rots = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.9, dtype=np.float32)
    return xyz, scales, rots, opac


@pytest.fixture(scope="module")
def volume_points(gaussian_shell):
    xyz, scales, rots, opac = gaussian_shell
    pts = sample_points_in_volume(xyz, scales, rots, opac, octree_level=6,
                                  num_samples=400, method="floodfill")
    return np.asarray(pts)


def test_densifier_fills_gaussian_interior(volume_points, gaussian_shell):
    xyz = gaussian_shell[0]
    center = np.array([0.0, 0.5, 0.0])
    r = np.linalg.norm(volume_points - center, axis=1)
    assert volume_points.shape[0] > 100
    assert (r < 0.2).mean() > 0.05  # deep interior filled
    assert r.max() < 0.65  # gaussian footprint (0.4 + ~3 sigma) bound


def test_simulate_gaussians_drop(volume_points, gaussian_shell):
    xyz = gaussian_shell[0]
    phys = PhysicsPoints(pts=jnp.asarray(volume_points), yms=2e5, prs=0.45,
                         rhos=500.0, appx_vol=4 / 3 * np.pi * 0.4 ** 3)

    # analytic skinning field (keeps the test fast; same operator shapes as
    # a trained MLP)
    def weights(x):
        return jnp.sin(x @ jnp.asarray(np.random.RandomState(1)
                                       .randn(3, 7).astype(np.float32)))

    obj = SimplicitsObject.create_from_function(phys, weights)

    scene = SimplicitsScene(timestep=0.03, max_newton_steps=3,
                            max_ls_steps=10, direct_solve=True)
    obj_idx = scene.add_object(obj, num_qp=256,
                               renderable_pts=jnp.asarray(xyz))
    scene.set_scene_gravity(jnp.asarray([0.0, 9.8, 0.0]))
    scene.set_scene_floor(floor_height=0.0, floor_axis=1,
                          floor_penalty=1000.0)
    scene.enable_collisions()

    y0 = float(jnp.mean(scene.get_object_deformed_pts(obj_idx)[:, 1]))
    for _ in range(25):
        scene.run_sim_step()
    deformed = scene.get_object_deformed_pts(obj_idx)
    y1 = float(jnp.mean(deformed[:, 1]))
    assert y1 < y0 - 0.05, (y0, y1)           # it fell
    assert float(jnp.min(deformed[:, 1])) > -0.15  # floor held
    assert np.isfinite(np.asarray(deformed)).all()

    # render path: LBS-deform the original gaussian centers
    moved = scene.get_object_deformed_pts(obj_idx, points="rendered")
    assert moved.shape == xyz.shape
    assert float(jnp.mean(moved[:, 1])) < 0.5  # gaussians follow the body
    assert np.isfinite(np.asarray(moved)).all()

    # per-gaussian 4x4 transforms drive full gaussian rendering
    tfms = scene.get_object_point_transforms(obj_idx, points="rendered")
    assert tfms.shape == (xyz.shape[0], 4, 4)
    assert np.isfinite(np.asarray(tfms)).all()
