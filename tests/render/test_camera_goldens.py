"""Camera-convention golden tensors.

Frozen outputs of the REFERENCE implementation (kaolin v0.18.0, CPU),
generated with ``Camera.from_args(eye=(4,4,4), at=0, up=+y, fov=30deg,
800x600, near=1e-2, far=1e2)`` and the ortho camera below. These pin the
conventions — right-handed lookat, left-handed NDC (depth grows into the
screen), perspective x projection split, principal-point handling — without
needing the reference importable (the live-oracle tests in test_camera.py
cover the same paths when it is).
"""

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.render.camera import Camera

PTS = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [-1.0, 0.5, 2.0]])

GOLD_VIEW = np.asarray(
    [[[0.70710677, 0.0, -0.70710677, 0.0],
      [-0.40824828, 0.81649655, -0.40824828, 0.0],
      [0.57735026, 0.57735026, 0.57735026, -6.928203],
      [0.0, 0.0, 0.0, 1.0]]], np.float32)
GOLD_PROJ = np.asarray(
    [[[2.799038, 0.0, 0.0, 0.0],
      [0.0, 3.732051, 0.0, 0.0],
      [0.0, 0.0, -1.0002, -0.020002],
      [0.0, 0.0, -1.0, 0.0]]], np.float32)
GOLD_TRANSFORM = np.asarray(
    [[0.0, 0.0, 0.99731296],
     [-1.1427023, 0.0, 0.99442595],
     [-0.9794592, 0.0, 0.99690056]], np.float32)
GOLD_ORTHO_PROJ = np.asarray(
    [[[0.5, 0.0, 0.0, 0.0],
      [0.0, 0.6666667, 0.0, 0.0],
      [0.0, 0.0, -0.04008016, -1.004008],
      [0.0, 0.0, 0.0, 1.0]]], np.float32)
GOLD_ORTHO_TRANSFORM = np.asarray(
    [[0.0, 0.0, -0.82476413],
     [0.5, 0.29814243, -0.96815926],
     [-0.5, -0.2981424, -0.9054239]], np.float32)
GOLD_RAY0_DIR = np.asarray([-0.85746545, -0.327815, -0.3965985], np.float32)
GOLD_RAYMID_DIR = np.asarray([-0.5768521, -0.57771486, -0.57748365],
                             np.float32)
GOLD_RAYLAST_DIR = np.asarray([-0.19712046, -0.72677094, -0.6579874],
                              np.float32)


def _pinhole():
    return Camera.from_args(eye=jnp.asarray([4.0, 4.0, 4.0]),
                            at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                            fov=30 * np.pi / 180, width=800, height=600,
                            near=1e-2, far=1e2)


def test_pinhole_view_projection_goldens():
    cam = _pinhole()
    np.testing.assert_allclose(np.asarray(cam.extrinsics.view_matrix()),
                               GOLD_VIEW, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.intrinsics.projection_matrix()),
                               GOLD_PROJ, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam.transform(PTS))[0],
                               GOLD_TRANSFORM, atol=1e-5)


def test_ortho_goldens():
    cam = Camera.from_args(eye=jnp.asarray([0.0, 2.0, 4.0]),
                           at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                           fov_distance=1.5, width=640, height=480,
                           near=1e-1, far=50.0)
    np.testing.assert_allclose(np.asarray(cam.intrinsics.projection_matrix()),
                               GOLD_ORTHO_PROJ, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cam.transform(PTS))[0],
                               GOLD_ORTHO_TRANSFORM, atol=1e-5)


def test_pinhole_ray_goldens():
    cam = _pinhole()
    origins, dirs = cam.generate_rays()
    np.testing.assert_allclose(np.asarray(origins[0]), [4.0, 4.0, 4.0],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dirs[0]), GOLD_RAY0_DIR, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dirs[800 * 300 + 400]),
                               GOLD_RAYMID_DIR, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dirs[-1]), GOLD_RAYLAST_DIR,
                               atol=1e-5)
