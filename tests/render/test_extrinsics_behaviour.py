"""Behavioral suite for CameraExtrinsics, mirroring the reference's
extrinsics coverage (reference tests/python/kaolin/render/camera/
test_extrinsics.py): constructors agree, camera axes stay orthonormal under
motion ops, world/camera round trips, backend switching preserves semantics,
coordinate-system changes invert cleanly, and cat/getitem slicing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.render.camera import CameraExtrinsics
from kaolin_tpu.render.camera.extrinsics import allclose as ext_allclose


EYE = jnp.asarray([[4.0, 4.0, 4.0]])
AT = jnp.asarray([[0.0, 0.0, 0.0]])
UP = jnp.asarray([[0.0, 1.0, 0.0]])


@pytest.fixture(params=["matrix_se3", "matrix_6dof_rotation"])
def ext(request):
    return CameraExtrinsics.from_lookat(
        EYE, AT, UP, backend=request.param)


def _axes(e):
    return (np.asarray(e.cam_right()).reshape(3),
            np.asarray(e.cam_up()).reshape(3),
            np.asarray(e.cam_forward()).reshape(3))


def _assert_orthonormal(e, atol=1e-5):
    r, u, f = _axes(e)
    for v in (r, u, f):
        np.testing.assert_allclose(np.linalg.norm(v), 1.0, atol=atol)
    assert abs(r @ u) < atol and abs(r @ f) < atol and abs(u @ f) < atol


class TestConstructors:
    def test_lookat_vs_camera_pose(self, ext):
        # orientation matrix holds the camera axes (from_camera_pose takes
        # axes-as-rows-in-world, i.e. R^T of the view rotation)
        cam_dir = jnp.swapaxes(ext.R, -1, -2)
        pose = CameraExtrinsics.from_camera_pose(
            ext.cam_pos().reshape(1, 3), cam_dir, backend=ext.backend)
        np.testing.assert_allclose(np.asarray(pose.cam_pos()),
                                   np.asarray(ext.cam_pos()), atol=1e-5)
        np.testing.assert_allclose(np.asarray(pose.view_matrix()),
                                   np.asarray(ext.view_matrix()), atol=1e-5)

    def test_view_matrix_roundtrip(self, ext):
        rebuilt = CameraExtrinsics.from_view_matrix(ext.view_matrix(),
                                            backend=ext.backend)
        assert ext_allclose(rebuilt, ext, atol=1e-5)

    def test_lookat_points_at_target(self, ext):
        # the target direction must be the forward axis (sign per kaolin's
        # convention: forward points from eye towards at)
        to_target = np.array(AT - EYE, dtype=np.float64).reshape(3)
        to_target = to_target / np.linalg.norm(to_target)
        _, _, f = _axes(ext)
        np.testing.assert_allclose(np.abs(to_target @ f), 1.0, atol=1e-5)


class TestMotionOps:
    def test_translate_moves_pos_only(self, ext):
        before_axes = _axes(ext)
        moved = ext.translate(jnp.asarray([1.0, -2.0, 0.5]).reshape(3, 1))
        np.testing.assert_allclose(
            np.asarray(moved.cam_pos()).reshape(3),
            np.asarray(ext.cam_pos()).reshape(3) + [1.0, -2.0, 0.5],
            atol=1e-5)
        for a, b in zip(_axes(moved), before_axes):
            np.testing.assert_allclose(a, b, atol=1e-5)

    @pytest.mark.parametrize("move,axis_fn,sign", [
        ("move_right", "cam_right", 1.0),
        ("move_up", "cam_up", 1.0),
        ("move_forward", "cam_forward", 1.0),
    ])
    def test_moves_follow_camera_axes(self, ext, move, axis_fn, sign):
        amount = 1.7
        moved = getattr(ext, move)(amount)
        axis = np.asarray(getattr(ext, axis_fn)()).reshape(3)
        delta = (np.asarray(moved.cam_pos()).reshape(3)
                 - np.asarray(ext.cam_pos()).reshape(3))
        np.testing.assert_allclose(delta, sign * amount * axis, atol=1e-4)
        _assert_orthonormal(moved)

    @pytest.mark.parametrize("kw", [dict(yaw=0.3), dict(pitch=0.25),
                                    dict(roll=0.5),
                                    dict(yaw=0.2, pitch=0.1, roll=-0.4)])
    def test_rotate_keeps_orthonormal_frame(self, ext, kw):
        rotated = ext.rotate(**kw)
        _assert_orthonormal(rotated)

    def test_roll_spins_about_forward(self, ext):
        rolled = ext.rotate(roll=np.pi / 2)
        _, _, f0 = _axes(ext)
        _, _, f1 = _axes(rolled)
        np.testing.assert_allclose(f0, f1, atol=1e-4)  # forward unchanged
        r0, u0, _ = _axes(ext)
        r1, _, _ = _axes(rolled)
        # right rotates into the old up plane
        assert abs(abs(r1 @ u0) - 1.0) < 1e-4

    def test_rotations_keep_position(self, ext):
        rotated = ext.rotate(yaw=0.7, pitch=-0.2)
        np.testing.assert_allclose(np.asarray(rotated.cam_pos()),
                                   np.asarray(ext.cam_pos()), atol=1e-4)


class TestTransforms:
    def test_cam_pos_maps_to_origin(self, ext):
        out = ext.transform(ext.cam_pos().reshape(1, 1, 3))
        np.testing.assert_allclose(np.asarray(out).reshape(3), 0.0, atol=1e-5)

    def test_transform_preserves_distances(self, ext, key):
        pts = jax.random.normal(key, (1, 16, 3))
        out = ext.transform(pts)
        d_in = np.asarray(jnp.linalg.norm(pts[0, :1] - pts[0, 1:], axis=-1))
        d_out = np.asarray(jnp.linalg.norm(out[0, :1] - out[0, 1:], axis=-1))
        np.testing.assert_allclose(d_in, d_out, rtol=1e-4)

    def test_inv_transform_rays_roundtrip(self, ext, key):
        # camera-space rays through the origin map back to world rays from
        # the camera position
        dirs = jax.random.normal(key, (1, 8, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        orig = jnp.zeros((1, 8, 3))
        w_orig, w_dir = ext.inv_transform_rays(orig, dirs)
        np.testing.assert_allclose(
            np.asarray(w_orig),
            np.broadcast_to(np.asarray(ext.cam_pos()).reshape(1, 1, 3),
                            (1, 8, 3)), atol=1e-4)
        # directions keep unit length (rigid inverse)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(w_dir, axis=-1)), 1.0, atol=1e-4)

    def test_view_and_inv_view_compose_to_identity(self, ext):
        prod = ext.view_matrix() @ ext.inv_view_matrix()
        np.testing.assert_allclose(np.asarray(prod).reshape(4, 4), np.eye(4),
                                   atol=1e-4)


class TestBackends:
    def test_switch_backend_preserves_view(self, ext):
        for target in CameraExtrinsics.available_backends():
            switched = ext.switch_backend(target)
            np.testing.assert_allclose(np.asarray(switched.view_matrix()),
                                       np.asarray(ext.view_matrix()),
                                       atol=1e-4)

    def test_param_counts_differ_by_backend(self):
        se3 = CameraExtrinsics.from_lookat(EYE, AT, UP, backend="matrix_se3")
        dof = CameraExtrinsics.from_lookat(EYE, AT, UP,
                                           backend="matrix_6dof_rotation")
        assert se3.parameters().shape != dof.parameters().shape

    def test_update_replaces_view_matrix(self, ext):
        other = CameraExtrinsics.from_lookat(EYE + 2.0, AT, UP,
                                             backend=ext.backend)
        updated = ext.update(other.view_matrix())
        np.testing.assert_allclose(np.asarray(updated.view_matrix()),
                                   np.asarray(other.view_matrix()),
                                   atol=1e-5)


class TestCoordinateSystems:
    def test_change_and_reset(self, ext):
        # blender-style basis: x right, z up, -y forward
        basis = jnp.asarray([[1.0, 0.0, 0.0],
                             [0.0, 0.0, 1.0],
                             [0.0, -1.0, 0.0]])
        changed = ext.change_coordinate_system(basis)
        restored = changed.reset_coordinate_system()
        np.testing.assert_allclose(np.asarray(restored.view_matrix()),
                                   np.asarray(ext.view_matrix()), atol=1e-5)
        # the changed camera maps basis-transformed world points like the
        # original maps raw points
        pts = jnp.asarray([[[0.4, -1.2, 2.0]]])
        lhs = changed.transform(pts @ basis.T.astype(pts.dtype))
        rhs = ext.transform(pts)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-4)


class TestBatching:
    def test_cat_and_index(self):
        a = CameraExtrinsics.from_lookat(EYE, AT, UP)
        b = CameraExtrinsics.from_lookat(EYE + 1.0, AT, UP)
        both = CameraExtrinsics.cat([a, b])
        assert both.view_matrix().shape[0] == 2
        np.testing.assert_allclose(np.asarray(both.view_matrix()[0]),
                                   np.asarray(a.view_matrix()[0]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(both.view_matrix()[1]),
                                   np.asarray(b.view_matrix()[0]), atol=1e-6)

    def test_batched_lookat(self):
        eyes = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 4.0, 0.001]])
        ats = jnp.zeros((2, 3))
        ups = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
        ext = CameraExtrinsics.from_lookat(eyes, ats, ups)
        np.testing.assert_allclose(np.asarray(ext.cam_pos()).reshape(2, 3),
                                   np.asarray(eyes), atol=1e-5)

    def test_dict_roundtrip_batched(self):
        eyes = jnp.asarray([[4.0, 0.0, 0.0], [0.0, 0.0, 4.0]])
        ext = CameraExtrinsics.from_lookat(eyes, jnp.zeros((2, 3)),
                                           jnp.tile(UP, (2, 1)))
        back = CameraExtrinsics.from_dict(ext.as_dict())
        assert ext_allclose(back, ext, atol=1e-6)
