import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kaolin_tpu.render.camera import (
    Camera,
    CameraExtrinsics,
    OrthographicIntrinsics,
    PinholeIntrinsics,
    generate_pinhole_rays,
)

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()

EYE = [0.5, 1.0, 3.0]
AT = [0.0, 0.0, 0.0]
UP = [0.0, 1.0, 0.0]


@pytest.fixture
def camera():
    return Camera.from_args(eye=jnp.asarray(EYE), at=jnp.asarray(AT),
                            up=jnp.asarray(UP), fov=0.6, width=64, height=48)


def _ref_camera():
    import torch
    return ref_kaolin.render.camera.Camera.from_args(
        eye=torch.tensor(EYE), at=torch.tensor(AT), up=torch.tensor(UP),
        fov=0.6, width=64, height=48)


def test_lookat_view_matrix_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    ref = _ref_camera()
    np.testing.assert_allclose(camera.extrinsics.view_matrix(),
                               ref.view_matrix().numpy(), atol=1e-5)


def test_projection_matrix_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    ref = _ref_camera()
    np.testing.assert_allclose(camera.intrinsics.projection_matrix(),
                               ref.projection_matrix().numpy(), atol=1e-4)


def test_transform_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    ref = _ref_camera()
    pts = np.random.RandomState(0).randn(17, 3).astype(np.float32)
    got = camera.transform(jnp.asarray(pts))
    want = ref.transform(torch.tensor(pts)).numpy()
    np.testing.assert_allclose(got.reshape(want.shape), want, atol=1e-4)


def test_pinhole_rays_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    ref = _ref_camera()
    ray_o, ray_d = generate_pinhole_rays(camera)
    want_o, want_d = ref_kaolin.render.camera.raygen.generate_pinhole_rays(ref)
    np.testing.assert_allclose(ray_o, want_o.numpy(), atol=1e-5)
    np.testing.assert_allclose(ray_d, want_d.numpy(), atol=1e-5)


def test_ortho_camera_transform():
    cam = Camera.from_args(eye=jnp.asarray(EYE), at=jnp.asarray(AT),
                           up=jnp.asarray(UP), fov_distance=2.0,
                           width=32, height=32)
    pts = jnp.asarray([[0.0, 0.0, 0.0]])
    ndc = cam.transform(pts)
    assert ndc.shape == (1, 1, 3)
    assert np.isfinite(np.asarray(ndc)).all()
    if ref_kaolin is not None:
        import torch
        ref = ref_kaolin.render.camera.Camera.from_args(
            eye=torch.tensor(EYE), at=torch.tensor(AT), up=torch.tensor(UP),
            fov_distance=2.0, width=32, height=32)
        want = ref.transform(torch.tensor([[0.0, 0.0, 0.0]])).numpy()
        np.testing.assert_allclose(np.asarray(ndc).reshape(want.shape), want,
                                   atol=1e-5)


def test_cam_pos_roundtrip(camera):
    pos = camera.extrinsics.cam_pos()[..., 0]
    np.testing.assert_allclose(pos[0], EYE, atol=1e-5)


def test_inv_view_matrix(camera):
    m = camera.extrinsics.view_matrix()
    minv = camera.extrinsics.inv_view_matrix()
    np.testing.assert_allclose(m @ minv, np.eye(4)[None], atol=1e-5)


def test_transform_center_maps_to_origin(camera):
    ndc = camera.transform(jnp.asarray([AT]))
    np.testing.assert_allclose(ndc[0, 0, :2], 0.0, atol=1e-6)


def test_camera_jit_and_grad(camera):
    pts = jnp.asarray([[0.1, 0.2, 0.3]])

    @jax.jit
    def depth_of(cam, p):
        return jnp.sum(cam.transform(p)[..., 2])

    v1 = depth_of(camera, pts)
    assert np.isfinite(float(v1))

    def loss(params):
        ext = CameraExtrinsics(params)
        cam = Camera(ext, camera.intrinsics)
        return jnp.sum(cam.transform(pts) ** 2)

    g = jax.grad(loss)(camera.extrinsics.params)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_6dof_backend_consistency(camera):
    ext6 = camera.extrinsics.switch_backend("matrix_6dof_rotation")
    np.testing.assert_allclose(ext6.view_matrix(),
                               camera.extrinsics.view_matrix(), atol=1e-5)


def test_camera_batching():
    cams = Camera.cat([
        Camera.from_args(eye=jnp.asarray(EYE), at=jnp.asarray(AT),
                         up=jnp.asarray(UP), fov=0.6, width=64, height=48),
        Camera.from_args(eye=jnp.asarray([1.0, 0.0, 2.0]), at=jnp.asarray(AT),
                         up=jnp.asarray(UP), fov=0.6, width=64, height=48)])
    assert len(cams) == 2
    pts = jnp.asarray([[0.0, 0.0, 0.0]])
    assert cams.transform(pts).shape == (2, 1, 3)
    single = cams[1]
    assert len(single) == 1


def test_move_and_rotate(camera):
    moved = camera.extrinsics.move_forward(1.0)
    pos0 = np.asarray(camera.extrinsics.cam_pos()[0, :, 0])
    pos1 = np.asarray(moved.cam_pos()[0, :, 0])
    direction = np.asarray(camera.extrinsics.cam_forward()[0, :, 0])
    np.testing.assert_allclose(pos1 - pos0, direction, atol=1e-5)

    rotated = camera.extrinsics.rotate(yaw=0.3)
    # rotation preserves camera position
    np.testing.assert_allclose(rotated.cam_pos()[0, :, 0],
                               camera.extrinsics.cam_pos()[0, :, 0], atol=1e-5)


# ---- extended parity vs the reference camera (pure torch CPU) ----

def _ref_ortho_camera():
    import torch
    return ref_kaolin.render.camera.Camera.from_args(
        eye=torch.tensor(EYE), at=torch.tensor(AT), up=torch.tensor(UP),
        fov_distance=2.0, width=64, height=64)


def test_ortho_projection_parity():
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    ours = Camera.from_args(eye=jnp.asarray(EYE), at=jnp.asarray(AT),
                            up=jnp.asarray(UP), fov_distance=2.0,
                            width=64, height=64)
    theirs = _ref_ortho_camera()
    np.testing.assert_allclose(np.asarray(ours.intrinsics.projection_matrix()),
                               theirs.projection_matrix().numpy(), atol=1e-5)
    pts = np.random.RandomState(3).randn(9, 3).astype(np.float32)
    got = ours.transform(jnp.asarray(pts))
    want = theirs.transform(torch.tensor(pts)).numpy()
    np.testing.assert_allclose(np.asarray(got).reshape(want.shape), want,
                               atol=1e-4)


def test_perspective_and_ndc_matrix_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    theirs = _ref_camera()
    np.testing.assert_allclose(
        np.asarray(camera.intrinsics.perspective_matrix()),
        theirs.intrinsics.perspective_matrix().numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(camera.intrinsics.ndc_matrix(-1, 1, -1, 1, 0.1, 100.0)),
        theirs.intrinsics.ndc_matrix(-1, 1, -1, 1, 0.1, 100.0).numpy(),
        atol=1e-5)


def test_zoom_and_fov_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    theirs = _ref_camera()
    from kaolin_tpu.render.camera import CameraFOV
    ref_fov_mod = ref_kaolin.render.camera.intrinsics.CameraFOV
    np.testing.assert_allclose(
        np.asarray(camera.intrinsics.fov(CameraFOV.HORIZONTAL)),
        theirs.intrinsics.fov(ref_fov_mod.HORIZONTAL).numpy(), atol=1e-4)
    zoomed = camera.intrinsics.zoom(0.2)   # ours is pure; theirs mutates
    theirs.intrinsics.zoom(0.2)
    np.testing.assert_allclose(
        np.asarray(zoomed.projection_matrix()),
        theirs.intrinsics.projection_matrix().numpy(), atol=1e-4)


def test_move_rotate_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    theirs = _ref_camera()
    ours = camera.extrinsics.move_forward(0.5)   # ours is pure
    theirs.extrinsics.move_forward(0.5)
    ours = ours.rotate(yaw=0.2, pitch=0.1, roll=0.05)
    theirs.extrinsics.rotate(yaw=0.2, pitch=0.1, roll=0.05)
    np.testing.assert_allclose(np.asarray(ours.view_matrix()),
                               theirs.extrinsics.view_matrix().numpy(),
                               atol=1e-4)
    for o, t in ((ours.cam_right(), theirs.extrinsics.cam_right()),
                 (ours.cam_up(), theirs.extrinsics.cam_up()),
                 (ours.cam_forward(),
                  theirs.extrinsics.cam_forward())):
        np.testing.assert_allclose(np.asarray(o).reshape(t.shape), t.numpy(),
                                   atol=1e-4)


def test_change_coordinate_system_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    from kaolin_tpu.render.camera import blender_coords
    theirs = _ref_camera()
    basis = np.asarray(blender_coords(), np.float32)
    ref_basis = ref_kaolin.render.camera.blender_coords()
    np.testing.assert_allclose(basis, ref_basis.numpy())
    ours = camera.extrinsics.change_coordinate_system(jnp.asarray(basis))
    theirs.extrinsics.change_coordinate_system(torch.as_tensor(ref_basis))
    np.testing.assert_allclose(np.asarray(ours.view_matrix()),
                               theirs.extrinsics.view_matrix().numpy(),
                               atol=1e-4)


def test_view_projection_and_cat_getitem_parity(camera):
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    theirs = _ref_camera()
    np.testing.assert_allclose(np.asarray(camera.view_projection_matrix()),
                               theirs.view_projection_matrix().numpy(),
                               atol=1e-4)
    ref_cat = ref_kaolin.render.camera.Camera.cat([theirs, theirs])
    our_cat = Camera.cat([camera, camera])
    assert len(ref_cat) == len(our_cat) == 2
    np.testing.assert_allclose(np.asarray(our_cat[1].view_matrix()),
                               ref_cat[1].view_matrix().numpy(), atol=1e-4)
