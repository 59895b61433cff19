"""Camera differentiable-parameter machinery (VERDICT r2 #5).

Reference parity: ``kaolin/render/camera/camera.py:416-466`` (parameters,
gradient_mask), ``:686`` (named_params), ``intrinsics.py:148-172``
(as_dict/from_dict), ``extrinsics.py:977-1146`` (parameters/gradient_mask),
validated against the reference implementation via the CPU shim where the
semantics are tensor-valued.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.render.camera import Camera
from kaolin_tpu.render.camera.camera import allclose as camera_allclose

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()


@pytest.fixture
def camera():
    return Camera.from_args(eye=jnp.asarray([2.0, 1.0, 2.0]),
                            at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                            fov=0.8, width=64, height=64)


def _ref_camera():
    import torch
    return ref_kaolin.render.camera.Camera.from_args(
        eye=torch.tensor([2.0, 1.0, 2.0]), at=torch.zeros(3),
        up=torch.tensor([0.0, 1.0, 0.0]), fov=0.8, width=64, height=64,
        device="cpu")


def test_parameters_shapes(camera):
    ext_p, int_p = camera.parameters()
    assert ext_p.shape == (1, 12)   # matrix_se3: 9 R + 3 t
    assert int_p.shape == (1, 4)    # x0, y0, focal_x, focal_y


@pytest.mark.skipif(ref_kaolin is None, reason="reference unavailable")
def test_gradient_mask_parity_with_reference(camera):
    """Semantic parity: each backend has its own params layout (the
    reference's matrix_se3 stores a flat 4x4 with t at [3, 7, 11]; ours
    stores 9 R + 3 t), so masks must select each backend's OWN indices for
    the same semantic slots, with matching selected-entry counts."""
    ref_cam = _ref_camera()
    for slots, n_ext_sel in ((("t",), 3), (("R",), 9), (("R", "t"), 12)):
        ours_ext, ours_int = camera.gradient_mask(*slots, "focal_x")
        ref_ext, ref_int = ref_cam.gradient_mask(*slots, "focal_x")
        want = sorted(sum((camera.extrinsics.param_idx(s) for s in slots),
                          []))
        got = np.nonzero(np.asarray(ours_ext)[0])[0].tolist()
        assert got == want
        assert int(np.asarray(ours_ext).sum()) == n_ext_sel
        assert int(ref_ext.sum()) == n_ext_sel  # same semantic count
        # intrinsics layouts agree exactly (both: x0, y0, focal_x, focal_y)
        np.testing.assert_array_equal(np.asarray(ours_int),
                                      ref_int.cpu().numpy())


@pytest.mark.skipif(ref_kaolin is None, reason="reference unavailable")
def test_named_params_parity(camera):
    ours = camera.named_params()
    ref = _ref_camera().named_params()
    assert len(ours) == len(ref) == 1
    assert set(ours[0]) == set(ref[0])
    for k in ("x0", "y0", "focal_x", "focal_y"):
        np.testing.assert_allclose(ours[0][k], float(ref[0][k]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ours[0]["t"]).ravel(),
                               ref[0]["t"].cpu().numpy().ravel(), atol=1e-5)


def test_gradient_mask_6dof_backend():
    cam = Camera.from_args(eye=jnp.asarray([2.0, 1.0, 2.0]),
                           at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                           fov=0.8, width=64, height=64,
                           backend="matrix_6dof_rotation")
    m_ext, _ = cam.gradient_mask("t")
    assert m_ext.shape == (1, 9)
    assert np.asarray(m_ext)[0].tolist() == [False] * 6 + [True] * 3


def test_unknown_param_raises(camera):
    with pytest.raises(ValueError):
        camera.intrinsics.gradient_mask("bogus")


def test_dict_roundtrip(camera):
    import json
    d = json.loads(json.dumps(camera.to_dict()))  # must be JSON-writable
    cam2 = Camera.from_dict(d)
    assert camera_allclose(camera, cam2, atol=1e-6)
    assert cam2.lens_type == camera.lens_type
    assert cam2.width == camera.width


def test_ortho_dict_roundtrip():
    cam = Camera.from_args(eye=jnp.asarray([2.0, 1.0, 2.0]),
                           at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                           fov_distance=1.5, width=32, height=32)
    cam2 = Camera.from_dict(cam.to_dict())
    assert camera_allclose(cam, cam2, atol=1e-6)
    assert cam2.lens_type == "ortho"


def test_masked_toy_fit_trains_only_selected_params(camera):
    """Optimize camera position + focal length only (mask pattern of the
    reference's gradient_mask docstring): project fixed world points, L2 to
    target pixels from a perturbed camera. R and principal point must stay
    EXACTLY fixed; t and focals must move; loss must drop."""
    pts = jnp.asarray(np.random.RandomState(0).uniform(-0.5, 0.5, (64, 3)),
                      jnp.float32)
    target_cam = camera
    target = target_cam.transform(pts)

    ext0 = camera.extrinsics.params + jnp.asarray(
        [0.0] * 9 + [0.15, -0.1, 0.2])[None]   # perturb t only (keep R exact)
    int0 = camera.intrinsics.params * jnp.asarray([1.0, 1.0, 1.3, 1.3])[None]
    m_ext, m_int = camera.gradient_mask("t", "focal_x", "focal_y")

    def loss_fn(ext_p, int_p):
        cam = Camera(type(camera.extrinsics)(ext_p,
                                             camera.extrinsics.backend),
                     jax.tree_util.tree_unflatten(
                         jax.tree_util.tree_structure(camera.intrinsics),
                         [int_p]))
        return jnp.mean((cam.transform(pts) - target) ** 2)

    ext_p, int_p = ext0, int0
    loss0 = float(loss_fn(ext_p, int_p))
    for _ in range(200):
        g_ext, g_int = jax.grad(loss_fn, argnums=(0, 1))(ext_p, int_p)
        ext_p = ext_p - 0.05 * g_ext * m_ext
        int_p = int_p - 2000.0 * g_int * m_int
    loss1 = float(loss_fn(ext_p, int_p))

    assert loss1 < 0.05 * loss0, (loss0, loss1)
    np.testing.assert_array_equal(np.asarray(ext_p[:, :9]),
                                  np.asarray(ext0[:, :9]))  # R untouched
    np.testing.assert_array_equal(np.asarray(int_p[:, :2]),
                                  np.asarray(int0[:, :2]))  # x0/y0 untouched
    assert not np.allclose(np.asarray(ext_p[:, 9:]), np.asarray(ext0[:, 9:]))
    assert not np.allclose(np.asarray(int_p[:, 2:]), np.asarray(int0[:, 2:]))
