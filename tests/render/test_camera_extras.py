import jax.numpy as jnp
import numpy as np

from kaolin_tpu.render.camera import (
    Camera,
    camera_path_generator,
    gsplat_nerfstudio_camera_to_kaolin,
    kaolin_camera_to_gsplat_nerfstudio,
    loop_camera_path_generator,
)


def _cam(eye, fov=0.7, res=32):
    return Camera.from_args(eye=jnp.asarray(eye), at=jnp.zeros(3),
                            up=jnp.asarray([0., 1., 0.]), fov=fov,
                            width=res, height=res)


def test_camera_path_endpoints():
    cams = [_cam([0., 0., 3.]), _cam([3., 0., 0.])]
    path = list(camera_path_generator(cams, frames_between_cameras=10))
    assert len(path) >= 10
    p0 = np.asarray(path[0].extrinsics.cam_pos())[0, :, 0]
    np.testing.assert_allclose(p0, [0, 0, 3], atol=1e-4)
    # all interpolated cameras keep looking at origin-ish and valid rotations
    for c in path:
        r = np.asarray(c.extrinsics.R[0])
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-4)


def test_loop_camera_path():
    cams = [_cam([0., 0., 3.]), _cam([3., 0., 0.]), _cam([0., 0., -3.]),
            _cam([-3., 0., 0.])]
    gen = loop_camera_path_generator(cams, frames_between_cameras=5, repeat=1)
    frames = list(gen)
    assert len(frames) > 15


def test_nerfstudio_roundtrip():
    cam = _cam([1., 2., 3.], fov=0.8, res=64)
    d = kaolin_camera_to_gsplat_nerfstudio(cam)
    assert d["camera_model"] == "pinhole"
    back = gsplat_nerfstudio_camera_to_kaolin(
        d["Ks"], d["viewmats"], d["width"], d["height"])
    np.testing.assert_allclose(back.extrinsics.view_matrix(),
                               cam.extrinsics.view_matrix(), atol=1e-5)
    np.testing.assert_allclose(back.intrinsics.focal_y,
                               cam.intrinsics.focal_y, rtol=1e-4)


def test_timelapse_roundtrip(tmp_path):
    from kaolin_tpu.visualize import Timelapse, TimelapseParser
    tl = Timelapse(str(tmp_path))
    v = np.random.RandomState(0).rand(10, 3).astype(np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]])
    for it in (0, 5, 10):
        tl.add_mesh_batch(iteration=it, category="opt",
                          vertices_list=[v + it], faces_list=[f])
        tl.add_pointcloud_batch(iteration=it, category="pc",
                                pointcloud_list=[v * (it + 1)])
    parser = TimelapseParser(str(tmp_path))
    assert parser.num_mesh_items() == 1
    assert parser.num_pointcloud_items() == 1
    path = parser.get_file_path("mesh", "opt", 0)
    from kaolin_tpu.io import usd as usd_io
    m5 = usd_io.import_mesh(path, time=5)
    np.testing.assert_allclose(np.asarray(m5.vertices), v + 5, atol=1e-4)
    pts, _ = usd_io.import_pointcloud(
        parser.get_file_path("pointcloud", "pc", 0), time=10)
    np.testing.assert_allclose(np.asarray(pts), v * 11, atol=1e-4)


def test_camera_allclose_and_param_enums():
    import jax.numpy as jnp
    from kaolin_tpu.render.camera import (
        Camera, ExtrinsicsParamsDefEnum, OrthoParamsDefEnum,
        PinholeParamsDefEnum, allclose)
    from kaolin_tpu.render.camera import extrinsics as ext_mod
    from kaolin_tpu.render.camera import intrinsics as int_mod

    def make(eye_x=0.5):
        return Camera.from_args(eye=jnp.asarray([eye_x, 1.0, 3.0]),
                                at=jnp.zeros(3), up=jnp.asarray([0., 1., 0.]),
                                fov=0.6, width=32, height=32)

    a, b, c = make(), make(), make(0.7)
    assert allclose(a, b)
    assert not allclose(a, c)
    assert ext_mod.allclose(a.extrinsics, b.extrinsics)
    assert not ext_mod.allclose(a.extrinsics, c.extrinsics)
    assert int_mod.allclose(a.intrinsics, c.intrinsics)  # same lens
    assert int(PinholeParamsDefEnum.focal_x) == 2
    assert int(OrthoParamsDefEnum.fov_distance) == 0
    assert int(ExtrinsicsParamsDefEnum.R) == 0


def test_nvdiffrast_context_stub():
    import pytest
    from kaolin_tpu.render.mesh import (default_nvdiffrast_context,
                                        nvdiffrast_is_available)
    assert nvdiffrast_is_available() is False
    assert default_nvdiffrast_context(raise_error=False) is None
    with pytest.raises(RuntimeError, match="rasterize"):
        default_nvdiffrast_context()


def test_random_material_colorspaces():
    from kaolin_tpu.render.materials import random_material_colorspaces
    cs = random_material_colorspaces(key=0)
    assert len(cs) == 11
    assert all(v in ("auto", "raw") for v in cs.values())
    assert "diffuse_colorspace" in cs
