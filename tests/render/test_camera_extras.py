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
    pts = usd_io.import_pointcloud(
        parser.get_file_path("pointcloud", "pc", 0), time=10).points
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


def test_camera_api_depth():
    """Round-2 API-audit additions: viewport_matrix, clip_mask,
    aspect_ratio, cat, basis-change tracking (ref intrinsics.py:174-263,
    extrinsics.py:1103-1190)."""
    import jax.numpy as jnp
    import numpy as np
    from kaolin_tpu.render.camera import Camera
    from kaolin_tpu.render.camera.extrinsics import CameraExtrinsics
    from kaolin_tpu.render.camera.intrinsics import PinholeIntrinsics

    cam = Camera.from_args(eye=jnp.asarray([0.0, 0.0, 3.0]),
                           at=jnp.zeros(3), up=jnp.asarray([0.0, 1.0, 0.0]),
                           fov=0.8, width=64, height=32)
    assert cam.intrinsics.aspect_ratio() == 2.0

    vp = np.asarray(cam.intrinsics.viewport_matrix())[0]
    # NDC (-1,-1) -> (0, 0); (1, 1) -> (w, h)
    lo = vp @ np.asarray([-1.0, -1.0, cam.intrinsics.ndc_min, 1.0])
    hi = vp @ np.asarray([1.0, 1.0, cam.intrinsics.ndc_max, 1.0])
    np.testing.assert_allclose(lo[:3], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(hi[:3], [64, 32, 1], atol=1e-6)

    depth = jnp.asarray([0.001, 0.5, 1e4])
    np.testing.assert_array_equal(np.asarray(cam.intrinsics.clip_mask(depth)),
                                  [False, True, False])

    both = PinholeIntrinsics.cat([cam.intrinsics, cam.intrinsics])
    assert both.params.shape[0] == 2
    eboth = CameraExtrinsics.cat([cam.extrinsics, cam.extrinsics])
    assert eboth.params.shape[0] == 2

    assert "matrix_se3" in CameraExtrinsics.available_backends()

    # basis change accumulates and resets exactly
    import kaolin_tpu.render.camera.coordinates as coords
    flip = jnp.asarray([[1.0, 0, 0], [0, 0, 1.0], [0, 1.0, 0]])
    changed = cam.extrinsics.change_coordinate_system(flip)
    np.testing.assert_allclose(np.asarray(changed.basis_change_matrix),
                               np.asarray(flip))
    back = changed.reset_coordinate_system()
    np.testing.assert_allclose(np.asarray(back.view_matrix()),
                               np.asarray(cam.extrinsics.view_matrix()),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.basis_change_matrix),
                               np.eye(3), atol=1e-6)

    import pytest
    with pytest.raises(NotImplementedError):
        cam.intrinsics.set_ndc_range(0.0, 1.0)


def test_timelapse_parser_api_depth(tmp_path):
    """get_filepaths / parse_filepath_info / category queries
    (ref visualize/timelapse.py:346-420)."""
    import jax.numpy as jnp
    import numpy as np
    from kaolin_tpu.visualize import Timelapse, TimelapseParser

    tl = Timelapse(str(tmp_path))
    v = jnp.asarray(np.random.RandomState(0).rand(4, 3), jnp.float32)
    f = jnp.asarray([[0, 1, 2], [0, 2, 3]])
    for it in (0, 5):
        tl.add_mesh_batch(iteration=it, category="opt",
                          vertices_list=[v + it], faces_list=[f])

    fps = TimelapseParser.get_filepaths(str(tmp_path))
    assert any(k[0] == "mesh" and k[1] == "opt" for k in fps)
    info = TimelapseParser.parse_filepath_info(fps)
    assert "mesh" in info
    assert info["mesh"][0]["category"] == "opt"
    assert info["mesh"][0]["end_time"] >= 5

    parser = TimelapseParser(str(tmp_path))
    assert parser.get_category_names_by_type("mesh") == ["opt"]
    ci = parser.get_category_info("mesh", "opt")
    assert ci["ids"] == [0] and ci["end_time"] >= 5
    assert parser.get_category_info("mesh", "nope") is None
    assert parser.get_category_names_by_type("bogus") is None
