"""API-surface parity helpers added to match the reference namespaces
(io.materials:69,132; io.utils read/write_image, TextureExporter;
utils/testing.py:311-452; physics.simplicits precomputed.py:158-355;
render/camera/extrinsics_backends.py:148)."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_group_materials_by_name():
    from kaolin_tpu.io.materials import group_materials_by_name
    mats = [{"material_name": "b"}, {"material_name": "a"},
            {"material_name": "b"}]
    assign = np.array([0, 1, 2, 2])
    m2, a2 = group_materials_by_name(mats, assign)
    assert [m["material_name"] for m in m2] == ["a", "b"]
    assert a2.tolist() == [1, 0, 1, 1]


def test_process_materials_and_assignments():
    from kaolin_tpu.io.materials import process_materials_and_assignments
    from kaolin_tpu.io.utils import create_missing_materials_error_handler
    mats = {"a": {"material_name": "a"}}
    assigns = {"a": np.array([[0, 2]]), "ghost": np.array([3])}
    m, a = process_materials_and_assignments(
        mats, assigns, create_missing_materials_error_handler, 5)
    assert len(m) == 2  # dummy material created for 'ghost'
    assert a.tolist()[:2] == [0, 0] and a[4] == -1


def test_image_io_round_trip(tmp_path):
    from kaolin_tpu.io.utils import TextureExporter, read_image, write_image
    img = np.random.RandomState(0).rand(4, 4, 3).astype(np.float32)
    p = str(tmp_path / "x.png")
    write_image(img, p)
    back = np.asarray(read_image(p))
    assert np.abs(back - img).max() < 1 / 128
    te = TextureExporter(str(tmp_path))
    assert te(img, "diffuse").endswith("diffuse.png")
    assert te(img, "diffuse").endswith("diffuse_1.png")


def test_testing_helpers(tmp_path):
    from kaolin_tpu.utils.testing import (check_allclose,
                                          check_tensor_attribute_shapes,
                                          contained_torch_equal,
                                          file_contents_equal)
    check_allclose(np.ones(3), np.ones(3))
    with pytest.raises(ValueError):
        check_allclose(np.ones(3), np.zeros(3))
    assert contained_torch_equal({"x": np.arange(3), "y": [1.0, 2.0]},
                                 {"x": np.arange(3), "y": [1.0, 2.0]})
    assert not contained_torch_equal({"x": np.arange(3)},
                                     {"x": np.arange(4)})
    assert contained_torch_equal([1.0], [1.0 + 1e-9], approximate=True)
    assert check_tensor_attribute_shapes({"v": np.zeros((5, 3))}, v=(5, 3))
    f1, f2 = str(tmp_path / "1.txt"), str(tmp_path / "2.txt")
    open(f1, "w").write("a\n\nb\n")
    open(f2, "w").write("a\nb\n")
    assert file_contents_equal(f1, f2)


def test_simplicits_namespace_parity():
    from kaolin_tpu.physics.simplicits import (
        SkinningModule,
        lumped_mass_matrix,
        sparse_collision_jacobian_matrix,
        sparse_lbs_matrix,
        sparse_mass_matrix,
    )
    w = jnp.ones((4, 2)) / 2
    x = jnp.asarray(np.random.RandomState(0).rand(4, 3).astype(np.float32))
    assert sparse_lbs_matrix(w, x).shape == (12, 24)
    m, mi = lumped_mass_matrix(jnp.full((4,), 2.0), 1.0)
    assert m.shape == (12, 12)
    np.testing.assert_allclose(np.asarray(m @ mi), np.eye(12), atol=1e-6)
    assert sparse_mass_matrix(jnp.ones(4)).shape == (12, 12)
    jac = sparse_collision_jacobian_matrix(
        w, x, jnp.asarray([0, 2]), cp_is_static=jnp.asarray([False, True]))
    assert jac.shape == (6, 24)
    assert np.abs(np.asarray(jac[3:])).max() == 0  # static rows zeroed
    assert SkinningModule is not None


def test_custom_extrinsics_backend():
    from kaolin_tpu.render.camera import (CameraExtrinsics, ExtrinsicsRep,
                                          register_backend)

    @register_backend("test_full9")
    class Full9(ExtrinsicsRep):
        @classmethod
        def params_from_Rt(cls, R, t):
            return jnp.concatenate([R.reshape(-1, 9), t.reshape(-1, 3)], -1)

        @classmethod
        def R(cls, params):
            return params[:, :9].reshape(-1, 3, 3)

        @classmethod
        def t(cls, params):
            return params[:, 9:12, None]

    eye = jnp.asarray([0.0, 1.0, 3.0])
    at = jnp.zeros(3)
    up = jnp.asarray([0.0, 1.0, 0.0])
    e1 = CameraExtrinsics.from_lookat(eye=eye, at=at, up=up,
                                      backend="test_full9")
    e2 = CameraExtrinsics.from_lookat(eye=eye, at=at, up=up)
    np.testing.assert_allclose(np.asarray(e1.view_matrix()),
                               np.asarray(e2.view_matrix()), atol=1e-6)


def test_misc_aliases():
    import warnings
    from kaolin_tpu.ops.spc import coords_to_trilinear  # noqa: F401
    from kaolin_tpu.render.spc import mark_first_hit
    from kaolin_tpu.ops.mesh import unindex_vertices_by_faces
    from kaolin_tpu.io.dataset import (CombinationDataset, KaolinDataset,
                                       KaolinDatasetItem)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        first = mark_first_hit(jnp.asarray([0, 0, 1, 2, 2]))
    assert np.asarray(first).tolist() == [True, False, True, True, False]

    fv = jnp.asarray(np.random.RandomState(0).rand(5, 3, 3))
    v, f = unindex_vertices_by_faces(fv)
    assert v.shape == (15, 3) and f.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(v[np.asarray(f)]), np.asarray(fv))

    class DS(KaolinDataset):
        def initialize(self, n):
            self.n = n

        def get_data(self, i):
            return i

        def get_attributes(self, i):
            return {"idx": i}

        def __len__(self):
            return self.n

    ds = DS(3)
    item = ds[1]
    assert isinstance(item, KaolinDatasetItem)
    combo = CombinationDataset(ds, DS(3))
    assert combo[2].data == (2, 2)


def test_usd_material_io_manager(tmp_path):
    """Shader registry dispatch + custom shader registration.
    Ref usd/materials.py:190."""
    import warnings
    from kaolin_tpu.io.usd import UsdMaterialIoManager, create_stage
    from kaolin_tpu.io.usd.core import export_material
    from kaolin_tpu.render.materials import PBRMaterial

    mat = PBRMaterial(diffuse_color=(0.2, 0.4, 0.6), roughness_value=0.3)
    path = str(tmp_path / "mat.usda")
    export_material(mat, path)
    # default reader dispatches on info:id == UsdPreviewSurface
    back = UsdMaterialIoManager.read_material(path)
    np.testing.assert_allclose(np.asarray(back.diffuse_color),
                               [0.2, 0.4, 0.6], atol=1e-5)

    # custom shader: register reader, then read a file using it
    def my_reader(file_path, scene_path, time):
        return {"custom": True}

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # first registration: no warning
        UsdMaterialIoManager.register_usd_reader("MyCustomPBR", my_reader)
    custom = tmp_path / "custom.usda"
    custom.write_text('''#usda 1.0

def Shader "Shader"
{
    token info:id = "MyCustomPBR"
    float inputs:roughness = 0.5
}
''')
    assert UsdMaterialIoManager.read_material(str(custom)) == {"custom": True}
    # duplicate registration warns
    with pytest.warns(UserWarning):
        UsdMaterialIoManager.register_usd_reader("MyCustomPBR", my_reader)
    # unknown shader falls back to raw params with a warning
    other = tmp_path / "unknown.usda"
    other.write_text('''#usda 1.0

def Shader "Shader"
{
    token info:id = "SomeUnknownShader"
    float inputs:roughness = 0.25
}
''')
    with pytest.warns(UserWarning):
        raw = UsdMaterialIoManager.read_material(str(other))
    assert raw["roughness"].strip() == "0.25"

    # writer path: write via manager into a stage
    stage = create_stage(str(tmp_path / "w.usda"))
    UsdMaterialIoManager.write_material(mat, stage, "/World/mat")
    stage.save()
    again = UsdMaterialIoManager.read_material(str(tmp_path / "w.usda"))
    np.testing.assert_allclose(np.asarray(again.diffuse_color),
                               [0.2, 0.4, 0.6], atol=1e-5)


def test_usd_material_manager_scene_path_dispatch(tmp_path):
    """Multi-material files dispatch by the requested prim PATH, not by any
    prim that happens to be named 'Shader'."""
    from kaolin_tpu.io.usd import UsdMaterialIoManager
    multi = tmp_path / "multi.usda"
    multi.write_text('''#usda 1.0

def Material "matA"
{
    def Shader "Shader"
    {
        token info:id = "CustomShaderX"
        float inputs:roughness = 0.9
    }
}

def Material "matB"
{
    def Shader "Shader"
    {
        token info:id = "UsdPreviewSurface"
        color3f inputs:diffuseColor = (0.1, 0.2, 0.3)
    }
}
''')
    mat_b = UsdMaterialIoManager.read_material(str(multi),
                                               scene_path="/matB")
    np.testing.assert_allclose(np.asarray(mat_b.diffuse_color),
                               [0.1, 0.2, 0.3], atol=1e-5)
