import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.metrics.pointcloud import chamfer_distance
from kaolin_tpu.ops import conversions as conv

from tests.reference_shim import import_reference_kaolin

ref_kaolin = import_reference_kaolin()


def test_marching_tetrahedra_reference_example():
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]],
                           dtype=jnp.float32)
    tets = jnp.asarray([[0, 1, 2, 3]])
    sdf = jnp.asarray([[-1.0, -1.0, 0.5, 0.5]])
    verts_list, faces_list, tet_idx_list = conv.marching_tetrahedra(
        vertices, tets, sdf, True)
    want_v = np.array([[0.0, 0.6667, 0.0], [0.0, 0.0, 0.6667],
                       [0.3333, 0.6667, 0.0], [0.3333, 0.0, 0.6667]])
    np.testing.assert_allclose(verts_list[0], want_v, atol=1e-4)
    np.testing.assert_array_equal(faces_list[0], [[3, 0, 1], [3, 2, 0]])
    np.testing.assert_array_equal(tet_idx_list[0], [0, 0])


def test_marching_tetrahedra_parity_random():
    if ref_kaolin is None:
        pytest.skip("reference unavailable")
    import torch
    rng = np.random.RandomState(0)
    # small tet grid: cube split into 6 tets per cell
    res = 4
    grid = np.stack(np.meshgrid(*[np.arange(res + 1)] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3) / res
    vid = lambda i, j, k: (i * (res + 1) + j) * (res + 1) + k  # noqa: E731
    tets = []
    for i in range(res):
        for j in range(res):
            for k in range(res):
                c = [vid(i, j, k), vid(i + 1, j, k), vid(i, j + 1, k),
                     vid(i + 1, j + 1, k), vid(i, j, k + 1), vid(i + 1, j, k + 1),
                     vid(i, j + 1, k + 1), vid(i + 1, j + 1, k + 1)]
                tets += [[c[0], c[1], c[3], c[7]], [c[0], c[1], c[7], c[5]],
                         [c[0], c[5], c[7], c[4]], [c[0], c[3], c[2], c[7]],
                         [c[0], c[2], c[6], c[7]], [c[0], c[6], c[4], c[7]]]
    tets = np.asarray(tets)
    sdf = (np.linalg.norm(grid - 0.5, axis=-1) - 0.3).astype(np.float32)

    ours_v, ours_f = conv.marching_tetrahedra(
        jnp.asarray(grid, dtype=jnp.float32)[None], jnp.asarray(tets),
        jnp.asarray(sdf)[None])
    ref_v, ref_f = ref_kaolin.ops.conversions.marching_tetrahedra(
        torch.tensor(grid, dtype=torch.float32)[None],
        torch.tensor(tets), torch.tensor(sdf)[None])
    np.testing.assert_allclose(ours_v[0], ref_v[0].numpy(), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ours_f[0]), ref_f[0].numpy())


def test_marching_tetrahedra_fixed_matches_eager():
    vertices = jnp.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                           dtype=jnp.float32)
    tets = np.asarray([[0, 1, 2, 3]])
    sdf = jnp.asarray([-1.0, -1.0, 0.5, 0.5])
    out = jax.jit(lambda v, s: conv.marching_tetrahedra_fixed(v, tets, s))(
        vertices, sdf)
    valid_faces = np.asarray(out["faces"])[np.asarray(out["face_mask"])]
    active_verts = np.asarray(out["verts"])[np.asarray(out["vert_mask"])]
    ev, ef = conv.marching_tetrahedra(vertices[None], jnp.asarray(tets), sdf[None])
    assert active_verts.shape == ev[0].shape
    # same vertex set
    np.testing.assert_allclose(sorted(map(tuple, active_verts.tolist())),
                               sorted(map(tuple, np.asarray(ev[0]).tolist())),
                               atol=1e-5)
    # gradient flows through fixed variant
    g = jax.grad(lambda s: jnp.sum(
        conv.marching_tetrahedra_fixed(vertices, tets, s)["verts"]
        * out["vert_mask"][:, None]))(sdf)
    assert np.isfinite(np.asarray(g)).all()


def test_pointclouds_to_voxelgrids_reference_example():
    pc = jnp.asarray([[[0, 0, 0], [1, 1, 1], [2, 2, 2]]], dtype=jnp.float32)
    vg = conv.pointclouds_to_voxelgrids(pc, 3)
    want = np.zeros((3, 3, 3))
    want[0, 0, 0] = want[1, 1, 1] = want[2, 2, 2] = 1
    np.testing.assert_allclose(vg[0], want)


def test_trianglemeshes_to_voxelgrids_reference_example():
    vertices = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 0, 1]]],
                           dtype=jnp.float32)
    faces = jnp.asarray([[0, 1, 2]])
    origin = jnp.zeros((1, 3))
    scale = jnp.ones((1,))
    vg = conv.trianglemeshes_to_voxelgrids(vertices, faces, 3, origin, scale)
    want = np.array([[[1, 1, 1], [0, 0, 0], [0, 0, 0]],
                     [[1, 1, 0], [0, 0, 0], [0, 0, 0]],
                     [[1, 0, 0], [0, 0, 0], [0, 0, 0]]])
    np.testing.assert_allclose(vg[0], want)


def test_sdf_to_voxelgrids_sphere():
    def sphere(points):
        return jnp.sum(points ** 2, 1) ** 0.5 - 0.5

    vg = conv.sdf_to_voxelgrids([sphere], init_res=4)
    want = np.zeros((5, 5, 5))
    # reference docstring golden (conversions/sdf.py:91-135)
    want[2, 2, 2] = 1
    for c in [(0, 2, 2), (4, 2, 2), (2, 0, 2), (2, 4, 2), (2, 2, 0), (2, 2, 4)]:
        want[c] = 1
    for a in range(1, 4):
        for b in range(1, 4):
            want[a, b, 1:4] = 1
    np.testing.assert_allclose(vg[0], want)


def test_sdf_to_voxelgrids_matches_dense():
    """MISE refinement must equal dense evaluation."""
    def blob(points):
        return (jnp.linalg.norm(points - jnp.asarray([0.05, 0.0, -0.1]),
                                axis=1) - 0.3)

    adaptive = conv.sdf_to_voxelgrids([blob], init_res=4, upsampling_steps=2)
    dense = conv.sdf_to_voxelgrids([blob], init_res=16, upsampling_steps=0)
    np.testing.assert_allclose(adaptive, dense)


def test_voxelgrids_to_trianglemeshes_single_voxel():
    vg = jnp.zeros((1, 2, 2, 2)).at[0, 0, 0, 0].set(1.0)
    verts, faces = conv.voxelgrids_to_trianglemeshes(vg)
    v = np.asarray(verts[0])
    f = np.asarray(faces[0])
    # single voxel → octahedron-like surface: 6 verts, 8 faces
    assert v.shape == (6, 3)
    assert f.shape == (8, 3)
    want_verts = {(1.0, 1.0, 0.5), (1.0, 0.5, 1.0), (0.5, 1.0, 1.0),
                  (1.0, 1.0, 1.5), (1.0, 1.5, 1.0), (1.5, 1.0, 1.0)}
    assert {tuple(x) for x in v.tolist()} == want_verts


def test_voxelgrids_to_cubic_meshes():
    vg = jnp.zeros((1, 3, 3, 3)).at[0, 1, 1, 1].set(1)
    verts, faces = conv.voxelgrids_to_cubic_meshes(vg, is_trimesh=True)
    assert verts[0].shape == (8, 3)
    assert faces[0].shape == (12, 3)
    quads = conv.voxelgrids_to_cubic_meshes(vg, is_trimesh=False)[1]
    assert quads[0].shape == (6, 4)


def test_unbatched_pointcloud_to_spc():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-1, 1, (100, 3)).astype(np.float32))
    feats = jnp.asarray(rng.rand(100, 4).astype(np.float32))
    spc = conv.unbatched_pointcloud_to_spc(pts, 3, features=feats)
    assert spc.max_level == 3
    assert spc.features.shape[1] == 4
    num_leaves = int(np.asarray(spc.pyramids)[0, 0, 3])
    assert spc.features.shape[0] == num_leaves


def test_unbatched_mesh_to_spc():
    fv = jnp.asarray([[[-0.5, -0.5, 0.0], [0.5, -0.5, 0.0], [0.0, 0.5, 0.0]]])
    octree, points = conv.unbatched_mesh_to_spc(fv, 3)
    pts = np.asarray(points)
    assert pts.shape[0] > 4
    # all voxels near the triangle plane z=0 → quantized z in {3, 4}
    assert set(pts[:, 2].tolist()) <= {3, 4}


class TestFlexiCubes:
    def _sphere_setup(self, res=8):
        fc = conv.FlexiCubes()
        x_nx3, cube_fx8 = fc.construct_voxel_grid(res)
        sdf = jnp.linalg.norm(x_nx3, axis=-1) - 0.35
        return fc, x_nx3, sdf, cube_fx8, res

    def test_construct_voxel_grid(self):
        fc = conv.FlexiCubes()
        verts, cubes = fc.construct_voxel_grid(4)
        assert verts.shape == (125, 3)
        assert cubes.shape == (64, 8)
        np.testing.assert_allclose(np.asarray(verts).min(), -0.5)
        np.testing.assert_allclose(np.asarray(verts).max(), 0.5)

    def test_extract_sphere(self):
        fc, x, sdf, cubes, res = self._sphere_setup()
        verts, faces, l_dev = fc(x, sdf, cubes, res)
        v = np.asarray(verts)
        assert v.shape[0] > 0 and np.asarray(faces).shape[0] > 0
        r = np.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(r, 0.35, atol=0.05)

    def test_parity_with_reference(self):
        if ref_kaolin is None:
            pytest.skip("reference unavailable")
        import torch
        fc, x, sdf, cubes, res = self._sphere_setup()
        rng = np.random.RandomState(1)
        beta = rng.randn(cubes.shape[0], 12).astype(np.float32) * 0.2
        alpha = rng.randn(cubes.shape[0], 8).astype(np.float32) * 0.2
        gamma = rng.randn(cubes.shape[0]).astype(np.float32) * 0.2
        ours_v, ours_f, ours_l = fc(x, sdf, cubes, res,
                                    beta=jnp.asarray(beta),
                                    alpha=jnp.asarray(alpha),
                                    gamma_f=jnp.asarray(gamma))
        ref_fc = ref_kaolin.ops.conversions.FlexiCubes(device="cpu")
        rv, rf, rl = ref_fc(torch.tensor(np.asarray(x)),
                            torch.tensor(np.asarray(sdf)),
                            torch.tensor(np.asarray(cubes)), res,
                            beta=torch.tensor(beta),
                            alpha=torch.tensor(alpha),
                            gamma_f=torch.tensor(gamma))
        np.testing.assert_allclose(ours_v, rv.numpy(), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(ours_f), rf.numpy())
        np.testing.assert_allclose(ours_l, rl.numpy(), atol=1e-4)

    def test_differentiable_with_topology(self):
        fc, x, sdf, cubes, res = self._sphere_setup()
        topo = fc.precompute_topology(sdf, cubes, res)

        def loss(s):
            v, f, l_dev = fc(x, s, cubes, res, topology=topo)
            return jnp.sum(v ** 2) + jnp.sum(l_dev)

        g = jax.grad(loss)(sdf)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_training_mode(self):
        fc, x, sdf, cubes, res = self._sphere_setup()
        verts, faces, l_dev = fc(x, sdf, cubes, res, training=True)
        # training mode adds quad centers
        v0, f0, _ = fc(x, sdf, cubes, res, training=False)
        assert verts.shape[0] > v0.shape[0]
        assert faces.shape[0] == 2 * f0.shape[0]
