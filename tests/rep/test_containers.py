"""Spc container, PointSamples/GaussianSplatModel, metrics parity.

Reference: rep/spc.py:24 (lazy pyramids/exsum/point_hierarchies),
rep/gaussians.py:41,537, metrics/tetmesh.py:52,112 (pure-torch, shim
parity), metrics/voxelgrid.py:19, metrics/render.py:18."""

import sys

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "tests")
from reference_shim import import_reference_kaolin  # noqa: E402

from kaolin_tpu.metrics.render import mask_iou  # noqa: E402
from kaolin_tpu.metrics.tetmesh import amips, equivolume  # noqa: E402
from kaolin_tpu.metrics.voxelgrid import iou  # noqa: E402
from kaolin_tpu.ops.spc import unbatched_points_to_octree  # noqa: E402
from kaolin_tpu.rep import (  # noqa: E402
    GaussianSplatModel,
    PointSamples,
    Spc,
)


def test_spc_container_lazy_attributes():
    rng = np.random.RandomState(0)
    pts = np.unique(rng.randint(0, 8, (40, 3)), axis=0).astype(np.int16)
    octree = unbatched_points_to_octree(jnp.asarray(pts), 3)
    spc = Spc(octree, np.array([len(octree)], dtype=np.int32))
    assert spc.max_level == 3
    assert spc.batch_size == 1
    pyr = np.asarray(spc.pyramids)[0]
    assert pyr[0, 3] == len(pts)            # leaf count
    assert spc.num_points(3) == len(pts)
    ph = np.asarray(spc.point_hierarchies)
    start = int(pyr[1, 3])
    np.testing.assert_array_equal(np.sort(ph[start:start + len(pts)], axis=0),
                                  np.sort(pts, axis=0))
    d = spc.to_dict()
    assert "octrees" in d and "exsum" in d


def test_point_samples_mask_and_cat():
    rng = np.random.RandomState(0)
    p1 = PointSamples(jnp.asarray(rng.rand(10, 3).astype(np.float32)))
    p2 = PointSamples(jnp.asarray(rng.rand(6, 3).astype(np.float32)))
    mask = np.zeros(10, bool)
    mask[:4] = True
    sub = p1[jnp.asarray(mask)]
    assert sub.positions.shape == (4, 3)
    cat = PointSamples.cat([p1, p2])
    assert cat.positions.shape == (16, 3)


def test_gaussian_model_transform_bakes():
    rng = np.random.RandomState(0)
    n = 20
    ori = rng.randn(n, 4).astype(np.float32)
    ori /= np.linalg.norm(ori, axis=1, keepdims=True)
    t = np.eye(4, dtype=np.float32)
    ang = 0.6
    t[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t[:3, 3] = [1.0, -2.0, 0.5]
    model = GaussianSplatModel(
        positions=jnp.asarray(rng.rand(n, 3).astype(np.float32)),
        orientations=jnp.asarray(ori),
        scales=jnp.asarray(rng.rand(n, 3).astype(np.float32) * 0.1),
        opacities=jnp.asarray(rng.rand(n).astype(np.float32)),
        sh_coeff=jnp.asarray(rng.randn(n, 4, 3).astype(np.float32)),
        transform=jnp.asarray(t))
    baked = model.as_transformed()
    want = np.asarray(model.positions) @ t[:3, :3].T + t[:3, 3]
    np.testing.assert_allclose(np.asarray(baked.positions), want, atol=1e-5)
    assert baked.transform is None or np.allclose(
        np.asarray(baked.transform), np.eye(4))
    assert baked.sh_degree == model.sh_degree


def test_metrics_voxelgrid_and_mask_iou():
    a = jnp.asarray(np.array([[[[1, 0], [1, 1]], [[0, 0], [1, 0]]]],
                             np.float32))
    b = jnp.asarray(np.array([[[[1, 1], [1, 0]], [[0, 0], [1, 0]]]],
                             np.float32))
    # intersection 3, union 5
    np.testing.assert_allclose(np.asarray(iou(a, b)), [3 / 5], atol=1e-6)

    m1 = jnp.asarray(np.array([[[1.0, 0.0], [1.0, 1.0]]]))
    m2 = jnp.asarray(np.array([[[1.0, 1.0], [0.0, 1.0]]]))
    v = float(mask_iou(m1, m2))
    assert 0.0 <= v <= 1.0


def test_tetmesh_metrics_parity():
    ref = import_reference_kaolin()
    import torch
    rng = np.random.RandomState(0)
    tets = rng.rand(1, 12, 4, 3).astype(np.float32)
    mine_ev = equivolume(jnp.asarray(tets), pow=4)
    want_ev = ref.metrics.tetmesh.equivolume(torch.as_tensor(tets), pow=4)
    np.testing.assert_allclose(np.asarray(mine_ev), want_ev.numpy(),
                               rtol=1e-4, atol=1e-7)

    inverse_offset = rng.rand(1, 12, 3, 3).astype(np.float32)
    mine_am = amips(jnp.asarray(tets), jnp.asarray(inverse_offset))
    want_am = ref.metrics.tetmesh.amips(torch.as_tensor(tets),
                                        torch.as_tensor(inverse_offset))
    np.testing.assert_allclose(np.asarray(mine_am), want_am.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_spc_from_list_batches():
    from kaolin_tpu.ops.spc import unbatched_points_to_octree

    pts1 = jnp.asarray(np.array([[0, 0, 0], [3, 3, 3]], np.int16))
    pts2 = jnp.asarray(np.array([[1, 2, 3]], np.int16))
    o1 = unbatched_points_to_octree(pts1, 2)
    o2 = unbatched_points_to_octree(pts2, 2)
    spc = Spc.from_list([o1, o2])
    assert spc.batch_size == 2
    assert int(spc.lengths[0]) == o1.shape[0]
    assert int(spc.max_level) == 2
    # per-item pyramids match the unbatched scans
    assert int(spc.num_points(2)[0]) == 2
    assert int(spc.num_points(2)[1]) == 1
    with pytest.raises(ValueError):
        Spc.from_list([])


def test_spc_make_dense():
    spc = Spc.make_dense(2)
    assert spc.batch_size == 1
    assert int(spc.max_level) == 2
    # dense: 8^l points at each level
    assert int(spc.num_points(1)[0]) == 8
    assert int(spc.num_points(2)[0]) == 64
    assert spc.octrees.shape[0] == 1 + 8
    with pytest.raises(ValueError):
        Spc.make_dense(0)
