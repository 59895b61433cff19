import jax
import jax.numpy as jnp
import numpy as np

import kaolin_tpu.ops.spc as spc_ops
import kaolin_tpu.render.spc as spc_render
from kaolin_tpu.rep.spc import Spc


def _example_octree():
    points = jnp.asarray([[3, 2, 0], [3, 1, 1], [3, 3, 3]], dtype=jnp.int16)
    octree = spc_ops.unbatched_points_to_octree(points, 2)
    lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
    max_level, pyramid, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramid, exsum)
    return octree, lengths, max_level, pyramid, exsum, ph


def test_points_to_morton_reference_example():
    inp = jnp.asarray([[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3], [0, 1, 0]],
                      dtype=jnp.int16)
    np.testing.assert_array_equal(spc_ops.points_to_morton(inp), [0, 1, 8, 9, 2])
    np.testing.assert_array_equal(
        spc_ops.morton_to_points(jnp.asarray([0, 1, 8, 9, 2])), np.asarray(inp))


def test_points_to_corners_reference_example():
    inp = jnp.asarray([[0, 0, 0], [0, 2, 0]], dtype=jnp.int16)
    out = spc_ops.points_to_corners(inp)
    want0 = [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
             [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    np.testing.assert_array_equal(out[0], want0)
    np.testing.assert_array_equal(out[1, 1], [0, 2, 1])


def test_scan_and_query_reference_example():
    octree, lengths, max_level, pyramid, exsum, ph = _example_octree()
    assert max_level == 2
    np.testing.assert_array_equal(np.asarray(pyramid)[0, 0], [1, 3, 3, 0])
    qc = jnp.asarray([[3, 2, 0]], dtype=jnp.int16)
    np.testing.assert_array_equal(
        spc_ops.unbatched_query(octree, exsum, qc, 2), [5])
    np.testing.assert_array_equal(
        spc_ops.unbatched_query(octree, exsum, qc, 2, with_parents=True),
        [[0, 2, 5]])
    # miss
    np.testing.assert_array_equal(
        spc_ops.unbatched_query(octree, exsum,
                                jnp.asarray([[0, 0, 0]], dtype=jnp.int16), 2),
        [-1])


def test_generate_points_levels():
    octree, lengths, max_level, pyramid, exsum, ph = _example_octree()
    ph = np.asarray(ph)
    assert ph.shape == (7, 3)
    np.testing.assert_array_equal(ph[0], [0, 0, 0])
    lvl2 = spc_ops.unbatched_get_level_points(ph, np.asarray(pyramid)[0], 2)
    assert {tuple(p) for p in np.asarray(lvl2)} == {(3, 2, 0), (3, 1, 1), (3, 3, 3)}


def test_spc_container():
    octree, lengths, *_ = _example_octree()
    spc = Spc(octree, lengths)
    assert spc.max_level == 2
    assert spc.point_hierarchies.shape == (7, 3)
    assert spc.batch_size == 1


def test_uint8_helpers():
    b = jnp.asarray([208], dtype=jnp.uint8)
    bits = spc_ops.uint8_to_bits(b)
    np.testing.assert_array_equal(
        bits[0], [False, False, False, False, True, False, True, True])
    assert int(spc_ops.uint8_bits_sum(b)[0]) == 3
    np.testing.assert_array_equal(spc_ops.bits_to_uint8(bits), b)


def test_dual_and_trinkets():
    points = jnp.asarray([[0, 0, 0], [0, 0, 1], [0, 1, 0]], dtype=jnp.int16)
    octree = spc_ops.unbatched_points_to_octree(points, 1)
    lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
    _, pyramid, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramid, exsum)
    dual, pyr_dual = spc_ops.unbatched_make_dual(ph, np.asarray(pyramid)[0])
    lvl0 = spc_ops.unbatched_get_level_points(dual, np.asarray(pyr_dual), 0)
    # reference example (spc.py:378): root corners
    want = [[0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
            [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1]]
    np.testing.assert_array_equal(lvl0, want)
    lvl1 = spc_ops.unbatched_get_level_points(dual, np.asarray(pyr_dual), 1)
    assert lvl1.shape == (16, 3)

    trinkets, parents = spc_ops.unbatched_make_trinkets(
        ph, np.asarray(pyramid)[0], dual, np.asarray(pyr_dual))
    assert trinkets.shape == (ph.shape[0], 8)
    # corners indexed by trinkets must equal points_to_corners
    corners = np.asarray(spc_ops.points_to_corners(ph))
    gathered = np.asarray(dual)[np.asarray(trinkets)]
    np.testing.assert_array_equal(gathered, corners)


def test_interpolate_trilinear():
    points = jnp.asarray([[0, 0, 0], [1, 1, 1]], dtype=jnp.int16)
    level = 1
    octree = spc_ops.unbatched_points_to_octree(points, level)
    lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
    _, pyramid, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramid, exsum)
    dual, pyr_dual = spc_ops.unbatched_make_dual(ph, np.asarray(pyramid)[0])
    trinkets, _ = spc_ops.unbatched_make_trinkets(ph, np.asarray(pyramid)[0],
                                                  dual, np.asarray(pyr_dual))
    # linear function of position sampled at dual corners of the query level
    start = int(np.asarray(pyr_dual)[1, level])
    num = int(np.asarray(pyr_dual)[0, level])
    corners = np.asarray(dual)[start:start + num]
    feats_lvl = jnp.asarray(corners[:, 0:1].astype(np.float32))  # f = x coord
    # full dual feats array indexed globally
    feats = jnp.zeros((np.asarray(dual).shape[0], 1))
    feats = feats.at[start:start + num].set(feats_lvl)

    coords = jnp.asarray([[[-0.75, -0.75, -0.75]], [[0.75, 0.75, 0.75]]])
    pidx = spc_ops.unbatched_query(
        octree, exsum, coords[:, 0, :], level)
    out = spc_ops.unbatched_interpolate_trilinear(
        coords, pidx, ph, trinkets, feats, level)
    # f = x grid coord; at x=-0.75 → grid x = 0.25; at 0.75 → 1.75
    np.testing.assert_allclose(out[:, 0, 0], [0.25, 1.75], atol=1e-5)


def test_raytrace_hits_and_depth_order():
    octree, lengths, max_level, pyramid, exsum, ph = _example_octree()
    # ray along +x at the row of voxels y∈[0.0,0.5), z∈[-1,-0.5)
    origin = jnp.asarray([[-2.0, 0.26, -0.9], [-2.0, 0.9, 0.9]])
    direction = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    ridx, pidx, depth = spc_render.unbatched_raytrace(
        octree, ph, np.asarray(pyramid)[0], exsum, origin, direction, 2)
    ridx = np.asarray(ridx)
    pidx = np.asarray(pidx)
    # ray 0 hits voxel (3,2,0) → global idx 5; ray 1 hits (3,3,3) → idx 6
    assert set(pidx[ridx == 0]) == {5}
    assert set(pidx[ridx == 1]) == {6}
    # depths increasing within each ray pack
    d = np.asarray(depth).ravel()
    for r in (0, 1):
        dr = d[ridx == r]
        assert np.all(np.diff(dr) >= 0)


def test_raytrace_with_exit():
    octree, lengths, max_level, pyramid, exsum, ph = _example_octree()
    origin = jnp.asarray([[-2.0, 0.26, -0.9]])
    direction = jnp.asarray([[1.0, 0.0, 0.0]])
    ridx, pidx, depth = spc_render.unbatched_raytrace(
        octree, ph, np.asarray(pyramid)[0], exsum, origin, direction, 2,
        with_exit=True)
    d = np.asarray(depth)
    assert d.shape[-1] == 2
    assert np.all(d[:, 1] > d[:, 0])
    np.testing.assert_allclose(d[0], [2.5, 3.0], atol=1e-5)


def test_packed_ray_ops():
    boundaries = jnp.asarray([True, False, False, True, False])
    feats = jnp.asarray([[1.0], [2.0], [3.0], [4.0], [5.0]])
    np.testing.assert_array_equal(
        spc_render.mark_pack_boundaries(jnp.asarray([1, 1, 1, 2, 2])),
        [True, False, False, True, False])
    np.testing.assert_allclose(spc_render.sum_reduce(feats, boundaries),
                               [[6.0], [9.0]])
    np.testing.assert_allclose(spc_render.prod_reduce(feats, boundaries),
                               [[6.0], [20.0]])
    np.testing.assert_allclose(spc_render.cumsum(feats, boundaries)[:, 0],
                               [1, 3, 6, 4, 9])
    np.testing.assert_allclose(
        spc_render.cumsum(feats, boundaries, exclusive=True)[:, 0],
        [0, 1, 3, 0, 4])
    np.testing.assert_allclose(
        spc_render.cumsum(feats, boundaries, reverse=True)[:, 0],
        [6, 5, 3, 9, 5])
    np.testing.assert_allclose(spc_render.cumprod(feats, boundaries)[:, 0],
                               [1, 2, 6, 4, 20])
    np.testing.assert_allclose(spc_render.diff(feats, boundaries)[:, 0],
                               [1, 1, 0, 1, 0])


def test_exponential_integration():
    boundaries = jnp.asarray([True, False, True])
    feats = jnp.asarray([[1.0], [1.0], [1.0]])
    tau = jnp.asarray([[0.5], [0.5], [100.0]])
    out, transmittance = spc_render.exponential_integration(
        feats, tau, boundaries)
    # opaque single-sample ray → ~1.0
    np.testing.assert_allclose(out[1, 0], 1.0, atol=1e-4)
    assert 0 < float(out[0, 0]) < 1.0

    g = jax.grad(lambda t: jnp.sum(
        spc_render.exponential_integration(feats, t, boundaries)[0]))(tau)
    assert np.isfinite(np.asarray(g)).all()
