"""Parity tests for the tile-binned SPC first-hit rasterizer.

The rasterizer must reproduce, ray for ray, the first-hit depth the BFS
traversal returns (``min t_in`` over the ray's nuggets) — the slab math is
op-for-op identical, so agreement is exact, not approximate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from kaolin_tpu.ops.spc import scan_octrees, unbatched_points_to_octree
from kaolin_tpu.render.camera import Camera
from kaolin_tpu.render.spc.raster import build_raster_spc, raster_first_hit
from kaolin_tpu.render.spc.raytrace import unbatched_raytrace


def _sphere_spc(level, n=20000, radii=(0.6,), seed=0):
    rng = np.random.RandomState(seed)
    grid = 2 ** level
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = np.concatenate([d * r for r in radii])
    q = np.unique(np.clip(((pts + 1) * 0.5 * grid).astype(np.int64), 0,
                          grid - 1), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(q.astype(np.int16)),
                                        level)
    lengths = np.array([len(octree)], dtype=np.int32)
    _, pyramids, exsum = scan_octrees(octree, lengths)
    from kaolin_tpu.ops.spc.spc import generate_points
    point_hierarchy = generate_points(octree, pyramids, exsum)
    return octree, point_hierarchy, np.asarray(pyramids)[0], exsum


def _camera(eye, res, fov=0.9):
    return Camera.from_args(eye=jnp.asarray(eye, jnp.float32),
                            at=jnp.zeros(3, jnp.float32),
                            up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32),
                            fov=fov, width=res, height=res)


def _oracle_first_hit(octree, ph, pyramid, exsum, origin, direction, level):
    """min t_in per ray + its pidx from the traversal."""
    num_rays = origin.shape[0]
    ridx, pidx, depth = unbatched_raytrace(
        octree, ph, pyramid, exsum, origin, direction, level)
    ridx = np.asarray(ridx)
    pidx = np.asarray(pidx)
    t = np.asarray(depth)[:, 0]
    best = np.full((num_rays,), np.inf, np.float32)
    best_id = np.full((num_rays,), -1, np.int32)
    # nuggets are ray-major front-to-back: first nugget per ray wins, but be
    # robust to ordering and take an explicit argmin (ties -> lowest pidx)
    order = np.lexsort((pidx, t, ridx))
    for i in order[::-1]:
        best[ridx[i]] = t[i]
        best_id[ridx[i]] = pidx[i]
    return best, best_id


@pytest.mark.parametrize("level", [3, 5])
@pytest.mark.parametrize("eye", [[1.4, 1.0, 1.3], [0.1, 2.0, 0.1],
                                 [-1.8, -0.4, 0.6]])
def test_raster_matches_traversal(level, eye):
    octree, ph, pyramid, exsum = _sphere_spc(level, radii=(0.6, 0.25))
    res = 32
    cam = _camera(eye, res)
    rspc = build_raster_spc(ph, pyramid, level)
    t, nidx, valid, overflow = raster_first_hit(rspc, cam, tile_px=8,
                                                s_max=16, c_cap=64)
    assert int(overflow["slot_overflow"]) == 0
    assert int(overflow["cap_overflow"]) == 0

    from kaolin_tpu.render.camera.raygen import generate_rays
    origin, direction = generate_rays(cam)
    best, best_id = _oracle_first_hit(octree, ph, pyramid, exsum,
                                      jnp.asarray(origin, jnp.float32),
                                      jnp.asarray(direction, jnp.float32),
                                      level)
    t = np.asarray(t)
    nidx = np.asarray(nidx)
    valid = np.asarray(valid)
    assert (valid == np.isfinite(best)).all()
    # the raster builds rays in tile-packed layout from iota grids (no
    # pixel permutes); its ray directions differ from generate_rays by ULP
    # reassociation, so depths agree to ULP not bitwise
    np.testing.assert_allclose(t[valid], best[valid], rtol=2e-6, atol=1e-6)
    exact = t[valid] == best[valid]
    assert exact.mean() > 0.75
    # wherever depths are bit-identical the winner id must match exactly
    # (ULP-shifted depths at grazing rays may pick an adjacent leaf)
    np.testing.assert_array_equal(nidx[valid][exact], best_id[valid][exact])
    assert (nidx[~valid] == -1).all()


def test_raster_camera_inside():
    """Origin inside the object: straddling units bin conservatively."""
    level = 4
    octree, ph, pyramid, exsum = _sphere_spc(level, radii=(0.8,))
    cam = _camera([0.05, 0.02, 0.04], 16)
    rspc = build_raster_spc(ph, pyramid, level)
    t, nidx, valid, overflow = raster_first_hit(rspc, cam, tile_px=8,
                                                s_max=16, c_cap=128)
    assert int(overflow["cap_overflow"]) == 0

    from kaolin_tpu.render.camera.raygen import generate_rays
    origin, direction = generate_rays(cam)
    best, _ = _oracle_first_hit(octree, ph, pyramid, exsum,
                                jnp.asarray(origin, jnp.float32),
                                jnp.asarray(direction, jnp.float32), level)
    t = np.asarray(t)
    valid = np.asarray(valid)
    assert (valid == np.isfinite(best)).all()
    np.testing.assert_allclose(t[valid], best[valid], rtol=2e-6, atol=1e-6)


def test_raster_sequence_matches_per_frame():
    """The scanned multi-camera program must produce exactly the per-frame
    results (same binning, same kernel) for each camera in the trajectory."""
    from kaolin_tpu.render.spc.raster import raster_first_hit_sequence

    level = 4
    octree, ph, pyramid, exsum = _sphere_spc(level, radii=(0.6,))
    rspc = build_raster_spc(ph, pyramid, level)
    cams = [_camera(eye, 16) for eye in ([1.4, 1.0, 1.3], [0.0, 1.9, 0.3],
                                         [-1.2, -0.8, 1.0])]
    ts, ids, vs, ov = raster_first_hit_sequence(rspc, cams, tile_px=8,
                                                s_max=16, c_cap=64)
    assert int(ov["cap_overflow"]) == 0 and int(ov["slot_overflow"]) == 0
    for i, cam in enumerate(cams):
        t1, id1, v1, _ = raster_first_hit(rspc, cam, tile_px=8, s_max=16,
                                          c_cap=64)
        # scan vs standalone fusion contexts reassociate the iota-based
        # ray math by ULPs — same tolerance policy as the traversal test
        ti, t1 = np.asarray(ts[i]), np.asarray(t1)
        fin = np.isfinite(t1)
        np.testing.assert_array_equal(np.asarray(vs[i]), np.asarray(v1))
        np.testing.assert_allclose(ti[fin], t1[fin], rtol=2e-6, atol=1e-6)
        exact = ti[fin] == t1[fin]
        assert exact.mean() > 0.75
        np.testing.assert_array_equal(np.asarray(ids[i])[fin][exact],
                                      np.asarray(id1)[fin][exact])


def test_raster_capacity_overflow_surfaced():
    """Tiny c_cap must trip the diagnostic, never silently drop."""
    level = 4
    octree, ph, pyramid, exsum = _sphere_spc(level, radii=(0.6, 0.25))
    cam = _camera([1.4, 1.0, 1.3], 16)
    rspc = build_raster_spc(ph, pyramid, level)
    _, _, _, overflow = raster_first_hit(rspc, cam, tile_px=16, s_max=4,
                                         c_cap=1)
    assert int(overflow["cap_overflow"]) > 0


def test_raster_compact_grid_matches_default():
    """The active-tile-compaction knob (dynamic grid + scalar-indirected
    index maps) must produce exactly the default full-grid results,
    including background fill of never-written tiles."""
    from kaolin_tpu.render.spc.raster import _raster_frame, _prep_camera

    level = 4
    octree, ph, pyramid, exsum = _sphere_spc(level, radii=(0.6,))
    cam = _camera([1.4, 1.0, 1.3], 32)
    rspc = build_raster_spc(ph, pyramid, level)
    params = _prep_camera(cam)
    kw = dict(width=32, height=32, tile_px=8, s_max=16, c_cap=64,
              interpret=True)
    t0, id0, v0, _ = _raster_frame(rspc.units, rspc.uaabb, rspc.l3boxes,
                                   *params, **kw)
    t1, id1, v1, _ = _raster_frame(rspc.units, rspc.uaabb, rspc.l3boxes,
                                   *params, compact=True, **kw)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(id0), np.asarray(id1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


@pytest.mark.parametrize("seed", [1, 2])
def test_raster_matches_traversal_random_octree(seed):
    """Random sparse octrees (non-shell geometry: isolated clusters, uneven
    density) exercise binning edge cases the sphere shells cannot — tiny
    units, screen-edge clipping, tiles whose lists are mostly misses."""
    level = 5
    rng = np.random.RandomState(seed)
    # clustered blobs: 4 clusters of points + uniform dust
    centers = rng.uniform(-0.6, 0.6, (4, 3)).astype(np.float32)
    pts = np.concatenate(
        [c + 0.12 * rng.randn(300, 3).astype(np.float32) for c in centers]
        + [rng.uniform(-1, 1, (100, 3)).astype(np.float32)])
    grid = 2 ** level
    q = np.unique(np.clip(((pts + 1) * 0.5 * grid).astype(np.int64), 0,
                          grid - 1), axis=0)
    octree = unbatched_points_to_octree(jnp.asarray(q.astype(np.int16)),
                                        level)
    lengths = np.array([len(octree)], dtype=np.int32)
    _, pyramids, exsum = scan_octrees(octree, lengths)
    from kaolin_tpu.ops.spc.spc import generate_points
    ph = generate_points(octree, pyramids, exsum)
    pyramid = np.asarray(pyramids)[0]

    res = 32
    cam = _camera([1.5, 0.9, -1.2], res)
    rspc = build_raster_spc(ph, pyramid, level)
    t, nidx, valid, ov = raster_first_hit(rspc, cam, tile_px=8, s_max=16,
                                          c_cap=128)
    assert int(ov["slot_overflow"]) == 0
    assert int(ov["cap_overflow"]) == 0

    from kaolin_tpu.render.camera.raygen import generate_rays
    origin, direction = generate_rays(cam)
    best, best_id = _oracle_first_hit(octree, ph, pyramid, exsum,
                                      jnp.asarray(origin, jnp.float32),
                                      jnp.asarray(direction, jnp.float32),
                                      level)
    t = np.asarray(t); nidx = np.asarray(nidx); valid = np.asarray(valid)
    assert (valid == np.isfinite(best)).all()
    np.testing.assert_allclose(t[valid], best[valid], rtol=2e-6, atol=1e-6)
    exact = t[valid] == best[valid]
    assert exact.mean() > 0.75
    np.testing.assert_array_equal(nidx[valid][exact], best_id[valid][exact])
