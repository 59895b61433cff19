"""Native C++ host components vs their numpy/XLA references.

Ref parity: csrc/ops/mesh/triangle_hash.cpp (check_sign CPU path),
csrc/ops/spc/spc.cpp (points_to_octree)."""

import numpy as np
import jax.numpy as jnp
import pytest

import kaolin_tpu.native as native

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native library unavailable")


def _uv_sphere(n_lat=24, n_lon=32):
    lat = np.linspace(0.1, np.pi - 0.1, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    th, ph = np.meshgrid(lat, lon, indexing="ij")
    v = np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                  np.sin(th) * np.sin(ph)], -1).reshape(-1, 3)
    f = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            f += [[a, b, c], [b, d, c]]
    return v.astype(np.float32), np.asarray(f, np.int32)


def test_native_points_to_octree_matches_numpy():
    from kaolin_tpu.ops.spc.points import _morton_np
    rng = np.random.RandomState(0)
    pts = np.unique(rng.randint(0, 64, (2000, 3)), axis=0).astype(np.int32)
    oc_c = native.points_to_octree(pts, 6)

    # numpy reference (the fallback path, forced)
    m = np.unique(_morton_np(pts.astype(np.int64)))
    levels = []
    for _ in range(6, 0, -1):
        parent = m >> 3
        octant = m & 7
        uniq, _ = np.unique(parent, return_index=True)
        by = np.zeros(uniq.shape[0], dtype=np.uint8)
        np.bitwise_or.at(by, np.searchsorted(uniq, parent),
                         (1 << octant).astype(np.uint8))
        levels.append(by)
        m = uniq
    levels.reverse()
    oc_np = np.concatenate(levels)
    assert np.array_equal(oc_c, oc_np)


def test_native_morton_matches_numpy():
    from kaolin_tpu.ops.spc.points import _morton_np
    rng = np.random.RandomState(1)
    pts = rng.randint(0, 512, (3000, 3)).astype(np.int32)
    m_c = native.points_to_sorted_morton(pts)
    m_np = np.unique(_morton_np(pts.astype(np.int64))).astype(np.uint64)
    assert np.array_equal(m_c, m_np)


def test_native_check_sign_matches_xla():
    from kaolin_tpu.ops.mesh import check_sign
    v, f = _uv_sphere()
    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.2, 1.2, (4000, 3)).astype(np.float32)
    want = np.asarray(check_sign(jnp.asarray(v)[None], jnp.asarray(f),
                                 jnp.asarray(pts)[None]))[0]
    got = np.asarray(check_sign(jnp.asarray(v)[None], jnp.asarray(f),
                                jnp.asarray(pts)[None], backend="native"))[0]
    assert np.array_equal(want, got)
    # sanity: origin inside, far point outside
    probe = np.array([[0.0, 0.0, 0.0], [2.0, 2.0, 2.0]], np.float32)
    inside = np.asarray(check_sign(jnp.asarray(v)[None], jnp.asarray(f),
                                   jnp.asarray(probe)[None],
                                   backend="native"))[0]
    assert inside[0] and not inside[1]
