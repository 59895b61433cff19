import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.render.mesh import deftet_sparse_render


def test_deftet_depth_sorted_layers():
    """Two stacked triangles: both intersections returned closest-first."""
    fvi = jnp.asarray([[
        [[-1., -1.], [1., -1.], [0., 1.]],
        [[-1., -1.], [1., -1.], [0., 1.]],
    ]])
    fvz = jnp.asarray([[[-2., -2., -2.], [-1., -1., -1.]]])
    feat = jnp.asarray([[[[1.]] * 3, [[2.]] * 3]])
    pixels = jnp.asarray([[[0.0, 0.0], [0.0, -2.0]]])  # second pixel misses
    ranges = jnp.asarray([[[-10.0, 0.0], [-10.0, 0.0]]])
    out, fidx = deftet_sparse_render(pixels, ranges, fvz, fvi, feat, knum=4)
    fidx = np.asarray(fidx[0])
    np.testing.assert_array_equal(fidx[0], [1, 0, -1, -1])  # closest first
    np.testing.assert_array_equal(fidx[1], [-1, -1, -1, -1])
    np.testing.assert_allclose(np.asarray(out[0, 0, :2, 0]), [2.0, 1.0])


def test_deftet_render_range_filter():
    fvi = jnp.asarray([[[[-1., -1.], [1., -1.], [0., 1.]]]])
    fvz = jnp.asarray([[[-5., -5., -5.]]])
    feat = jnp.ones((1, 1, 3, 2))
    pixels = jnp.asarray([[[0.0, 0.0]]])
    near = jnp.asarray([[[-4.0, 0.0]]])  # face at -5 outside range
    out, fidx = deftet_sparse_render(pixels, near, fvz, fvi, feat, knum=2)
    assert int(fidx[0, 0, 0]) == -1
    full = jnp.asarray([[[-10.0, 0.0]]])
    out, fidx = deftet_sparse_render(pixels, full, fvz, fvi, feat, knum=2)
    assert int(fidx[0, 0, 0]) == 0


def test_deftet_gradients():
    fvi = jnp.asarray([[[[-1., -1.], [1., -1.], [0., 1.]]]])
    fvz = jnp.asarray([[[-5., -5., -5.]]])
    feat = jnp.ones((1, 1, 3, 2))
    pixels = jnp.asarray([[[0.1, 0.0]]])
    ranges = jnp.asarray([[[-10.0, 0.0]]])

    def loss(v, f):
        out, _ = deftet_sparse_render(pixels, ranges, fvz, v, f, knum=2)
        return jnp.sum(out ** 2)

    gv, gf = jax.grad(loss, argnums=(0, 1))(fvi, feat)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.abs(np.asarray(gf)).max() > 0


def test_deftet_streaming_matches_dense():
    """The chunked streaming winner search (face_chunk < F) must reproduce
    the dense path exactly — hits, order, and interpolated features."""
    rng = np.random.RandomState(3)
    B, F, P = 2, 50, 37
    fvi = jnp.asarray(rng.uniform(-1, 1, (B, F, 3, 2)).astype(np.float32))
    fvz = jnp.asarray(-rng.uniform(1, 5, (B, F, 3)).astype(np.float32))
    feat = jnp.asarray(rng.rand(B, F, 3, 4).astype(np.float32))
    pixels = jnp.asarray(rng.uniform(-1, 1, (B, P, 2)).astype(np.float32))
    ranges = jnp.broadcast_to(jnp.asarray([-10.0, 0.0]), (B, P, 2))

    out_d, idx_d = deftet_sparse_render(pixels, ranges, fvz, fvi, feat,
                                        knum=12)
    out_s, idx_s = deftet_sparse_render(pixels, ranges, fvz, fvi, feat,
                                        knum=12, face_chunk=8,
                                        pixel_chunk=16)
    np.testing.assert_array_equal(np.asarray(idx_d), np.asarray(idx_s))
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_s),
                               atol=1e-6)
    assert int((np.asarray(idx_d) >= 0).sum()) > 0


def test_deftet_streaming_grad_matches_dense():
    rng = np.random.RandomState(4)
    F, P = 20, 9
    fvi = jnp.asarray(rng.uniform(-1, 1, (1, F, 3, 2)).astype(np.float32))
    fvz = jnp.asarray(-rng.uniform(1, 5, (1, F, 3)).astype(np.float32))
    feat = jnp.asarray(rng.rand(1, F, 3, 2).astype(np.float32))
    pixels = jnp.asarray(rng.uniform(-1, 1, (1, P, 2)).astype(np.float32))
    ranges = jnp.broadcast_to(jnp.asarray([-10.0, 0.0]), (1, P, 2))

    def loss(v, f, **kw):
        out, _ = deftet_sparse_render(pixels, ranges, fvz, v, f, knum=6,
                                      **kw)
        return jnp.sum(out ** 2)

    gv_d, gf_d = jax.grad(loss, argnums=(0, 1))(fvi, feat)
    gv_s, gf_s = jax.grad(
        lambda v, f: loss(v, f, face_chunk=4, pixel_chunk=4),
        argnums=(0, 1))(fvi, feat)
    np.testing.assert_allclose(np.asarray(gv_d), np.asarray(gv_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gf_d), np.asarray(gf_s), atol=1e-6)
