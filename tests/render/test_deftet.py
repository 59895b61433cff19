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
