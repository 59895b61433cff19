import jax
import jax.numpy as jnp
import numpy as np

import kaolin_tpu.ops.spc as spc_ops


def _setup(level=3, seed=0):
    rng = np.random.RandomState(seed)
    pts = jnp.asarray(rng.uniform(-1, 1, (64, 3)).astype(np.float32))
    qpts = spc_ops.quantize_points(pts, level)
    octree = spc_ops.unbatched_points_to_octree(qpts, level)
    lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
    max_level, pyramids, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramids, exsum)
    return octree, ph, pyramids, exsum, max_level


def _kernel_3x3x3():
    vs = [[i, j, k] for i in range(-1, 2) for j in range(-1, 2)
          for k in range(-1, 2)]
    return np.asarray(vs, dtype=np.int64)


def test_conv3d_identity_kernel():
    octree, ph, pyramids, exsum, level = _setup()
    n = int(np.asarray(pyramids)[0, 0, level])
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    kv = np.asarray([[0, 0, 0]])
    w = jnp.eye(4)[None]  # (1, 4, 4)
    out, out_level = spc_ops.conv3d(octree, ph, level, pyramids, exsum,
                                    feats, w, kv, jump=0)
    np.testing.assert_allclose(out, feats, atol=1e-6)
    assert out_level == level


def test_conv3d_neighborhood_sum():
    """Constant features + box kernel of ones => output counts neighbors."""
    octree, ph, pyramids, exsum, level = _setup()
    pyr = np.asarray(pyramids)[0]
    n = int(pyr[0, level])
    feats = jnp.ones((n, 1))
    kv = _kernel_3x3x3()
    w = jnp.ones((27, 1, 1))
    out, _ = spc_ops.conv3d(octree, ph, level, pyramids, exsum, feats, w, kv)
    # each output >= 1 (self) and <= 27
    o = np.asarray(out)[:, 0]
    assert o.min() >= 1 and o.max() <= 27
    # verify one point against brute force
    pts = np.asarray(spc_ops.unbatched_get_level_points(ph, pyr, level))
    pset = {tuple(p) for p in pts.tolist()}
    i = 5
    cnt = sum(1 for v in kv if tuple(np.asarray(pts[i]) + v) in pset)
    assert int(o[i]) == cnt


def test_conv3d_downsample_jump():
    octree, ph, pyramids, exsum, level = _setup()
    pyr = np.asarray(pyramids)[0]
    n_in = int(pyr[0, level])
    n_out = int(pyr[0, level - 1])
    rng = np.random.RandomState(2)
    feats = jnp.asarray(rng.randn(n_in, 2).astype(np.float32))
    kv = np.asarray([[i, j, k] for i in range(2) for j in range(2)
                     for k in range(2)])
    w = jnp.asarray(rng.randn(8, 2, 3).astype(np.float32))
    out, out_level = spc_ops.conv3d(octree, ph, level, pyramids, exsum,
                                    feats, w, kv, jump=1)
    assert out.shape == (n_out, 3)
    assert out_level == level - 1


def test_conv_transpose_is_adjoint():
    """<conv(X), Y> == <X, convT(Y)> with shared weights."""
    octree, ph, pyramids, exsum, level = _setup()
    pyr = np.asarray(pyramids)[0]
    n_fine = int(pyr[0, level])
    n_coarse = int(pyr[0, level - 1])
    rng = np.random.RandomState(3)
    kv = np.asarray([[i, j, k] for i in range(2) for j in range(2)
                     for k in range(2)])
    w = jnp.asarray(rng.randn(8, 2, 3).astype(np.float32))
    x = jnp.asarray(rng.randn(n_fine, 2).astype(np.float32))
    y = jnp.asarray(rng.randn(n_coarse, 3).astype(np.float32))
    cx, _ = spc_ops.conv3d(octree, ph, level, pyramids, exsum, x, w, kv,
                           jump=1)
    # adjoint maps coarse->fine with weight transposed on channel axes
    wt = jnp.swapaxes(w, 1, 2)  # (K, 3, 2)
    cty, out_level = spc_ops.conv_transpose3d(
        octree, ph, level - 1, pyramids, exsum, y, wt, kv, jump=1)
    assert out_level == level
    lhs = float(jnp.sum(cx * y))
    rhs = float(jnp.sum(x * cty))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_conv3d_module_and_grad():
    octree, ph, pyramids, exsum, level = _setup()
    pyr = np.asarray(pyramids)[0]
    n = int(pyr[0, level])
    conv = spc_ops.Conv3d(4, 8, _kernel_3x3x3(), jump=0)
    params = conv.init(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (n, 4))

    def loss(p, f):
        out, _ = conv.apply(p, octree, ph, level, pyramids, exsum, f)
        return jnp.sum(out ** 2)

    g = jax.grad(loss, argnums=(0, 1))(params, feats)
    assert np.isfinite(np.asarray(g[1])).all()
