import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.metrics.render import mask_iou
from kaolin_tpu.render.mesh import dibr_rasterization, dibr_soft_mask, rasterize


def _single_triangle(shift=0.0, z=-1.0):
    """Large triangle covering the image center."""
    fvi = jnp.asarray([[[[-0.5 + shift, -0.5], [0.5 + shift, -0.5],
                         [0.0 + shift, 0.5]]]])  # (1, 1, 3, 2)
    fvz = jnp.full((1, 1, 3), z)
    feat = jnp.asarray([[[[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]]]])  # (1,1,3,2)
    return fvz, fvi, feat


def test_rasterize_single_triangle_coverage():
    fvz, fvi, feat = _single_triangle()
    img, fidx = rasterize(32, 32, fvz, fvi, feat)
    assert img.shape == (1, 32, 32, 2)
    assert fidx.shape == (1, 32, 32)
    fidx = np.asarray(fidx[0])
    # center covered, corners background
    assert fidx[16, 16] == 0
    assert fidx[0, 0] == -1 and fidx[31, 31] == -1
    # coverage fraction ≈ triangle area (0.5*1*1 / 4 = 1/8 of ndc range 2x2)
    frac = (fidx >= 0).mean()
    np.testing.assert_allclose(frac, 1.0 / 8.0, atol=0.02)


def test_rasterize_feature_interpolation():
    fvz, fvi, feat = _single_triangle()
    img, fidx = rasterize(64, 64, fvz, fvi, feat)
    # at the centroid, weights are 1/3 each
    cx, cy = 32, int((1 - (-1.0 / 6.0 + 1) / 2) * 64)  # centroid y = -1/6
    # just use center pixel where bary weights sum to 1
    covered = np.asarray(fidx[0]) >= 0
    vals = np.asarray(img[0])[covered]
    s = vals.sum(axis=-1)
    assert np.all(s <= 1.0 + 1e-5)
    assert np.all(vals >= -1e-6)


def test_rasterize_occlusion():
    """Closer (larger z) triangle wins."""
    fvi = jnp.asarray([[
        [[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]],
        [[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]],
    ]])
    fvz = jnp.asarray([[[-2.0, -2.0, -2.0], [-1.0, -1.0, -1.0]]])
    feat = jnp.asarray([[
        [[1.0], [1.0], [1.0]],
        [[2.0], [2.0], [2.0]],
    ]])
    img, fidx = rasterize(16, 16, fvz, fvi, feat)
    covered = np.asarray(fidx[0]) >= 0
    assert np.all(np.asarray(fidx[0])[covered] == 1)
    np.testing.assert_allclose(np.asarray(img[0])[covered], 2.0, rtol=1e-5)


def test_rasterize_valid_faces_mask():
    fvz, fvi, feat = _single_triangle()
    valid = jnp.asarray([[False]])
    img, fidx = rasterize(16, 16, fvz, fvi, feat, valid_faces=valid)
    assert np.all(np.asarray(fidx) == -1)
    np.testing.assert_allclose(img, 0.0)


def test_rasterize_gradients():
    fvz, fvi, feat = _single_triangle()

    def loss(v, f):
        img, _ = rasterize(32, 32, fvz, v, f)
        return jnp.sum(img ** 2)

    gv, gf = jax.grad(loss, argnums=(0, 1))(fvi, feat)
    assert np.isfinite(np.asarray(gv)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert np.abs(np.asarray(gf)).max() > 0
    # numerical check on a feature entry
    eps = 1e-3
    num = (loss(fvi, feat.at[0, 0, 0, 0].add(eps))
           - loss(fvi, feat.at[0, 0, 0, 0].add(-eps))) / (2 * eps)
    np.testing.assert_allclose(gf[0, 0, 0, 0], num, rtol=1e-2)


def test_soft_mask_basics():
    fvz, fvi, feat = _single_triangle()
    _, fidx = rasterize(32, 32, fvz, fvi, feat)
    mask = dibr_soft_mask(fvi, fidx, sigmainv=7000, boxlen=0.1)
    mask = np.asarray(mask[0])
    covered = np.asarray(fidx[0]) >= 0
    np.testing.assert_allclose(mask[covered], 1.0)
    # just outside the triangle: positive but < 1
    row = mask[16]
    fringe = row[(row > 0) & (row < 1.0)]
    assert fringe.size > 0
    # far corner ~ 0
    assert mask[0, 0] < 1e-3


def test_soft_mask_gradient():
    fvz, fvi, feat = _single_triangle()
    _, fidx = rasterize(32, 32, fvz, fvi, feat)

    def loss(v):
        return jnp.sum(dibr_soft_mask(v, fidx, boxlen=0.2) ** 2)

    g = jax.grad(loss)(fvi)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_dibr_rasterization_full():
    fvz, fvi, feat = _single_triangle()
    normals_z = jnp.ones((1, 1))
    img, mask, fidx = dibr_rasterization(32, 32, fvz, fvi, feat, normals_z)
    assert img.shape == (1, 32, 32, 2)
    assert mask.shape == (1, 32, 32)
    # backface culled
    img2, mask2, fidx2 = dibr_rasterization(32, 32, fvz, fvi, feat,
                                            -normals_z)
    assert np.all(np.asarray(fidx2) == -1)


def test_inverse_rendering_pose_step():
    """A gradient step on vertex positions should reduce silhouette loss."""
    fvz, fvi_target, feat = _single_triangle(shift=0.0)
    _, fidx_t = rasterize(32, 32, fvz, fvi_target, feat)
    target_mask = (fidx_t >= 0).astype(jnp.float32)

    fvi = _single_triangle(shift=0.3)[1]

    def loss(v):
        _, fidx = rasterize(32, 32, fvz, v, feat)
        soft = dibr_soft_mask(v, fidx, boxlen=0.3, sigmainv=70)
        return mask_iou(soft, target_mask)

    l0 = loss(fvi)
    g = jax.grad(loss)(fvi)
    assert np.isfinite(np.asarray(g)).all()
    lr = 0.05
    fvi2 = fvi - lr * g / (jnp.linalg.norm(g) + 1e-8)
    l1 = loss(fvi2)
    assert float(l1) < float(l0), (float(l0), float(l1))


def _uv_sphere_faces(n_lat=24, n_lon=48):
    """UV-sphere projected to image space → (fvz (1,F,3), fvi (1,F,3,2))."""
    lat = np.linspace(0.1, np.pi - 0.1, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    th, ph = np.meshgrid(lat, lon, indexing="ij")
    v = np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                  np.sin(th) * np.sin(ph)], -1).reshape(-1, 3)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    f = np.asarray(faces, np.int32)
    cam = v.astype(np.float32) + np.array([0, 0, -3.0], np.float32)
    z = cam[:, 2]
    xy = cam[:, :2] / (-z[:, None]) * 2.0
    return jnp.asarray(z[f])[None], jnp.asarray(xy[f])[None]


def test_binned_backend_matches_brute():
    """Tile-binned rasterization (auto for F>=1024) == brute-force scan."""
    fvz, fvi = _uv_sphere_faces()
    F = fvz.shape[1]
    assert F >= 1024
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.rand(1, F, 3, 4).astype(np.float32))
    img_b, idx_b = rasterize(256, 256, fvz, fvi, feat, backend="brute")
    img_t, idx_t = rasterize(256, 256, fvz, fvi, feat, backend="binned")
    assert np.array_equal(np.asarray(idx_b), np.asarray(idx_t))
    np.testing.assert_allclose(np.asarray(img_b), np.asarray(img_t),
                               atol=1e-6)


def test_binned_soft_mask_matches_brute():
    from kaolin_tpu.render.mesh.dibr import (_soft_mask_binned,
                                             _soft_mask_unbatched)
    fvz, fvi = _uv_sphere_faces()
    _, idx = rasterize(256, 256, fvz, fvi,
                       jnp.zeros(fvz.shape + (1,)), backend="brute")
    scaled = fvi[0] * 1000.0
    sm_u = _soft_mask_unbatched(scaled, idx[0], 7000.0, 0.02, 1000.0,
                                256, 256)
    sm_b = _soft_mask_binned(scaled, idx[0], 7000.0, 0.02, 1000.0, 256, 256)
    np.testing.assert_allclose(np.asarray(sm_u), np.asarray(sm_b), atol=1e-5)

    def loss_u(v):
        return jnp.sum(_soft_mask_unbatched(
            v * 1000.0, idx[0], 7000.0, 0.02, 1000.0, 256, 256) ** 2)

    def loss_b(v):
        return jnp.sum(_soft_mask_binned(
            v * 1000.0, idx[0], 7000.0, 0.02, 1000.0, 256, 256) ** 2)

    # The soft mask is kinked (6-way distance min): near tie curves every
    # implementation picks a valid subgradient, and fp jitter under fusion
    # flips branches (plain AD already differs jit-vs-eager there), so
    # pointwise gradient equality is only well-posed with both sides traced
    # identically. Check (a) the custom VJP equals AD exactly when evaluated
    # eagerly, and (b) under jit the gradient predicts finite differences.
    rng = np.random.RandomState(3)
    soup = jnp.asarray(rng.randn(1500, 3, 2).astype(np.float32) * 0.17)
    with jax.disable_jit():
        g_u = jax.grad(loss_u)(soup)
        g_b = jax.grad(loss_b)(soup)
    scale = np.abs(np.asarray(g_u)).max() + 1e-8
    np.testing.assert_allclose(np.asarray(g_b) / scale,
                               np.asarray(g_u) / scale, atol=1e-4)

    g_jit = jax.jit(jax.grad(loss_b))(soup)
    d = np.abs(np.asarray(g_jit) - np.asarray(g_b)) / scale
    # identical except at the measure-zero kink set, where fused-fp branch
    # flips pick a different (equally valid) subgradient
    assert np.quantile(d, 0.995) < 1e-4, np.quantile(d, 0.995)
    assert np.isfinite(np.asarray(g_jit)).all()
