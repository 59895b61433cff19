"""Numerical-vs-analytic gradient checks for every differentiable op family.

The reference gradchecks each autograd Function (e.g.
tests/python/kaolin/metrics/test_pointcloud.py ``gradcheck``,
test_trianglemesh.py, render tests); here ``jax.test_util.check_grads``
compares reverse-mode gradients against finite differences. Checks run in
float64 (``jax.experimental.enable_x64``) so finite differencing is
well-conditioned; inputs are chosen away from non-smooth points (unique
nearest neighbors, faces not edge-on).
"""

import jax
import jax.numpy as jnp
import jax.test_util
import numpy as np
import pytest

def enable_x64():
    return jax.enable_x64(True)


def _check(f, args, order=1, atol=1e-4, rtol=1e-4, eps=1e-5):
    jax.test_util.check_grads(f, args, order=order, modes=("rev",),
                              atol=atol, rtol=rtol, eps=eps)


# ---- metrics.pointcloud (ref test_pointcloud.py gradcheck) ----

def test_sided_distance_grad():
    from kaolin_tpu.metrics.pointcloud import sided_distance
    with enable_x64():
        rng = np.random.RandomState(0)
        p1 = jnp.asarray(rng.randn(2, 11, 3))
        p2 = jnp.asarray(rng.randn(2, 17, 3))
        _check(lambda a, b: jnp.sum(sided_distance(a, b)[0]), (p1, p2))


def test_chamfer_distance_grad():
    from kaolin_tpu.metrics.pointcloud import chamfer_distance
    with enable_x64():
        rng = np.random.RandomState(1)
        p1 = jnp.asarray(rng.randn(2, 9, 3))
        p2 = jnp.asarray(rng.randn(2, 13, 3))
        _check(lambda a, b: jnp.sum(chamfer_distance(a, b)), (p1, p2))
        _check(lambda a, b: jnp.sum(chamfer_distance(a, b, squared=False)),
               (p1, p2))


# ---- metrics.trianglemesh (ref test_trianglemesh.py gradcheck) ----

def test_point_to_mesh_distance_grad():
    from kaolin_tpu.metrics.trianglemesh import point_to_mesh_distance
    with enable_x64():
        rng = np.random.RandomState(2)
        points = jnp.asarray(rng.randn(1, 8, 3))
        fv = jnp.asarray(rng.randn(1, 5, 3, 3))
        _check(lambda p, f: jnp.sum(point_to_mesh_distance(p, f)[0]),
               (points, fv))


# ---- ops.spc trilinear interpolation (named in VERDICT item 8) ----

def test_interpolate_trilinear_grad():
    import kaolin_tpu.ops.spc as spc_ops
    points = jnp.asarray([[0, 0, 0], [0, 1, 1], [1, 1, 1]], dtype=jnp.int16)
    level = 1
    octree = spc_ops.unbatched_points_to_octree(points, level)
    lengths = jnp.asarray([len(octree)], dtype=jnp.int32)
    _, pyramid, exsum = spc_ops.scan_octrees(octree, lengths)
    ph = spc_ops.generate_points(octree, pyramid, exsum)
    dual, pyr_dual = spc_ops.unbatched_make_dual(ph, np.asarray(pyramid)[0])
    trinkets, _ = spc_ops.unbatched_make_trinkets(
        ph, np.asarray(pyramid)[0], dual, np.asarray(pyr_dual))
    coords = jnp.asarray([[[-0.6, -0.7, -0.8]], [[0.3, 0.6, 0.7]]])
    pidx = spc_ops.unbatched_query(octree, exsum, coords[:, 0, :], level)
    with enable_x64():
        rng = np.random.RandomState(3)
        feats = jnp.asarray(rng.randn(np.asarray(dual).shape[0], 2))
        _check(lambda f: jnp.sum(spc_ops.unbatched_interpolate_trilinear(
            coords.astype(jnp.float64), pidx, ph, trinkets, f, level)),
            (feats,))
        # w.r.t. query coordinates too (smooth inside a cell)
        _check(lambda c: jnp.sum(spc_ops.unbatched_interpolate_trilinear(
            c, pidx, ph, trinkets, feats, level)),
            (coords.astype(jnp.float64),))


# ---- render.mesh DIB-R soft mask: the custom VJP (dibr.py:134,305) ----

def _tri_fvi(dtype=jnp.float32):
    # two well-separated triangles in clip space
    return jnp.asarray([
        [[-0.6, -0.5], [0.5, -0.4], [0.0, 0.55]],
        [[0.2, 0.1], [0.8, 0.2], [0.5, 0.75]],
    ], dtype=dtype)


def test_dibr_soft_mask_custom_vjp_vs_numerical():
    """The analytic custom VJP must match finite differences — this is the
    gradient the whole silhouette-loss pipeline depends on."""
    from kaolin_tpu.render.mesh.dibr import dibr_soft_mask
    h = w = 16
    fvi = _tri_fvi()[None]  # (1, 2, 3, 2)
    sel = -jnp.ones((1, h, w), jnp.int32)  # no hard-covered pixels

    def loss(v):
        m = dibr_soft_mask(v, sel, sigmainv=30.0, boxlen=0.5, impl="xla")
        return jnp.sum(m * m)

    g_analytic = jax.grad(loss)(fvi)
    eps = 1e-3
    g_num = np.zeros_like(np.asarray(fvi))
    base = np.asarray(fvi)
    for idx in np.ndindex(*base.shape):
        vp = base.copy(); vp[idx] += eps
        vm = base.copy(); vm[idx] -= eps
        g_num[idx] = (float(loss(jnp.asarray(vp)))
                      - float(loss(jnp.asarray(vm)))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g_analytic), g_num,
                               atol=2e-2, rtol=2e-2)
    assert np.abs(g_num).max() > 1e-3  # the check isn't vacuous


def test_dibr_rasterization_image_grad():
    """Interpolated features must be differentiable w.r.t. face features and
    vertices (ref dibr rasterization backward)."""
    from kaolin_tpu.render.mesh import dibr_rasterization
    h = w = 16
    fvz = -2.0 + jnp.zeros((1, 2, 3))
    fvi = _tri_fvi()[None]
    feat = jnp.asarray(np.random.RandomState(4).rand(1, 2, 3, 4),
                       jnp.float32)
    fn_z = jnp.ones((1, 2))

    def loss_feat(f):
        img, mask, _ = dibr_rasterization(h, w, fvz, fvi, f, fn_z)
        return jnp.sum(img)

    def loss_verts(v):
        img, mask, _ = dibr_rasterization(h, w, fvz, v, feat, fn_z)
        return jnp.sum(img * img)

    gf = jax.grad(loss_feat)(feat)
    assert np.isfinite(np.asarray(gf)).all() and float(jnp.sum(gf)) > 0
    gv = jax.grad(loss_verts)(fvi)
    assert np.isfinite(np.asarray(gv)).all()
    # numeric check on a few vertex coords
    eps = 1e-3
    base = np.asarray(fvi)
    for idx in [(0, 0, 0, 0), (0, 1, 2, 1)]:
        vp = base.copy(); vp[idx] += eps
        vm = base.copy(); vm[idx] -= eps
        num = (float(loss_verts(jnp.asarray(vp)))
               - float(loss_verts(jnp.asarray(vm)))) / (2 * eps)
        np.testing.assert_allclose(float(gv[idx]), num, atol=5e-2, rtol=5e-2)


# ---- render.mesh DefTet ----

def test_deftet_render_grad():
    from kaolin_tpu.render.mesh.deftet import deftet_sparse_render
    with enable_x64():
        h = w = 8
        pixel_coords = jnp.stack(jnp.meshgrid(
            jnp.linspace(-0.9, 0.9, w), jnp.linspace(-0.9, 0.9, h),
            indexing="xy"), -1).reshape(-1, 2)[None]       # (1, P, 2)
        face_vertices_z = jnp.asarray([[-1.5, -1.6, -1.7],
                                       [-2.5, -2.6, -2.4]])[None]
        face_vertices_image = _tri_fvi(jnp.float64)[None]
        feat = jnp.asarray(np.random.RandomState(5).rand(1, 2, 3, 2))
        render_ranges = jnp.broadcast_to(jnp.asarray([-10.0, 0.0]),
                                         pixel_coords.shape)

        def loss_feat(f):
            out, _ = deftet_sparse_render(
                pixel_coords, render_ranges, face_vertices_z,
                face_vertices_image, f, knum=2)
            return jnp.sum(out ** 2)

        def loss_verts(v):
            out, _ = deftet_sparse_render(
                pixel_coords, render_ranges, face_vertices_z, v, feat,
                knum=2)
            return jnp.sum(out ** 2)

        _check(loss_feat, (feat,), atol=1e-3, rtol=1e-3)
        _check(loss_verts, (face_vertices_image,), atol=1e-3, rtol=1e-3,
               eps=1e-6)


# ---- render.lighting spherical gaussians ----

def test_sg_inner_product_grad():
    from kaolin_tpu.render.lighting.sg import unbatched_sg_inner_product
    with enable_x64():
        rng = np.random.RandomState(6)
        amp = jnp.asarray(rng.rand(3, 3) + 0.1)
        dirs = jnp.asarray(rng.randn(3, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        sharp = jnp.asarray(rng.rand(3) * 4 + 1)
        oamp = jnp.asarray(rng.rand(2, 3) + 0.1)
        odirs = jnp.asarray(rng.randn(2, 3))
        odirs = odirs / jnp.linalg.norm(odirs, axis=-1, keepdims=True)
        osharp = jnp.asarray(rng.rand(2) * 4 + 1)
        _check(lambda a, s: jnp.sum(unbatched_sg_inner_product(
            a, dirs, s, oamp, odirs, osharp)), (amp, sharp))


def test_sg_specular_grad():
    from kaolin_tpu.render.lighting.sg import sg_warp_specular_term
    with enable_x64():
        rng = np.random.RandomState(7)
        amp = jnp.asarray(rng.rand(2, 3) + 0.1)
        dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.6, 0.0, 0.8]])
        sharp = jnp.asarray([4.0, 6.0])
        normal = jnp.asarray([[0.1, 0.1, 0.99]])
        normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
        rough = jnp.asarray([0.4])
        view = jnp.asarray([[0.0, 0.0, 1.0]])
        albedo = jnp.asarray([[0.5, 0.6, 0.7]])

        def loss(a, r):
            return jnp.sum(sg_warp_specular_term(
                a, dirs, sharp, normal, r, view, albedo))
        _check(loss, (amp, rough), atol=1e-3, rtol=1e-3)


# ---- math.quat ----

def test_quat_rotation_grad():
    from kaolin_tpu.math.quat import quat_rotate, quat_unit
    with enable_x64():
        rng = np.random.RandomState(8)
        q = jnp.asarray(rng.randn(4, 4))
        pts = jnp.asarray(rng.randn(4, 3))
        _check(lambda qq, p: jnp.sum(quat_rotate(quat_unit(qq), p) ** 2),
               (q, pts))


# ---- physics.materials: analytic gradient/hessian vs autodiff ----

def test_neohookean_gradient_matches_autodiff():
    from kaolin_tpu.physics.materials.neohookean_elastic_material import (
        neohookean_energy, neohookean_gradient, neohookean_hessian)
    with enable_x64():
        rng = np.random.RandomState(9)
        n = 5
        mu = jnp.asarray(rng.rand(n, 1) * 1e4 + 1e3)
        lam = jnp.asarray(rng.rand(n, 1) * 1e4 + 1e3)
        F = jnp.asarray(np.eye(3)[None] + 0.1 * rng.randn(n, 3, 3))
        g_auto = jax.grad(
            lambda f: jnp.sum(neohookean_energy(mu, lam, f)))(F)
        g_analytic = neohookean_gradient(mu, lam, F).reshape(n, 3, 3)
        np.testing.assert_allclose(np.asarray(g_analytic),
                                   np.asarray(g_auto), rtol=1e-6, atol=1e-8)
        # hessian blocks match the AD hessian of the scalar energy
        h_analytic = np.asarray(neohookean_hessian(mu, lam, F))  # (n, 9, 9)

        def energy_one(f_flat, m, l):
            return jnp.sum(neohookean_energy(m[None], l[None],
                                             f_flat.reshape(1, 3, 3)))

        h_auto = np.asarray(jax.vmap(jax.hessian(energy_one))(
            F.reshape(n, 9), mu, lam))                           # (n, 9, 9)
        np.testing.assert_allclose(
            h_analytic.reshape(h_auto.shape), h_auto, rtol=1e-5, atol=1e-4)


def test_linear_elastic_gradient_matches_autodiff():
    from kaolin_tpu.physics.materials.linear_elastic_material import (
        linear_elastic_energy, linear_elastic_gradient)
    with enable_x64():
        rng = np.random.RandomState(10)
        n = 4
        mu = jnp.asarray(rng.rand(n, 1) * 1e4 + 1e3)
        lam = jnp.asarray(rng.rand(n, 1) * 1e4 + 1e3)
        F = jnp.asarray(np.eye(3)[None] + 0.05 * rng.randn(n, 3, 3))
        g_auto = jax.grad(
            lambda f: jnp.sum(linear_elastic_energy(mu, lam, f)))(F)
        g_analytic = linear_elastic_gradient(mu, lam, F).reshape(n, 3, 3)
        np.testing.assert_allclose(np.asarray(g_analytic),
                                   np.asarray(g_auto), rtol=1e-6, atol=1e-8)


# (the newton-bridge coupling force's gradient==AD and hessian==AD checks
# live in tests/physics/test_newton_bridge.py:70,89)
