"""Numerical parity against the reference kaolin's pure-torch CPU paths.

The reference at /root/reference imports via tests.reference_shim (unbuilt
CUDA extensions stubbed); every op here runs its torch CPU implementation as
a golden oracle on the SAME inputs as our jax implementation. Covered
families (ref file:line cited per test): ops.mesh, ops.batch, ops.voxelgrid,
ops.conversions (marching tetrahedra, cubic meshes, voxelization),
math.quat, metrics, render.lighting.sh.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from tests.reference_shim import import_reference_kaolin

ref = import_reference_kaolin()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


def _t(x):
    return torch.as_tensor(np.asarray(x))


def _close(ours, theirs, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               atol=atol, rtol=rtol)


@pytest.fixture(scope="module")
def mesh():
    rng = np.random.RandomState(0)
    v = rng.rand(2, 12, 3).astype(np.float32)
    # a consistent closed-ish topology: icosahedron faces
    f = np.array([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 5], [0, 5, 1],
                  [11, 7, 6], [11, 8, 7], [11, 9, 8], [11, 10, 9],
                  [11, 6, 10], [1, 6, 2], [2, 7, 3], [3, 8, 4], [4, 9, 5],
                  [5, 10, 1], [6, 7, 2], [7, 8, 3], [8, 9, 4], [9, 10, 5],
                  [10, 6, 1]], np.int64)
    return v, f


# ---- ops.mesh (ref ops/mesh/trianglemesh.py, mesh.py) ----

def test_face_areas_parity(mesh):
    import kaolin_tpu.ops.mesh as km
    v, f = mesh
    _close(km.face_areas(jnp.asarray(v), jnp.asarray(f)),
           ref.ops.mesh.face_areas(_t(v), _t(f)))


def test_subdivide_trianglemesh_parity(mesh):
    """Loop subdivision with default alpha. Ref trianglemesh.py:482.
    (Batch of 1: the reference's sparse bmm rejects larger batches on CPU.)"""
    import kaolin_tpu.ops.mesh as km
    v, f = mesh
    v = v[:1]
    for iters in (1, 2):
        tv, tf = ref.ops.mesh.subdivide_trianglemesh(_t(v), _t(f), iters)
        ov, of = km.subdivide_trianglemesh(jnp.asarray(v), jnp.asarray(f),
                                           iters)
        _close(ov, tv, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(of), tf.numpy())


def test_adjacency_and_laplacian_parity(mesh):
    import kaolin_tpu.ops.mesh as km
    _, f = mesh
    theirs = ref.ops.mesh.adjacency_matrix(12, _t(f)).to_dense()
    _close(km.adjacency_matrix(12, jnp.asarray(f)), theirs)
    lap = ref.ops.mesh.uniform_laplacian(12, _t(f))
    _close(km.uniform_laplacian(12, jnp.asarray(f)), lap, atol=1e-6)


def test_vertex_tangents_parity(mesh):
    import kaolin_tpu.ops.mesh as km
    v, f = mesh
    rng = np.random.RandomState(1)
    fv = v[0][f]
    fu = rng.rand(f.shape[0], 3, 2).astype(np.float32)
    vn = rng.randn(12, 3).astype(np.float32)
    vn /= np.linalg.norm(vn, axis=-1, keepdims=True)
    theirs = ref.ops.mesh.vertex_tangents(
        _t(f), _t(fv), _t(fu), _t(vn))
    ours = km.vertex_tangents(jnp.asarray(f), jnp.asarray(fv),
                              jnp.asarray(fu), jnp.asarray(vn))
    _close(ours, theirs, atol=1e-4)


def test_compute_vertex_normals_parity(mesh):
    import kaolin_tpu.ops.mesh as km
    _, f = mesh
    rng = np.random.RandomState(2)
    fn = rng.randn(1, f.shape[0], 3, 3).astype(np.float32)
    theirs = ref.ops.mesh.compute_vertex_normals(_t(f), _t(fn), 12)
    _close(km.compute_vertex_normals(jnp.asarray(f), jnp.asarray(fn), 12),
           theirs, atol=1e-5)


def test_subdivide_tetmesh_parity():
    """Ref ops/mesh/tetmesh.py:85."""
    import kaolin_tpu.ops.mesh as km
    rng = np.random.RandomState(3)
    v = rng.rand(1, 6, 3).astype(np.float32)
    tets = np.array([[0, 1, 2, 3], [1, 2, 3, 4], [2, 3, 4, 5]], np.int64)
    tv, tt = ref.ops.mesh.subdivide_tetmesh(_t(v), _t(tets))
    ov, ot = km.subdivide_tetmesh(jnp.asarray(v), jnp.asarray(tets))
    _close(ov, tv, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ot), tt.numpy())


# ---- ops.batch (ref ops/batch.py) ----

def test_batch_packed_padded_parity():
    import kaolin_tpu.ops.batch as kb
    rng = np.random.RandomState(4)
    lst_np = [rng.rand(3, 2).astype(np.float32),
              rng.rand(5, 2).astype(np.float32),
              rng.rand(1, 2).astype(np.float32)]
    lst_t = [_t(x) for x in lst_np]
    lst_j = [jnp.asarray(x) for x in lst_np]
    t_packed, t_spt = ref.ops.batch.list_to_packed(lst_t)
    o_packed, o_spt = kb.list_to_packed(lst_j)
    _close(o_packed, t_packed)
    np.testing.assert_array_equal(np.asarray(o_spt), t_spt.numpy())
    numel = torch.tensor([x.shape[0] * x.shape[1] for x in lst_t])
    t_fi = ref.ops.batch.get_first_idx(numel)
    o_fi = kb.get_first_idx(jnp.asarray(numel.numpy()))
    np.testing.assert_array_equal(np.asarray(o_fi), t_fi.numpy())
    # packed_to_padded's shape_per_tensor excludes the preserved last dim
    # (ref batch.py:332: packed is (total, last_dim), shapes are (N_i,))
    rows = torch.tensor([x.shape[0] for x in lst_t])
    rows_spt = rows[:, None]
    t_padded = ref.ops.batch.packed_to_padded(
        t_packed, rows_spt, ref.ops.batch.get_first_idx(rows), -1.0,
        max_shape=(6,))
    o_padded = kb.packed_to_padded(
        o_packed, jnp.asarray(rows_spt.numpy()),
        kb.get_first_idx(jnp.asarray(rows.numpy())), -1.0, max_shape=(6,))
    _close(o_padded, t_padded)
    t_back = ref.ops.batch.padded_to_packed(t_padded, rows_spt)
    o_back = kb.padded_to_packed(o_padded, jnp.asarray(rows_spt.numpy()))
    _close(o_back, t_back)


# ---- ops.voxelgrid (ref ops/voxelgrid.py) ----

@pytest.fixture(scope="module")
def voxelgrid():
    rng = np.random.RandomState(5)
    return (rng.rand(2, 8, 8, 8) > 0.6).astype(np.float32)


def test_voxelgrid_downsample_parity(voxelgrid):
    import kaolin_tpu.ops.voxelgrid as kv
    _close(kv.downsample(jnp.asarray(voxelgrid), 2),
           ref.ops.voxelgrid.downsample(_t(voxelgrid), 2), atol=1e-6)


def test_voxelgrid_fill_surface_parity(voxelgrid):
    import kaolin_tpu.ops.voxelgrid as kv
    t_filled = ref.ops.voxelgrid.fill(_t(voxelgrid))
    o_filled = kv.fill(jnp.asarray(voxelgrid))
    np.testing.assert_array_equal(np.asarray(o_filled, dtype=bool),
                                  t_filled.numpy().astype(bool))
    t_surf = ref.ops.voxelgrid.extract_surface(_t(voxelgrid))
    o_surf = kv.extract_surface(jnp.asarray(voxelgrid))
    np.testing.assert_array_equal(np.asarray(o_surf, dtype=bool),
                                  t_surf.numpy().astype(bool))


def test_voxelgrid_odms_parity(voxelgrid):
    """Orthographic depth maps + projection. Ref voxelgrid.py:208,307."""
    import kaolin_tpu.ops.voxelgrid as kv
    t_odms = ref.ops.voxelgrid.extract_odms(_t(voxelgrid))
    o_odms = kv.extract_odms(jnp.asarray(voxelgrid))
    np.testing.assert_array_equal(np.asarray(o_odms), t_odms.numpy())
    t_proj = ref.ops.voxelgrid.project_odms(t_odms)
    o_proj = kv.project_odms(o_odms)
    np.testing.assert_array_equal(np.asarray(o_proj, dtype=bool),
                                  t_proj.numpy().astype(bool))


def test_voxelgrid_iou_parity(voxelgrid):
    import kaolin_tpu.metrics.voxelgrid as kvm
    other = np.roll(voxelgrid, 1, axis=1)
    _close(kvm.iou(jnp.asarray(voxelgrid), jnp.asarray(other)),
           ref.metrics.voxelgrid.iou(_t(voxelgrid), _t(other)), atol=1e-6)


# ---- ops.conversions ----

def test_marching_tetrahedra_parity():
    """DMTet surface extraction. Ref ops/conversions/tetmesh.py:116."""
    import kaolin_tpu.ops.conversions as kc
    rng = np.random.RandomState(6)
    v = rng.rand(1, 8, 3).astype(np.float32)
    tets = np.array([[0, 1, 2, 3], [4, 5, 6, 7], [1, 2, 3, 4],
                     [2, 3, 4, 5]], np.int64)
    sdf = (rng.rand(1, 8) - 0.5).astype(np.float32)
    t_verts, t_faces = ref.ops.conversions.marching_tetrahedra(
        _t(v), _t(tets), _t(sdf))
    o_verts, o_faces = kc.marching_tetrahedra(
        jnp.asarray(v), jnp.asarray(tets), jnp.asarray(sdf))
    tv, tf = t_verts[0].detach().numpy(), t_faces[0].numpy()
    ov, of = np.asarray(o_verts[0]), np.asarray(o_faces[0])
    # vertex order may differ; compare triangle soups by sorted centroids
    t_tris = np.sort(tv[tf].reshape(len(tf), -1), axis=0)
    o_tris = np.sort(ov[of].reshape(len(of), -1), axis=0)
    assert len(tf) == len(of)
    np.testing.assert_allclose(np.sort(t_tris.ravel()),
                               np.sort(o_tris.ravel()), atol=1e-5)


def test_voxelgrids_to_cubic_meshes_parity(voxelgrid):
    """Ref ops/conversions/voxelgrid.py:56."""
    import kaolin_tpu.ops.conversions as kc
    t_out = ref.ops.conversions.voxelgrids_to_cubic_meshes(
        _t(voxelgrid[:1]), is_trimesh=True)
    o_out = kc.voxelgrids_to_cubic_meshes(jnp.asarray(voxelgrid[:1]),
                                          is_trimesh=True)
    tv, tf = t_out[0][0].numpy(), t_out[1][0].numpy()
    ov, of = np.asarray(o_out[0][0]), np.asarray(o_out[1][0])
    # same surface: compare vertex sets and face counts
    assert tv.shape == ov.shape and tf.shape == of.shape
    t_sorted = tv[np.lexsort(tv.T.round(5))]
    o_sorted = ov[np.lexsort(ov.T.round(5))]
    np.testing.assert_allclose(t_sorted, o_sorted, atol=1e-5)


def test_pointclouds_to_voxelgrids_parity():
    """Ref ops/conversions/pointcloud.py:77."""
    import kaolin_tpu.ops.conversions as kc
    rng = np.random.RandomState(7)
    pts = rng.rand(2, 64, 3).astype(np.float32)
    t_vg = ref.ops.conversions.pointclouds_to_voxelgrids(_t(pts), 8)
    o_vg = kc.pointclouds_to_voxelgrids(jnp.asarray(pts), 8)
    np.testing.assert_array_equal(np.asarray(o_vg, dtype=bool),
                                  t_vg.numpy().astype(bool))


# ---- math.quat (ref math/quat/quaternion.py, rotation33.py) ----

def test_quat_parity():
    import kaolin_tpu.math.quat as kq
    rng = np.random.RandomState(8)
    a = rng.randn(5, 4).astype(np.float32)
    b = rng.randn(5, 4).astype(np.float32)
    _close(kq.quat_mul(jnp.asarray(a), jnp.asarray(b)),
           ref.math.quat.quat_mul(_t(a), _t(b)), atol=1e-5)
    un = a / np.linalg.norm(a, axis=-1, keepdims=True)
    _close(kq.rot33_from_quat(jnp.asarray(un)),
           ref.math.quat.rot33_from_quat(_t(un)), atol=1e-5)
    _close(kq.quat_conjugate(jnp.asarray(a)),
           ref.math.quat.quat_conjugate(_t(a)), atol=1e-6)
    pts = rng.randn(5, 3).astype(np.float32)
    _close(kq.quat_rotate(jnp.asarray(un), jnp.asarray(pts)),
           ref.math.quat.quat_rotate(_t(un), _t(pts)), atol=1e-4)


# ---- metrics (pure-torch paths) ----

def test_average_edge_length_parity(mesh):
    import kaolin_tpu.metrics.trianglemesh as kt
    v, f = mesh
    _close(kt.average_edge_length(jnp.asarray(v), jnp.asarray(f)),
           ref.metrics.trianglemesh.average_edge_length(_t(v), _t(f)),
           atol=1e-5)


def test_tetmesh_equivolume_parity():
    import kaolin_tpu.metrics.tetmesh as kt
    rng = np.random.RandomState(9)
    tets = rng.rand(1, 5, 4, 3).astype(np.float32)
    theirs = ref.metrics.tetmesh.equivolume(_t(tets))
    _close(kt.equivolume(jnp.asarray(tets)), theirs, atol=1e-5, rtol=1e-4)


# ---- render.lighting spherical harmonics (ref lighting/sh.py) ----

def test_sh9_parity():
    import kaolin_tpu.render.lighting as kl
    rng = np.random.RandomState(10)
    dirs = rng.randn(7, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    _close(kl.project_onto_sh9(jnp.asarray(dirs)),
           ref.render.lighting.project_onto_sh9(_t(dirs)), atol=1e-5)
    l9 = rng.rand(9).astype(np.float32)
    _close(kl.sh9_irradiance(jnp.asarray(l9), jnp.asarray(dirs)),
           ref.render.lighting.sh9_irradiance(_t(l9), _t(dirs)), atol=1e-4)


# ---- batch 2: coords, morton, laplacian smoothing, indexing, textures,
# quat conversions, GCN ----

def test_coords_spherical_roundtrip_parity():
    """Ref ops/coords.py:32,48."""
    import kaolin_tpu.ops.coords as kc
    rng = np.random.RandomState(11)
    x, y, z = [rng.randn(6).astype(np.float32) for _ in range(3)]
    t_az, t_el, t_d = ref.ops.coords.cartesian2spherical(
        _t(x), _t(y), _t(z))
    o_az, o_el, o_d = kc.cartesian2spherical(
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z))
    _close(o_az, t_az, atol=1e-5)
    _close(o_el, t_el, atol=1e-5)
    _close(o_d, t_d, atol=1e-5)
    t_back = ref.ops.coords.spherical2cartesian(t_az, t_el, t_d)
    o_back = kc.spherical2cartesian(o_az, o_el, o_d)
    for o, t in zip(o_back, t_back):
        _close(o, t, atol=1e-5)


def test_morton_parity():
    """vs a bit-interleave oracle (the reference's CPU path is CUDA-stubbed;
    semantics from ref ops/spc/points.py:79-130: morton = interleave of
    (x, y, z) bits with x highest)."""
    import kaolin_tpu.ops.spc as ks
    rng = np.random.RandomState(12)
    pts = rng.randint(0, 512, (20, 3)).astype(np.int16)

    def oracle(p):
        out = 0
        for bit in range(10):
            for axis in range(3):
                out |= ((int(p[axis]) >> bit) & 1) << (3 * bit + (2 - axis))
        return out

    want = np.array([oracle(p) for p in pts], np.int64)
    o_m = ks.points_to_morton(jnp.asarray(pts))
    np.testing.assert_array_equal(np.asarray(o_m), want)
    o_back = ks.morton_to_points(o_m)
    np.testing.assert_array_equal(np.asarray(o_back), pts)


def test_uniform_laplacian_smoothing_parity(mesh):
    """Ref metrics/trianglemesh.py:318."""
    import kaolin_tpu.metrics.trianglemesh as kt
    v, f = mesh
    theirs = ref.metrics.trianglemesh.uniform_laplacian_smoothing(
        _t(v), _t(f))
    _close(kt.uniform_laplacian_smoothing(jnp.asarray(v), jnp.asarray(f)),
           theirs, atol=1e-5)


def test_index_vertices_by_faces_parity(mesh):
    import kaolin_tpu.ops.mesh as km
    v, f = mesh
    _close(km.index_vertices_by_faces(jnp.asarray(v), jnp.asarray(f)),
           ref.ops.mesh.index_vertices_by_faces(_t(v), _t(f)))


def test_texture_mapping_parity():
    """Ref render/mesh/utils.py:23 (grid_sample semantics)."""
    import kaolin_tpu.render.mesh as kr
    rng = np.random.RandomState(13)
    uv = rng.rand(2, 10, 2).astype(np.float32)
    tex = rng.rand(2, 3, 16, 16).astype(np.float32)
    for mode in ("nearest", "bilinear"):
        theirs = ref.render.mesh.texture_mapping(_t(uv), _t(tex), mode=mode)
        ours = kr.texture_mapping(jnp.asarray(uv), jnp.asarray(tex),
                                  mode=mode)
        _close(ours, theirs, atol=1e-4)


def test_quat_from_rot33_and_angle_axis_parity():
    import kaolin_tpu.math.quat as kq
    rng = np.random.RandomState(14)
    # random proper rotations via QR
    m = rng.randn(4, 3, 3).astype(np.float32)
    q_, _ = np.linalg.qr(m)
    det = np.linalg.det(q_)
    q_[det < 0] *= -1
    t_q = ref.math.quat.quat_from_rot33(_t(q_))
    o_q = kq.quat_from_rot33(jnp.asarray(q_))
    # quaternions match up to sign
    tq = t_q.numpy()
    oq = np.asarray(o_q)
    sign = np.sign(np.sum(tq * oq, axis=-1, keepdims=True))
    np.testing.assert_allclose(oq * sign, tq, atol=1e-4)

    ang = rng.rand(5, 1).astype(np.float32) * 3.0
    ax = rng.randn(5, 3).astype(np.float32)
    ax /= np.linalg.norm(ax, axis=-1, keepdims=True)
    _close(kq.quat_from_angle_axis(jnp.asarray(ang), jnp.asarray(ax)),
           ref.math.quat.quat_from_angle_axis(_t(ang), _t(ax)), atol=1e-5)


def test_gcn_parity():
    """GraphConv with identical weights + sparse_bmm. Ref ops/gcn.py:24,80."""
    import kaolin_tpu.ops.gcn as kg
    rng = np.random.RandomState(15)
    dense = rng.rand(1, 5, 4).astype(np.float32)
    adj_rows = np.array([0, 1, 2, 3, 4, 0, 1])
    adj_cols = np.array([0, 1, 2, 3, 4, 2, 3])
    vals = np.ones(7, np.float32)
    t_sp = torch.sparse_coo_tensor(
        np.stack([adj_rows, adj_cols]), _t(vals), (5, 5))
    ours = kg.sparse_bmm(
        (jnp.stack([jnp.asarray(adj_rows), jnp.asarray(adj_cols)]),
         jnp.asarray(vals), (5, 5)), jnp.asarray(dense))
    _close(ours, ref.ops.gcn.sparse_bmm(t_sp, _t(dense)), atol=1e-5)


# ---- batch 3: core physics operators (ref physics/simplicits + utils) ----

def test_standard_lbs_parity():
    """Linear blend skinning. Ref physics/simplicits/skinning.py:39."""
    from kaolin_tpu.physics.simplicits.skinning import standard_lbs
    rng = np.random.RandomState(16)
    x0 = rng.rand(12, 3).astype(np.float32)
    tfms = (rng.rand(2, 3, 3, 4) * 0.1).astype(np.float32)
    w = rng.rand(12, 3).astype(np.float32)
    want = ref.physics.simplicits.skinning.standard_lbs(
        _t(x0), _t(tfms), _t(w))
    got = standard_lbs(jnp.asarray(x0), jnp.asarray(tfms), jnp.asarray(w))
    _close(got, want, atol=1e-5)


def test_lbs_matrix_parity():
    """Dense (3N, 12H) LBS Jacobian. Ref precomputed.py:358."""
    from kaolin_tpu.physics.simplicits.precomputed import lbs_matrix
    rng = np.random.RandomState(17)
    x0 = rng.rand(9, 3).astype(np.float32)
    w = rng.rand(9, 4).astype(np.float32)
    want = ref.physics.simplicits.precomputed.lbs_matrix(_t(x0), _t(w))
    got = lbs_matrix(jnp.asarray(x0), jnp.asarray(w))
    _close(got, want, atol=1e-5)


def test_hess_reduction_parity():
    """J^T H J with block-diagonal H. Ref physics/utils/torch_utilities.py:68."""
    from kaolin_tpu.physics.utils.torch_utilities import hess_reduction
    rng = np.random.RandomState(18)
    n_blocks, bs, red = 10, 3, 8
    ja = rng.rand(n_blocks * bs, red).astype(np.float32)
    h = rng.rand(n_blocks, bs, bs).astype(np.float32)
    want = ref.physics.utils.hess_reduction(_t(ja), _t(h))
    got = hess_reduction(jnp.asarray(ja), jnp.asarray(h))
    _close(got, want, atol=1e-4, rtol=1e-4)


def test_finite_diff_jac_parity():
    from kaolin_tpu.physics.utils.finite_diff import finite_diff_jac
    rng = np.random.RandomState(19)
    x = rng.rand(5, 3).astype(np.float32)

    def f_t(p):
        return (p * p).sum(dim=-1, keepdim=True)

    def f_j(p):
        return jnp.sum(p * p, axis=-1, keepdims=True)

    want = ref.physics.utils.finite_diff_jac(f_t, _t(x))
    got = finite_diff_jac(f_j, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got).reshape(-1), want.detach().numpy().reshape(-1),
        atol=1e-3, rtol=1e-2)


def test_jacobian_dF_dz_parity():
    """dF/dz through identical-weight skinning models. Ref precomputed.py:475."""
    import torch as _torch
    from kaolin_tpu.physics.simplicits.network import SkinningFn
    from kaolin_tpu.physics.simplicits.precomputed import jacobian_dF_dz
    _torch.manual_seed(5)
    theirs_model = ref.physics.simplicits.network.SimplicitsMLP(3, 8, 3, 1)
    params = []
    for mod in theirs_model.linear_elu_stack:
        if isinstance(mod, _torch.nn.Linear):
            params.append({
                "w": jnp.asarray(mod.weight.detach().numpy().T.copy()),
                "b": jnp.asarray(mod.bias.detach().numpy().copy()),
            })
    ours_model = SkinningFn(params=params)
    rng = np.random.RandomState(20)
    x0 = rng.rand(6, 3).astype(np.float32)
    z = np.zeros((1, 24), np.float32)  # 2 learned handles x 12
    want = ref.physics.simplicits.precomputed.jacobian_dF_dz(
        theirs_model, _t(x0), _t(z))
    # the reference differentiates through fcn(x0) = the model's LEARNED
    # handles (no constant); pass the bare weight function for the same
    got = jacobian_dF_dz(lambda p: ours_model(p), jnp.asarray(x0),
                         jnp.asarray(z))
    np.testing.assert_allclose(
        np.asarray(got).reshape(want.shape), want.detach().numpy(),
        atol=1e-4, rtol=1e-3)
