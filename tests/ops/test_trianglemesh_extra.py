"""Depth tests for the less-traveled ops.mesh API, mirroring the reference's
test coverage (reference tests/python/kaolin/ops/mesh/test_trianglemesh.py:
packed ops, feature sampling, tangents, averaged vertex features).

Statistical properties use fixed seeds; packed ops are checked against the
per-mesh dense equivalents they must agree with.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops.batch import get_first_idx
from kaolin_tpu.ops.mesh import (
    average_face_vertex_features,
    face_areas,
    face_normals,
    index_vertices_by_faces,
    packed_face_areas,
    packed_sample_points,
    sample_points,
    subdivide_trianglemesh,
    unindex_vertices_by_faces,
    uniform_laplacian_smoothing,
    vertex_tangents,
)


def _random_mesh(key, v=24, f=40, batch=1):
    kv, kf = jax.random.split(key)
    verts = jax.random.normal(kv, (batch, v, 3), dtype=jnp.float32)
    faces = jax.random.randint(kf, (f, 3), 0, v, dtype=jnp.int32)
    # avoid degenerate faces with repeated vertices
    faces = np.array(faces)
    for r in range(f):
        while len(set(faces[r])) < 3:
            faces[r] = (faces[r] + np.arange(1, 4)) % v
    return verts, jnp.asarray(faces)


_QUAD = dict(
    # two unit right triangles tiling the xy unit square
    verts=jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [1., 1., 0.],
                        [0., 1., 0.]]]),
    faces=jnp.asarray([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32),
)


class TestPackedOps:
    def test_packed_face_areas_matches_dense(self):
        key = jax.random.PRNGKey(0)
        va, fa = _random_mesh(jax.random.PRNGKey(1), v=10, f=14)
        vb, fb = _random_mesh(jax.random.PRNGKey(2), v=16, f=22)
        packed_verts = jnp.concatenate([va[0], vb[0]], axis=0)
        first_idx_vertices = get_first_idx(np.asarray([10, 16]))
        packed_faces = jnp.concatenate([fa, fb], axis=0)
        nf = np.asarray([14, 22])
        out = packed_face_areas(packed_verts, first_idx_vertices,
                                packed_faces, nf)
        expect = jnp.concatenate([face_areas(va, fa)[0],
                                  face_areas(vb, fb)[0]])
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   rtol=1e-5)
        del key

    def test_packed_sample_points_on_surfaces(self):
        # two axis-aligned unit squares at z=0 and z=2: every sample must lie
        # exactly on its mesh's plane, in-bounds, and merged face ids must
        # index into the right packed range.
        quad_v = np.asarray(_QUAD["verts"][0])
        packed_verts = jnp.asarray(
            np.concatenate([quad_v, quad_v + [0.0, 0.0, 2.0]], axis=0))
        packed_faces = jnp.concatenate(
            [_QUAD["faces"], _QUAD["faces"]], axis=0)
        first_idx_vertices = get_first_idx(np.asarray([4, 4]))
        nf = np.asarray([2, 2])
        pts, merged = packed_sample_points(
            packed_verts, first_idx_vertices, packed_faces, nf, 200,
            jax.random.PRNGKey(3))
        pts = np.asarray(pts)
        merged = np.asarray(merged)
        assert pts.shape == (2, 200, 3)
        np.testing.assert_allclose(pts[0, :, 2], 0.0, atol=1e-6)
        np.testing.assert_allclose(pts[1, :, 2], 2.0, atol=1e-6)
        assert pts[..., :2].min() >= -1e-6 and pts[..., :2].max() <= 1 + 1e-6
        assert merged[0].min() >= 0 and merged[0].max() <= 1
        assert merged[1].min() >= 2 and merged[1].max() <= 3


class TestSamplePoints:
    def test_feature_interpolation_linear_field(self):
        # features equal to the vertex coordinates: interpolated features
        # must reproduce the sample positions exactly.
        verts, faces = _QUAD["verts"], _QUAD["faces"]
        face_feats = index_vertices_by_faces(verts, faces)  # (B, F, 3, 3)
        pts, choices, feats = sample_points(
            verts, faces, 128, jax.random.PRNGKey(4),
            face_features=face_feats)
        np.testing.assert_allclose(np.asarray(feats), np.asarray(pts),
                                   rtol=1e-5, atol=1e-6)
        assert choices.dtype == jnp.int32

    def test_area_weighting_statistics(self):
        # one tiny and one large triangle: sample counts must follow areas.
        verts = jnp.asarray([[[0., 0., 0.], [1., 0., 0.], [0., 1., 0.],
                              [10., 10., 0.], [10.1, 10., 0.],
                              [10., 10.1, 0.]]])
        faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], dtype=jnp.int32)
        _, choices = sample_points(verts, faces, 4096, jax.random.PRNGKey(5))
        frac_large = float((np.asarray(choices) == 0).mean())
        # areas 0.5 vs 0.005 → ≥ 0.97 of samples on face 0
        assert frac_large > 0.97

    def test_precomputed_areas_respected(self):
        verts, faces = _QUAD["verts"], _QUAD["faces"]
        forced = jnp.asarray([[1.0, 0.0]])  # force all samples onto face 0
        _, choices = sample_points(verts, faces, 64, jax.random.PRNGKey(6),
                                   areas=forced)
        assert np.all(np.asarray(choices) == 0)


class TestVertexFeatureOps:
    def test_unindex_roundtrip(self):
        verts, faces = _random_mesh(jax.random.PRNGKey(7))
        fv = index_vertices_by_faces(verts, faces)
        flat_v, flat_f = unindex_vertices_by_faces(fv)
        # re-indexing the unindexed mesh reproduces the face vertices
        re = flat_v[:, flat_f]
        np.testing.assert_allclose(np.asarray(re), np.asarray(fv), rtol=1e-6)

    def test_average_face_vertex_features(self):
        # vertex 2 shared by both quad faces with different per-face values
        faces = _QUAD["faces"]
        face_feats = jnp.zeros((1, 2, 3, 1))
        face_feats = face_feats.at[0, 0, 2, 0].set(2.0)  # face 0's corner at v2
        face_feats = face_feats.at[0, 1, 1, 0].set(4.0)  # face 1's corner at v2
        out = average_face_vertex_features(faces, face_feats, num_vertices=4)
        np.testing.assert_allclose(float(out[0, 2, 0]), 3.0, rtol=1e-6)
        # v1 appears once (face 0 corner 1) with value 0 → average 0
        np.testing.assert_allclose(float(out[0, 1, 0]), 0.0, atol=1e-7)


class TestVertexTangents:
    def test_planar_uv_aligned(self):
        # planar quad with UVs equal to xy: tangent is +x everywhere, and
        # orthogonal to the +z normal.
        verts, faces = _QUAD["verts"], _QUAD["faces"]
        fv = index_vertices_by_faces(verts, faces)[0]
        uvs = fv[..., :2]
        normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
        tans = vertex_tangents(faces, fv, uvs, normals)
        np.testing.assert_allclose(np.asarray(tans),
                                   np.tile([[1.0, 0.0, 0.0]], (4, 1)),
                                   atol=1e-5)

    def test_orthogonal_to_normals_random(self):
        key = jax.random.PRNGKey(8)
        verts, faces = _random_mesh(key, v=30, f=50)
        fv = index_vertices_by_faces(verts, faces)[0]
        uvs = jax.random.uniform(jax.random.PRNGKey(9), (50, 3, 2))
        fnorm = face_normals(fv[None], unit=True)[0]  # (F, 3)
        from kaolin_tpu.ops.mesh import compute_vertex_normals
        per_corner = jnp.broadcast_to(fnorm[None, :, None, :], (1, 50, 3, 3))
        vnorm = compute_vertex_normals(faces, per_corner, num_vertices=30)[0]
        vnorm = vnorm / jnp.clip(jnp.linalg.norm(vnorm, axis=-1,
                                                 keepdims=True), 1e-12, None)
        tans = vertex_tangents(faces, fv, uvs, vnorm)
        dots = np.abs(np.asarray(jnp.sum(tans * vnorm, axis=-1)))
        assert dots.max() < 1e-4
        norms = np.asarray(jnp.linalg.norm(tans, axis=-1))
        # unit length wherever a tangent was accumulated
        assert np.all((norms < 1e-6) | (np.abs(norms - 1.0) < 1e-4))


class TestSmoothingAndSubdivision:
    def test_uniform_laplacian_smoothing_contracts(self):
        key = jax.random.PRNGKey(10)
        verts, faces = _random_mesh(key, v=20, f=36)
        smoothed = uniform_laplacian_smoothing(verts, faces)
        # smoothing a centered cloud reduces spread
        c0 = verts - verts.mean(axis=1, keepdims=True)
        c1 = smoothed - smoothed.mean(axis=1, keepdims=True)
        assert float(jnp.abs(c1).mean()) < float(jnp.abs(c0).mean())

    def test_subdivision_preserves_flat_surface(self):
        # Loop-style subdivision of a flat quad stays in-plane and grows
        # faces 4x per iteration.
        verts, faces = _QUAD["verts"], _QUAD["faces"]
        for iters in (1, 2):
            nv, nf = subdivide_trianglemesh(verts, faces, iters)
            assert nf.shape[0] == faces.shape[0] * 4 ** iters
            np.testing.assert_allclose(np.asarray(nv[..., 2]), 0.0, atol=1e-6)

    def test_subdivision_alpha_zero_keeps_vertices(self):
        verts, faces = _QUAD["verts"], _QUAD["faces"]
        alpha = jnp.zeros((1, 4))
        nv, _ = subdivide_trianglemesh(verts, faces, 1, alpha=alpha)
        np.testing.assert_allclose(np.asarray(nv[:, :4]), np.asarray(verts),
                                   atol=1e-6)
