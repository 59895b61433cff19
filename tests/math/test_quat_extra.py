"""Depth tests for math.quat, mirroring the reference's quaternion test
coverage (reference tests/python/kaolin/math/quat/test_quaternion.py and
siblings): component accessors, positivity/abs/unit normalizations, edge-case
rotations (180° about each axis, tiny angles), matrix44 builders, euclidean
4x4 validity, and transform algebra laws.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.math import quat as q


@pytest.fixture
def rand_quats(key):
    return q.quat_unit(jax.random.normal(key, (32, 4)))


class TestComponents:
    def test_real_imaginary_split(self, rand_quats):
        re = q.quat_real(rand_quats)
        im = q.quat_imaginary(rand_quats)
        assert re.shape == (32, 1) or re.shape == (32,)
        rebuilt = jnp.concatenate(
            [im, re.reshape(32, 1)], axis=-1)
        np.testing.assert_allclose(np.asarray(rebuilt),
                                   np.asarray(rand_quats), atol=1e-7)

    def test_positive_fixes_hemisphere(self, rand_quats):
        pos = q.quat_positive(-jnp.abs(rand_quats))
        assert np.all(np.asarray(q.quat_real(pos)) >= 0)
        # q and -q encode the same rotation
        pts = jnp.asarray([[1.0, 2.0, 3.0]])
        r1 = q.quat_rotate(rand_quats[:1], pts)
        r2 = q.quat_rotate(q.quat_positive(-rand_quats[:1]), pts)
        np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)

    def test_abs_is_norm(self):
        quat = jnp.asarray([[3.0, 0.0, 4.0, 0.0]])
        np.testing.assert_allclose(float(q.quat_abs(quat).reshape(())), 5.0,
                                   rtol=1e-6)

    def test_unit_positive(self, rand_quats):
        up = q.quat_unit_positive(rand_quats * -7.5)
        norms = np.asarray(q.quat_abs(up)).reshape(-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        assert np.all(np.asarray(q.quat_real(up)) >= 0)


class TestEdgeRotations:
    @pytest.mark.parametrize("axis", [(1.0, 0.0, 0.0), (0.0, 1.0, 0.0),
                                      (0.0, 0.0, 1.0)])
    def test_half_turn_each_axis(self, axis):
        # 180°: the quat_from_rot33 branch selection must stay stable where
        # the trace-based formula degenerates (w = 0).
        axis_arr = jnp.asarray([axis])
        quat = q.quat_from_angle_axis(jnp.asarray([[np.pi]]), axis_arr)
        mat = q.rot33_from_quat(quat)
        back = q.quat_from_rot33(mat)
        pts = jnp.asarray([[0.3, -0.7, 1.1]])
        np.testing.assert_allclose(np.asarray(q.quat_rotate(back, pts)),
                                   np.asarray(q.quat_rotate(quat, pts)),
                                   atol=1e-5)

    def test_degree_flag(self):
        axis = jnp.asarray([[0.0, 0.0, 1.0]])
        qd = q.quat_from_angle_axis(jnp.asarray([[90.0]]), axis, is_degree=True)
        qr = q.quat_from_angle_axis(jnp.asarray([[np.pi / 2]]), axis)
        np.testing.assert_allclose(np.asarray(qd), np.asarray(qr), atol=1e-6)

    def test_tiny_angle_stable(self):
        axis = jnp.asarray([[1.0, 0.0, 0.0]])
        quat = q.quat_from_angle_axis(jnp.asarray([[1e-8]]), axis)
        angle, out_axis = q.angle_axis_from_quat(quat)
        assert np.isfinite(np.asarray(angle)).all()
        assert np.isfinite(np.asarray(out_axis)).all()
        assert abs(float(angle.reshape(())) - 1e-8) < 1e-6

    def test_angle_axis_from_rot33_matches_quat_path(self, key):
        quat = q.quat_unit(jax.random.normal(key, (8, 4)))
        mat = q.rot33_from_quat(quat)
        a1, x1 = q.angle_axis_from_rot33(mat)
        a2, x2 = q.angle_axis_from_quat(q.quat_positive(quat))
        np.testing.assert_allclose(np.asarray(a1).reshape(-1),
                                   np.asarray(a2).reshape(-1), atol=1e-4)
        # axes match up to the sign carried by the angle convention
        dots = np.sum(np.asarray(x1) * np.asarray(x2), axis=-1)
        np.testing.assert_allclose(np.abs(dots), 1.0, atol=1e-4)


class TestMatrix44:
    def test_rot44_embeds_rot33(self, key):
        quat = q.quat_unit(jax.random.normal(key, (4, 4)))
        m44 = q.rot44_from_quat(quat)
        m33 = q.rot33_from_quat(quat)
        np.testing.assert_allclose(np.asarray(m44[:, :3, :3]),
                                   np.asarray(m33), atol=1e-6)
        np.testing.assert_allclose(np.asarray(m44[:, 3, 3]), 1.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m44[:, :3, 3]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m44[:, 3, :3]), 0.0, atol=1e-7)

    def test_translation_and_scale_builders(self):
        t = q.translation_to_mat44(jnp.asarray([[1.0, 2.0, 3.0]]))
        s = q.scale_to_mat44(jnp.asarray([[2.0, 3.0, 4.0]]))
        p = jnp.asarray([1.0, 1.0, 1.0, 1.0])
        np.testing.assert_allclose(np.asarray(t[0] @ p),
                                   [2.0, 3.0, 4.0, 1.0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(s[0] @ p),
                                   [2.0, 3.0, 4.0, 1.0], atol=1e-6)

    def test_pad_mat33(self, key):
        m = jax.random.normal(key, (2, 3, 3))
        m44 = q.pad_mat33_to_mat44(m)
        np.testing.assert_allclose(np.asarray(m44[:, :3, :3]), np.asarray(m))
        np.testing.assert_allclose(np.asarray(m44[:, 3]),
                                   np.tile([0.0, 0.0, 0.0, 1.0], (2, 1)))


class TestEuclidean:
    def test_validity_checks(self, key):
        quat = q.quat_unit(jax.random.normal(key, (3, 4)))
        r = q.rot33_from_quat(quat)
        t = jax.random.normal(jax.random.fold_in(key, 1), (3, 3))
        e = q.euclidean_from_rotation_translation(r=r, t=t)
        assert bool(np.all(np.asarray(q.is_euclidean_valid(e))))
        bad = e.at[:, 3, 0].set(0.5)  # non-[0,0,0,1] bottom row
        assert not bool(np.all(np.asarray(q.is_euclidean_valid(bad))))
        with pytest.raises(Exception):
            q.is_euclidean_valid(bad, throw=True)

    def test_accessors_and_inverse(self, key):
        quat = q.quat_unit(jax.random.normal(key, (5, 4)))
        r = q.rot33_from_quat(quat)
        t = jax.random.normal(jax.random.fold_in(key, 2), (5, 3))
        e = q.euclidean_from_rotation_translation(r=r, t=t)
        np.testing.assert_allclose(np.asarray(q.euclidean_rotation_matrix(e)),
                                   np.asarray(r), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(q.euclidean_translation_vector(e)).reshape(5, 3),
            np.asarray(t), atol=1e-6)
        inv = q.euclidean_inverse(e)
        prod = jnp.einsum("bij,bjk->bik", e, inv)
        np.testing.assert_allclose(np.asarray(prod),
                                   np.tile(np.eye(4), (5, 1, 1)), atol=1e-5)

    def test_partial_construction_defaults(self):
        e = q.euclidean_from_rotation_translation(t=jnp.asarray([[1., 2., 3.]]))
        np.testing.assert_allclose(np.asarray(e[0, :3, :3]), np.eye(3),
                                   atol=1e-7)
        e2 = q.euclidean_from_rotation_translation(
            r=q.rot33_identity(1))
        np.testing.assert_allclose(np.asarray(e2[0, :3, 3]), 0.0, atol=1e-7)


class TestTransformAlgebra:
    def _rand_transform(self, key, n=6):
        kq, kt = jax.random.split(key)
        rot = q.quat_unit(jax.random.normal(kq, (n, 4)))
        t = jax.random.normal(kt, (n, 3))
        return q.transform_from_rotation_translation(rotation=rot,
                                                     translation=t)

    def test_mul_associative(self, key):
        a = self._rand_transform(jax.random.fold_in(key, 0))
        b = self._rand_transform(jax.random.fold_in(key, 1))
        c = self._rand_transform(jax.random.fold_in(key, 2))
        pts = jax.random.normal(jax.random.fold_in(key, 3), (6, 3))
        lhs = q.transform_apply(q.transform_mul(q.transform_mul(a, b), c), pts)
        rhs = q.transform_apply(q.transform_mul(a, q.transform_mul(b, c)), pts)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-4)

    def test_identity_neutral(self, key):
        a = self._rand_transform(key)
        ident = q.transform_identity((6,))
        pts = jax.random.normal(jax.random.fold_in(key, 4), (6, 3))
        np.testing.assert_allclose(
            np.asarray(q.transform_apply(q.transform_mul(a, ident), pts)),
            np.asarray(q.transform_apply(a, pts)), atol=1e-5)

    def test_inverse_roundtrip_points(self, key):
        a = self._rand_transform(key)
        pts = jax.random.normal(jax.random.fold_in(key, 5), (6, 3))
        there = q.transform_apply(a, pts)
        back = q.transform_apply(q.transform_inverse(a), there)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts),
                                   atol=1e-4)

    def test_euclidean_transform_roundtrip(self, key):
        a = self._rand_transform(key)
        e = jax.vmap(lambda r, t: q.euclidean_from_rotation_translation(
            r=r[None], t=t[None])[0])(
                q.rot33_from_quat(q.transform_rotation(a)),
                q.transform_translation(a))
        back = q.transform_from_euclidean(e)
        pts = jax.random.normal(jax.random.fold_in(key, 6), (6, 3))
        np.testing.assert_allclose(
            np.asarray(q.transform_apply(back, pts)),
            np.asarray(q.transform_apply(a, pts)), atol=1e-4)

    def test_vector_normalize_zero_safe(self):
        out = q.vector_normalize(jnp.zeros((2, 3)))
        assert np.isfinite(np.asarray(out)).all()
        unit = q.vector_normalize(jnp.asarray([[3.0, 4.0, 0.0]]))
        np.testing.assert_allclose(np.asarray(unit), [[0.6, 0.8, 0.0]],
                                   atol=1e-6)
