import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.math import quat as q


@pytest.fixture
def rand_quats(key):
    raw = jax.random.normal(key, (16, 4))
    return q.quat_unit(raw)


def test_identity_and_mul(rand_quats):
    ident = q.quat_identity((16,))
    np.testing.assert_allclose(q.quat_mul(ident, rand_quats), rand_quats, atol=1e-6)
    np.testing.assert_allclose(q.quat_mul(rand_quats, ident), rand_quats, atol=1e-6)


def test_inverse(rand_quats):
    inv = q.quat_inverse(rand_quats)
    prod = q.quat_mul(rand_quats, inv)
    np.testing.assert_allclose(prod, q.quat_identity((16,)), atol=1e-5)


def test_rotate_matches_matrix(rand_quats, key):
    pts = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    r = q.rot33_from_quat(rand_quats)
    got = q.quat_rotate(rand_quats, pts)
    want = jnp.einsum("bij,bj->bi", r, pts)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rot33_quat_roundtrip(rand_quats):
    r = q.rot33_from_quat(rand_quats)
    q2 = q.quat_from_rot33(r)
    expect = q.quat_positive(rand_quats)
    np.testing.assert_allclose(q2, expect, atol=1e-4)


def test_angle_axis_roundtrip(key):
    angle = jax.random.uniform(key, (8, 1), minval=0.1, maxval=3.0)
    axis = q.vector_normalize(jax.random.normal(jax.random.fold_in(key, 1), (8, 3)))
    quat = q.quat_from_angle_axis(angle, axis)
    angle2, axis2 = q.angle_axis_from_quat(quat)
    np.testing.assert_allclose(angle2, angle, atol=1e-4)
    np.testing.assert_allclose(axis2, axis, atol=1e-4)


def test_rot33_from_angle_axis_matches_quat(key):
    angle = jax.random.uniform(key, (8, 1), minval=0.1, maxval=3.0)
    axis = q.vector_normalize(jax.random.normal(jax.random.fold_in(key, 1), (8, 3)))
    r1 = q.rot33_from_angle_axis(angle, axis)
    r2 = q.rot33_from_quat(q.quat_from_angle_axis(angle, axis))
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_transform_compose_apply(key):
    k1, k2, k3 = jax.random.split(key, 3)
    t1 = q.transform_from_rotation_translation(
        q.quat_unit(jax.random.normal(k1, (4, 4))), jax.random.normal(k2, (4, 3)))
    t2 = q.transform_from_rotation_translation(
        q.quat_unit(jax.random.normal(k3, (4, 4))),
        jax.random.normal(jax.random.fold_in(k3, 1), (4, 3)))
    pts = jax.random.normal(jax.random.fold_in(key, 7), (4, 3))
    got = q.transform_apply(q.transform_mul(t1, t2), pts)
    want = q.transform_apply(t1, q.transform_apply(t2, pts))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # inverse
    inv = q.transform_inverse(t1)
    back = q.transform_apply(inv, q.transform_apply(t1, pts))
    np.testing.assert_allclose(back, pts, atol=1e-5)


def test_euclidean_inverse(key):
    quat = q.quat_unit(jax.random.normal(key, (4, 4)))
    r = q.rot33_from_quat(quat)
    t = jax.random.normal(jax.random.fold_in(key, 1), (4, 3))
    m = q.euclidean_from_rotation_translation(r, t)
    minv = q.euclidean_inverse(m)
    np.testing.assert_allclose(jnp.matmul(m, minv),
                               q.euclidean_identity(4), atol=1e-5)
