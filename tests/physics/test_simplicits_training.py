"""Training-path tests for SimplicitsObject, mirroring the reference's
training coverage (reference tests/python/kaolin/physics/simplicits/
test_training.py): MLP training reduces the combined loss and yields usable
weight fields; rigid/function/RKPM constructors behave per spec; subsample
and bake produce consistent skinned points.

Training runs are tiny (few hundred steps, small nets) so the suite stays
fast on CPU; assertions check trends and invariants, not absolute quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.physics.simplicits.losses import compute_losses
from kaolin_tpu.physics.simplicits.network import SkinningFn
from kaolin_tpu.physics.simplicits.training import (
    PhysicsPoints,
    SimplicitsObject,
    SkinnedPhysicsPoints,
)


@pytest.fixture
def box_points():
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, size=(256, 3)), jnp.float32)
    return PhysicsPoints(pts, yms=1e4, prs=0.45, rhos=500.0, appx_vol=1.0)


class TestConstructors:
    def test_rigid_has_zero_handles(self, box_points):
        obj = SimplicitsObject.create_rigid(box_points)
        w = obj.skinning_mod(box_points.pts)
        assert w.shape == (256, 0)

    def test_num_handles_one_is_rigid(self, box_points):
        obj = SimplicitsObject.create_with_mlp(
            box_points, num_handles=1, num_samples=64, model_layers=2,
            training_num_steps=1)
        assert obj.skinning_mod(box_points.pts).shape[1] == 0

    def test_from_function(self, box_points):
        # left/right split weight field
        def w(x):
            left = (x[:, 0] < 0).astype(x.dtype)
            return jnp.stack([left, 1.0 - left], axis=1)

        obj = SimplicitsObject.create_from_function(box_points, w)
        weights = np.asarray(obj.skinning_mod(box_points.pts))
        assert weights.shape == (256, 2)
        np.testing.assert_allclose(weights.sum(1), 1.0, atol=1e-6)

    def test_create_with_rkpm_partition_of_unity_free(self, box_points):
        obj = SimplicitsObject.create_with_rkpm(
            box_points, num_handles=4, num_nodes=32)
        # raw field excludes the constant (rigid) handle: H-1 columns
        w = np.asarray(obj.skinning_mod(box_points.pts))
        assert w.shape == (256, 3)
        assert np.isfinite(w).all()
        # handles differ from each other (not a degenerate field)
        assert np.abs(w - w.mean(axis=0, keepdims=True)).max() > 1e-4


class TestMlpTraining:
    def test_loss_decreases(self, box_points):
        key = jax.random.PRNGKey(1)
        from kaolin_tpu.physics.simplicits.network import SimplicitsMLP
        pts = box_points.pts
        bb_min, bb_max = jnp.min(pts, 0), jnp.max(pts, 0)
        npts = (pts - bb_min) / (bb_max - bb_min)
        skin0 = SimplicitsMLP(3, 16, 3, 3, bb_min=bb_min, bb_max=bb_max,
                              key=key)

        def total_loss(params):
            model = SkinningFn(params=params, bb_min=bb_min, bb_max=bb_max)
            le, lo = compute_losses(model, npts, box_points.yms,
                                    box_points.prs, box_points.rhos,
                                    en_interp=0.0, batch_size=4,
                                    appx_vol=1.0, num_samples=64,
                                    le_coeff=1e-1, lo_coeff=1e6,
                                    key=jax.random.PRNGKey(7))
            return le + lo

        before = float(total_loss(skin0.params))
        obj = SimplicitsObject.create_with_mlp(
            box_points, num_handles=3, num_samples=64, model_layers=3,
            training_batch_size=4, training_num_steps=200,
            training_log_every=100, key=jax.random.PRNGKey(2))
        after = float(total_loss(obj.skinning_mod.params))
        assert after < before

    def test_trained_weights_are_smooth_and_finite(self, box_points):
        obj = SimplicitsObject.create_with_mlp(
            box_points, num_handles=2, num_samples=64, model_layers=2,
            training_batch_size=4, training_num_steps=50,
            training_log_every=50, key=jax.random.PRNGKey(3))
        w = obj.skinning_mod.compute_skinning_weights(box_points.pts)
        assert w.shape == (256, 2)  # trained column + constant rigid handle
        assert np.isfinite(np.asarray(w)).all()
        # nearby points get nearby weights (field is continuous)
        eps = 1e-3
        w2 = obj.skinning_mod.compute_skinning_weights(box_points.pts + eps)
        assert float(jnp.abs(w - w2).max()) < 0.1


class TestSubsampleAndBake:
    def test_subsample_by_indices(self, box_points):
        obj = SimplicitsObject.create_from_function(
            box_points, lambda x: x[:, :2])
        idx = np.asarray([3, 10, 42])
        sub = obj.subsample(sample_indices=idx)
        assert len(sub) == 3
        np.testing.assert_allclose(np.asarray(sub.pts),
                                   np.asarray(box_points.pts)[idx])

    def test_bake_matches_direct_evaluation(self, box_points):
        obj = SimplicitsObject.create_from_function(
            box_points, lambda x: jnp.stack(
                [x[:, 0] ** 2, jnp.sin(x[:, 1])], axis=1))
        idx = np.arange(0, 256, 4)
        baked = obj.bake(sampling_indices=idx)
        assert isinstance(baked, SkinnedPhysicsPoints)
        # baked weights append the constant rigid handle column
        expect_w = np.concatenate(
            [np.asarray(obj.skinning_mod(box_points.pts[idx])),
             np.ones((len(idx), 1), np.float32)], axis=1)
        np.testing.assert_allclose(np.asarray(baked.skinning_weights),
                                   expect_w, atol=1e-6)
        # dwdx must match autodiff of the weight field (constant handle has
        # zero gradient)
        def wfn(p):
            return jnp.stack([p[0] ** 2, jnp.sin(p[1])])
        jac = np.asarray(jax.vmap(jax.jacobian(wfn))(box_points.pts[idx]))
        expect_j = np.concatenate([jac, np.zeros((len(idx), 1, 3), jac.dtype)],
                                  axis=1)
        np.testing.assert_allclose(np.asarray(baked.dwdx), expect_j,
                                   atol=1e-4)

    def test_bake_requires_sampling_spec(self, box_points):
        obj = SimplicitsObject.create_rigid(box_points)
        with pytest.raises(ValueError):
            obj.bake()

    def test_bake_for_rendering(self, box_points):
        obj = SimplicitsObject.create_from_function(
            box_points, lambda x: x[:, :1])
        render_pts = box_points.pts[:10] * 0.5
        skinned = obj.bake_for_rendering(render_pts)
        expect = np.concatenate(
            [np.asarray(obj.skinning_mod(render_pts)),
             np.ones((10, 1), np.float32)], axis=1)
        np.testing.assert_allclose(np.asarray(skinned.skinning_weights),
                                   expect, atol=1e-6)
