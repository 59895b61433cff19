"""Simplicits training-loss parity vs the reference (pure torch CPU).

Copies identical MLP weights into both frameworks and compares
skinning-weight forwards, loss_ortho, and loss_elastic on the same inputs.
Ref physics/simplicits/losses.py:33,45 + network.py:28,116.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from tests.reference_shim import import_reference_kaolin

ref = import_reference_kaolin()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")


def _paired_mlps(layer_width=16, num_handles=4, num_layers=2, seed=0):
    """A reference SimplicitsMLP and our SkinningFn with IDENTICAL weights."""
    from kaolin_tpu.physics.simplicits.network import SkinningFn

    torch.manual_seed(seed)
    theirs = ref.physics.simplicits.network.SimplicitsMLP(
        3, layer_width, num_handles, num_layers)
    params = []
    for mod in theirs.linear_elu_stack:
        if isinstance(mod, torch.nn.Linear):
            params.append({
                "w": jnp.asarray(mod.weight.detach().numpy().T.copy()),
                "b": jnp.asarray(mod.bias.detach().numpy().copy()),
            })
    ours = SkinningFn(params=params)
    return theirs, ours


def test_mlp_forward_parity():
    theirs, ours = _paired_mlps()
    rng = np.random.RandomState(1)
    pts = rng.rand(20, 3).astype(np.float32)
    want = theirs(torch.as_tensor(pts)).detach().numpy()
    got = np.asarray(ours(jnp.asarray(pts)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_skinning_weights_parity():
    theirs, ours = _paired_mlps()
    rng = np.random.RandomState(2)
    pts = rng.rand(15, 3).astype(np.float32)
    want = theirs.compute_skinning_weights(torch.as_tensor(pts))
    got = np.asarray(ours.compute_skinning_weights(jnp.asarray(pts)))
    np.testing.assert_allclose(got, want.detach().numpy(), atol=1e-5)
    # constant handle appended last
    np.testing.assert_allclose(got[:, -1], 1.0)


def test_loss_ortho_parity():
    from kaolin_tpu.physics.simplicits.losses import loss_ortho
    rng = np.random.RandomState(3)
    w = rng.rand(30, 6).astype(np.float32)
    want = float(ref.physics.simplicits.losses.loss_ortho(torch.as_tensor(w)))
    got = float(loss_ortho(jnp.asarray(w)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("interp_step", [0.1, 1.0])
def test_loss_elastic_parity(interp_step):
    from kaolin_tpu.physics.simplicits.losses import loss_elastic
    theirs_model, ours_model = _paired_mlps()
    rng = np.random.RandomState(4)
    n = 25
    pts = rng.rand(n, 3).astype(np.float32)
    yms = np.full((n,), 1e4, np.float32)
    prs = np.full((n,), 0.45, np.float32)
    rhos = np.full((n,), 500.0, np.float32)
    # transforms cover the LEARNED handles only (num_handles - 1)
    tfms = (rng.rand(2, 3, 3, 4) * 0.02).astype(np.float32)
    # the reference expects per-point material columns (N, 1)
    want = float(ref.physics.simplicits.losses.loss_elastic(
        theirs_model, torch.as_tensor(pts), torch.as_tensor(yms[:, None]),
        torch.as_tensor(prs[:, None]), torch.as_tensor(rhos[:, None]),
        torch.as_tensor(tfms), 1.0, interp_step))
    got = float(loss_elastic(
        ours_model, jnp.asarray(pts), jnp.asarray(yms), jnp.asarray(prs),
        jnp.asarray(rhos), jnp.asarray(tfms), 1.0, interp_step))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-5)
