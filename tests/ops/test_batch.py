import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops import batch


@pytest.fixture
def tensor_list():
    rng = np.random.RandomState(0)
    return [jnp.asarray(rng.randn(n, 3).astype(np.float32)) for n in (4, 7, 2)]


def test_list_to_packed_roundtrip(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)
    assert packed.shape == (13, 3)
    assert spt.tolist() == [[4], [7], [2]]
    fi = batch.get_first_idx(spt[:, 0])
    assert fi.tolist() == [0, 4, 11, 13]
    out = batch.packed_to_list(packed, spt, fi)
    for a, b in zip(out, tensor_list):
        np.testing.assert_allclose(a, b)


def test_list_to_padded_roundtrip(tensor_list):
    padded, spt = batch.list_to_padded(tensor_list, padding_value=-1.0)
    assert padded.shape == (3, 7, 3)
    assert np.all(np.asarray(padded[0, 4:]) == -1.0)
    out = batch.padded_to_list(padded, spt)
    for a, b in zip(out, tensor_list):
        np.testing.assert_allclose(a, b)


def test_packed_to_padded_and_back(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)
    fi = batch.get_first_idx(spt[:, 0])
    padded = batch.packed_to_padded(packed, spt, fi, 0.0)
    assert padded.shape == (3, 7, 3)
    np.testing.assert_allclose(padded[1, :7], tensor_list[1])
    assert np.all(np.asarray(padded[2, 2:]) == 0.0)
    packed2 = batch.padded_to_packed(padded, spt)
    np.testing.assert_allclose(packed2, packed)


def test_tile_to_packed():
    values = jnp.asarray([10.0, 20.0])
    numel = np.array([2, 3])
    out = batch.tile_to_packed(values, numel)
    np.testing.assert_allclose(out[:, 0], [10, 10, 20, 20, 20])


def test_packed_simple_sum(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)
    sums = batch.packed_simple_sum(packed, spt[:, 0])
    expected = [float(np.sum(np.asarray(t))) for t in tensor_list]
    np.testing.assert_allclose(sums, expected, rtol=1e-5)


def test_packed_simple_sum_grad(tensor_list):
    packed, spt = batch.list_to_packed(tensor_list)

    def loss(p):
        return jnp.sum(batch.packed_simple_sum(p, spt[:, 0]) ** 2)

    g = jax.grad(loss)(packed)
    assert g.shape == packed.shape
    sums = np.asarray(batch.packed_simple_sum(packed, spt[:, 0]))
    np.testing.assert_allclose(np.asarray(g)[0], 2 * sums[0] * np.ones(3), rtol=1e-5)
