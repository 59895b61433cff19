"""Test helpers — shape/dtype asserts, seeding, image comparison.

TPU-native analog of the reference's ``kaolin/utils/testing.py`` (check_tensor
:73, with_seed :54, assert_images_close :482, contained_torch_equal :311).
"""

import contextlib
import functools
import random

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "check_tensor",
    "check_packed_tensor",
    "check_padded_tensor",
    "check_spc_octrees",
    "seed_everything",
    "with_seed",
    "assert_images_close",
    "contained_allclose",
    "tensor_info",
]


def check_tensor(tensor, shape=None, dtype=None, throw=True):
    """Check a jax array's shape (None entries are wildcards) and dtype.

    Mirrors reference ``utils/testing.py:73`` semantics minus device checks
    (JAX arrays are committed to the default device under jit).
    """
    if shape is not None:
        if len(shape) != tensor.ndim:
            if throw:
                raise ValueError(f"tensor rank {tensor.ndim} != expected {len(shape)}")
            return False
        for want, got in zip(shape, tensor.shape):
            if want is not None and want != got:
                if throw:
                    raise ValueError(f"tensor shape {tensor.shape} != expected {tuple(shape)}")
                return False
    if dtype is not None and tensor.dtype != jnp.dtype(dtype):
        if throw:
            raise TypeError(f"tensor dtype {tensor.dtype} != expected {dtype}")
        return False
    return True


def check_packed_tensor(tensor, total_numel=None, last_dim=None, dtype=None, throw=True):
    """Packed tensors are 2D: (total_numel, last_dim). Ref :130."""
    if tensor.ndim != 2:
        if throw:
            raise ValueError(f"packed tensor must be 2D, got {tensor.ndim}D")
        return False
    shape = [total_numel, last_dim]
    return check_tensor(tensor, shape=shape, dtype=dtype, throw=throw)


def check_padded_tensor(tensor, padding_value=None, shape_per_tensor=None,
                        batch_size=None, max_shape=None, last_dim=None,
                        dtype=None, throw=True):
    """Padded tensors are (B, *max_shape, last_dim); entries beyond
    shape_per_tensor must equal padding_value. Ref :168."""
    if batch_size is not None and tensor.shape[0] != batch_size:
        if throw:
            raise ValueError(f"batch size {tensor.shape[0]} != {batch_size}")
        return False
    if last_dim is not None and tensor.shape[-1] != last_dim:
        if throw:
            raise ValueError(f"last dim {tensor.shape[-1]} != {last_dim}")
        return False
    if max_shape is not None:
        for want, got in zip(max_shape, tensor.shape[1:-1]):
            if want is not None and want != got:
                if throw:
                    raise ValueError(f"max_shape {tensor.shape[1:-1]} != {max_shape}")
                return False
    if not check_tensor(tensor, dtype=dtype, throw=throw):
        return False
    if padding_value is not None and shape_per_tensor is not None:
        spt = np.asarray(shape_per_tensor)
        arr = np.asarray(tensor)
        for i in range(arr.shape[0]):
            sub = arr[i]
            mask = np.ones(sub.shape[:-1], dtype=bool)
            mask[tuple(slice(0, int(s)) for s in spt[i])] = False
            if mask.any() and not np.allclose(sub[mask], padding_value):
                if throw:
                    raise ValueError("padding values do not match")
                return False
    return True


def check_spc_octrees(octrees, lengths, batch_size=None, level=None, throw=True):
    """Validate a batch of byte-packed octrees (ref :236)."""
    if octrees.dtype != jnp.uint8:
        if throw:
            raise TypeError("octrees must be uint8")
        return False
    if batch_size is not None and lengths.shape[0] != batch_size:
        if throw:
            raise ValueError("lengths batch size mismatch")
        return False
    if int(np.sum(np.asarray(lengths))) != octrees.shape[0]:
        if throw:
            raise ValueError("octree length mismatch")
        return False
    return True


def seed_everything(seed):
    random.seed(seed)
    np.random.seed(seed % (2 ** 32))
    return jax.random.PRNGKey(seed)


def with_seed(seed=0):
    """Decorator seeding python/numpy RNGs and passing ``key=PRNGKey(seed)``
    if the wrapped test accepts it. Ref ``with_seed`` :54."""
    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            seed_everything(seed)
            return fn(*args, **kwargs)
        return wrapper
    return decorator


def assert_images_close(img1, img2, pixel_disagreement_threshold=0.05,
                        max_percent_disagreeing_pixels=1.0):
    """Images match if < N% of pixels disagree by more than the threshold.

    Semantics of reference ``assert_images_close`` (:482): tolerant pixelwise
    comparison suited to rasterized images where edge pixels may flip.
    """
    a = np.asarray(img1, dtype=np.float32)
    b = np.asarray(img2, dtype=np.float32)
    assert a.shape == b.shape, f"image shapes differ: {a.shape} vs {b.shape}"
    diff = np.abs(a - b)
    if diff.ndim == 3:
        diff = diff.max(axis=-1)
    percent = 100.0 * np.mean(diff > pixel_disagreement_threshold)
    assert percent <= max_percent_disagreeing_pixels, (
        f"{percent:.3f}% of pixels disagree (> {max_percent_disagreeing_pixels}%)")


def contained_allclose(a, b, rtol=1e-5, atol=1e-8):
    """Recursive pytree/dict/list comparison (ref contained_torch_equal :311)."""
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(
            contained_allclose(a[k], b[k], rtol, atol) for k in a)
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(
            contained_allclose(x, y, rtol, atol) for x, y in zip(a, b))
    if a is None or b is None:
        return a is b
    if isinstance(a, (str, bool)) or isinstance(b, (str, bool)):
        return a == b
    try:
        return np.allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)
    except Exception:
        return a == b


def tensor_info(t, name="tensor"):
    t = np.asarray(t)
    return (f"{name}: shape={t.shape} dtype={t.dtype} "
            f"min={t.min() if t.size else 'NA'} max={t.max() if t.size else 'NA'}")
