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


def check_allclose(tensor, other, rtol=1e-5, atol=1e-8, equal_nan=False):
    """Raise with example diffs if not allclose. Ref ``testing.py:411``."""
    a = np.asarray(tensor)
    b = np.asarray(other)
    if not np.allclose(a, b, atol=atol, rtol=rtol, equal_nan=equal_nan):
        diff_idx = np.where(~np.isclose(a, b, atol=atol, rtol=rtol,
                                        equal_nan=equal_nan))
        raise ValueError(
            f"Tensors are not close on indices {diff_idx}: "
            f"Example values: {a[diff_idx][:10]} vs {b[diff_idx][:10]}.")


def contained_torch_equal(elem, other, approximate=False,
                          print_error_context=None, **allclose_args):
    """Deep equality (or allclose) of containers possibly holding arrays.
    Ref ``testing.py:311`` (name kept for API parity; works on any
    numpy/jax arrays)."""
    from collections.abc import Mapping, Sequence

    def _fail(ctx):
        if print_error_context is not None:
            print(f"Mismatch at {print_error_context}.{ctx}")
        return False

    if type(elem).__name__ != type(other).__name__ \
            and not (hasattr(elem, "shape") and hasattr(other, "shape")):
        return _fail(f"type {type(elem)} vs {type(other)}")
    if hasattr(elem, "shape") or hasattr(other, "shape"):
        a = np.asarray(elem)
        b = np.asarray(other)
        if a.shape != b.shape:
            return _fail(f"shape {a.shape} vs {b.shape}")
        if approximate:
            return bool(np.allclose(a, b, **allclose_args)) or _fail("values")
        return bool(np.array_equal(a, b)) or _fail("values")
    if isinstance(elem, str):
        return elem == other or _fail("str")
    if isinstance(elem, Mapping):
        if set(elem.keys()) != set(other.keys()):
            return _fail("keys")
        return all(contained_torch_equal(elem[k], other[k], approximate,
                                         print_error_context, **allclose_args)
                   for k in elem)
    if isinstance(elem, Sequence):
        if len(elem) != len(other):
            return _fail("length")
        return all(contained_torch_equal(a, b, approximate,
                                         print_error_context, **allclose_args)
                   for a, b in zip(elem, other))
    if approximate and isinstance(elem, float):
        return bool(np.isclose(elem, other, **allclose_args))
    return elem == other or _fail("value")


# array-native alias
contained_equal = contained_torch_equal


def check_tensor_attribute_shapes(container, throw=True, **attribute_info):
    """Check shapes of named attributes of a container. Ref :417."""
    from collections.abc import Mapping
    result = True
    for k, shape in attribute_info.items():
        value = container[k] if isinstance(container, Mapping) \
            else getattr(container, k)
        if not check_tensor(value, shape=shape, throw=False):
            result = False
            msg = f"attribute {k} failed shape check {shape}, " \
                  f"got {tuple(np.asarray(value).shape)}"
            if throw:
                raise ValueError(msg)
            print(msg)
    return result


def file_contents_equal(file1, file2, exclude_pattern=None):
    """Line-wise file comparison ignoring blank lines (and lines matching
    exclude_pattern). Ref :398."""
    def _get_lines(fname):
        lines = [x.strip() for x in open(fname).readlines()
                 if len(x.strip()) > 0]
        if exclude_pattern is not None:
            lines = [x for x in lines if exclude_pattern not in x]
        return lines
    return _get_lines(file1) == _get_lines(file2)


def print_dict_attributes(in_dict, name="", prefix="", **tensor_info_kwargs):
    """Print all attributes of a dict, with tensor details. Ref :452."""
    from kaolin_tpu.utils.log import tensor_info
    if name:
        print(f"Attributes of {name}:")
    for k, v in in_dict.items():
        if hasattr(v, "shape"):
            print(f"  {prefix}{tensor_info(v, name=k, **tensor_info_kwargs)}")
        else:
            print(f"  {prefix}{k}: ({type(v).__name__}) {v}")


def print_namedtuple_attributes(ntuple, name="", prefix="",
                                **tensor_info_kwargs):
    """Ref :447."""
    print_dict_attributes(ntuple._asdict(), name=name, prefix=prefix,
                          **tensor_info_kwargs)
