"""Batched-tensor conventions: list / packed / padded.

TPU-native analog of reference ``kaolin/ops/batch.py:37-360``. Three batching
layouts for heterogeneous 3D data (meshes with different vertex counts, rays
with different sample counts):

* **list** — a Python list of per-item arrays (host-side convenience only;
  never crosses into jit).
* **packed** — one 2D array ``(total_numel, last_dim)`` concatenating all
  items along dim 0, plus host-side metadata ``shape_per_tensor`` (numpy,
  static) and ``first_idx``. On TPU, reductions over packed tensors use
  ``segment_ids`` + ``jax.ops.segment_sum`` instead of the reference's custom
  CUDA kernels (``csrc/ops/packed_simple_sum*``, ``tile_to_packed*``).
* **padded** — dense ``(B, *max_shape, last_dim)`` with a padding value.
  This is the preferred TPU layout: static shapes, MXU-friendly.

Metadata (shape_per_tensor / first_idx) is kept as **numpy** arrays: it
determines trace-time shapes, so it must be host-static — a deliberate
departure from the reference where they are torch tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_shape_per_tensor",
    "get_first_idx",
    "list_to_packed",
    "packed_to_list",
    "list_to_padded",
    "padded_to_list",
    "packed_to_padded",
    "padded_to_packed",
    "tile_to_packed",
    "fill_max_shape",
    "packed_segment_ids",
    "packed_simple_sum",
]


def get_shape_per_tensor(tensor_list):
    """Stack the shapes (minus last dim) of each item. Ref :37."""
    if len(tensor_list) == 0:
        raise ValueError("empty tensor list")
    ndim = tensor_list[0].ndim
    for t in tensor_list:
        if t.ndim != ndim:
            raise ValueError("all tensors must have the same rank")
    return np.array([t.shape[:-1] for t in tensor_list], dtype=np.int64)


def get_first_idx(numel_per_tensor):
    """Exclusive cumsum with leading 0: start offset of each subtensor plus
    total at the end — shape (B + 1,). Ref :120.

    Example:
        >>> get_first_idx([2, 3, 1]).tolist()
        [0, 2, 5, 6]
    """
    numel = np.asarray(numel_per_tensor, dtype=np.int64)
    out = np.zeros(numel.shape[0] + 1, dtype=np.int64)
    np.cumsum(numel, out=out[1:])
    return out


def list_to_packed(tensor_list):
    """Concatenate a list of (..., last_dim) arrays into a packed 2D array.

    Returns (packed_tensor, shape_per_tensor). Ref :72.

    Example:
        >>> import jax.numpy as jnp
        >>> a = jnp.asarray([[0., 1.], [2., 3.]])
        >>> b = jnp.asarray([[4., 5.]])
        >>> packed, spt = list_to_packed([a, b])
        >>> print(packed)
        [[0. 1.]
         [2. 3.]
         [4. 5.]]
        >>> spt.tolist()
        [[2], [1]]
    """
    shape_per_tensor = get_shape_per_tensor(tensor_list)
    last_dim = tensor_list[0].shape[-1]
    for t in tensor_list:
        if t.shape[-1] != last_dim:
            raise ValueError("all tensors must share last_dim")
    packed = jnp.concatenate(
        [jnp.reshape(jnp.asarray(t), (-1, last_dim)) for t in tensor_list], axis=0)
    return packed, shape_per_tensor


def packed_to_list(packed_tensor, shape_per_tensor, first_idx):
    """Split a packed tensor back into a list (host-side). Ref :179."""
    spt = np.asarray(shape_per_tensor)
    fi = np.asarray(first_idx)
    out = []
    for i in range(spt.shape[0]):
        sub = packed_tensor[int(fi[i]):int(fi[i + 1])]
        out.append(jnp.reshape(sub, tuple(int(s) for s in spt[i]) + (packed_tensor.shape[-1],)))
    return out


def fill_max_shape(shape_per_tensor, partial_max_shape=None):
    """Fill None entries of a partial max shape with per-dim maxima. Ref :215."""
    spt = np.asarray(shape_per_tensor)
    maxima = spt.max(axis=0)
    if partial_max_shape is None:
        return tuple(int(m) for m in maxima)
    out = []
    for i, v in enumerate(partial_max_shape):
        if v is None:
            out.append(int(maxima[i]))
        else:
            if v < maxima[i]:
                raise ValueError(f"max_shape[{i}]={v} < required {maxima[i]}")
            out.append(int(v))
    return tuple(out)


def list_to_padded(tensor_list, padding_value, max_shape=None):
    """Stack a list into a dense padded batch (B, *max_shape, last_dim). Ref :254.

    Example:
        >>> import jax.numpy as jnp
        >>> padded, spt = list_to_padded([jnp.ones((2, 2)), jnp.ones((1, 2))],
        ...                              padding_value=-1.0)
        >>> print(padded[1])
        [[ 1.  1.]
         [-1. -1.]]
    """
    shape_per_tensor = get_shape_per_tensor(tensor_list)
    max_shape = fill_max_shape(shape_per_tensor, max_shape)
    last_dim = tensor_list[0].shape[-1]
    padded = []
    for t in tensor_list:
        t = jnp.asarray(t)
        pads = [(0, m - s) for m, s in zip(max_shape, t.shape[:-1])] + [(0, 0)]
        padded.append(jnp.pad(t, pads, constant_values=padding_value))
    return jnp.stack(padded, axis=0), shape_per_tensor


def padded_to_list(padded_tensor, shape_per_tensor):
    """Slice a padded batch back into a list (host-side). Ref :306."""
    spt = np.asarray(shape_per_tensor)
    out = []
    for i in range(spt.shape[0]):
        idx = (i,) + tuple(slice(0, int(s)) for s in spt[i])
        out.append(padded_tensor[idx])
    return out


def packed_to_padded(packed_tensor, shape_per_tensor, first_idx,
                     padding_value, max_shape=None):
    """Packed → padded. Only 1D-item packs (B items of (N_i, last_dim)) take
    the fast vectorized gather path; general ranks go via list. Ref :332."""
    spt = np.asarray(shape_per_tensor)
    if spt.shape[1] == 1:
        fi = np.asarray(first_idx)
        max_n = fill_max_shape(spt, max_shape)[0]
        B = spt.shape[0]
        # gather indices (B, max_n) with mask
        base = fi[:-1, None] + np.arange(max_n)[None, :]
        mask = np.arange(max_n)[None, :] < spt[:, 0:1]
        safe = np.where(mask, base, 0)
        gathered = packed_tensor[jnp.asarray(safe).reshape(-1)]
        gathered = gathered.reshape(B, max_n, packed_tensor.shape[-1])
        return jnp.where(jnp.asarray(mask)[..., None], gathered,
                         jnp.asarray(padding_value, dtype=packed_tensor.dtype))
    tensor_list = packed_to_list(packed_tensor, shape_per_tensor, first_idx)
    return list_to_padded(tensor_list, padding_value, max_shape)[0]


def padded_to_packed(padded_tensor, shape_per_tensor):
    """Padded → packed (1D-item packs). Ref :360."""
    spt = np.asarray(shape_per_tensor)
    if spt.shape[1] != 1:
        parts = padded_to_list(padded_tensor, shape_per_tensor)
        return list_to_packed(parts)[0]
    last_dim = padded_tensor.shape[-1]
    max_n = padded_tensor.shape[1]
    fi = get_first_idx(spt[:, 0])
    idx_b, idx_n = [], []
    for i in range(spt.shape[0]):
        n = int(spt[i, 0])
        idx_b.append(np.full(n, i))
        idx_n.append(np.arange(n))
    idx_b = jnp.asarray(np.concatenate(idx_b))
    idx_n = jnp.asarray(np.concatenate(idx_n))
    return padded_tensor[idx_b, idx_n].reshape(-1, last_dim)


def packed_segment_ids(shape_per_tensor, total=None):
    """Segment id per packed row — the TPU replacement for per-pack CUDA
    reductions (ref ``csrc/ops/packed_simple_sum``). Host-static numpy in,
    device array out."""
    spt = np.asarray(shape_per_tensor)
    numel = spt.prod(axis=1) if spt.ndim == 2 else spt
    ids = np.repeat(np.arange(numel.shape[0]), numel)
    if total is not None and total > ids.shape[0]:
        ids = np.concatenate([ids, np.full(total - ids.shape[0], numel.shape[0])])
    return jnp.asarray(ids, dtype=jnp.int32)


def tile_to_packed(values, numel_per_tensor):
    """Broadcast one scalar per item to every packed row of that item.
    Ref :144 (CUDA kernel ``csrc/ops/tile_to_packed_cuda.cu``); here a gather.
    """
    numel = np.asarray(numel_per_tensor)
    ids = jnp.asarray(np.repeat(np.arange(numel.shape[0]), numel))
    return jnp.reshape(values[ids], (-1, 1))


def packed_simple_sum(packed_tensor, numel_per_tensor):
    """Per-item sum over a packed tensor → (B,). Differentiable via
    segment_sum (replaces ``csrc/ops/packed_simple_sum_cuda.cu`` and the
    autograd wrapper ``ops/reduction.py:19``)."""
    numel = np.asarray(numel_per_tensor)
    ids = jnp.asarray(np.repeat(np.arange(numel.shape[0]), numel))
    flat = jnp.sum(packed_tensor, axis=-1) if packed_tensor.ndim == 2 else packed_tensor
    return jax.ops.segment_sum(flat, ids, num_segments=numel.shape[0])
