"""Graph convolution (Kipf & Welling style). Ref ``kaolin/ops/gcn.py``
(sparse_bmm :24, normalize_adj :48, GraphConv :80).

Sparse adjacency is represented as a COO pair ``(indices (2, nnz), values
(nnz,))`` plus a shape; matmul uses segment_sum (gather → multiply →
scatter-reduce), which XLA lowers well on TPU. Dense adjacency also works
(lands on the MXU).
"""

import jax
import jax.numpy as jnp

__all__ = ["sparse_bmm", "normalize_adj", "GraphConv"]


def _is_coo(adj):
    return isinstance(adj, tuple) and len(adj) == 3


def sparse_bmm(sparse_matrix, dense_matrix_batch):
    """(M, N) sparse COO ``(indices, values, (M, N))`` @ (B, N, P) → (B, M, P).
    Ref :24."""
    indices, values, shape = sparse_matrix
    m = shape[0]
    rows, cols = indices[0], indices[1]

    def one(dense):
        gathered = dense[cols] * values[:, None]
        return jax.ops.segment_sum(gathered, rows, num_segments=m)

    return jax.vmap(one)(dense_matrix_batch)


def normalize_adj(adj):
    """Row-normalize an adjacency matrix (dense array or COO tuple). Ref :48."""
    if _is_coo(adj):
        indices, values, shape = adj
        rows = indices[0]
        norm = jax.ops.segment_sum(values, rows, num_segments=shape[0])
        return indices, values / norm[rows], shape
    norm = jnp.sum(adj, axis=-1, keepdims=True)
    return adj / norm


class GraphConv:
    """Functional graph-convolution layer: ``AHW (+ HW_self)``. Ref :80.

    Parameters live in an explicit dict (``init(key)``) and are passed to
    ``apply`` — idiomatic functional JAX rather than an nn.Module.
    """

    def __init__(self, input_dim, output_dim, self_layer=True, bias=True):
        self.input_dim = input_dim
        self.output_dim = output_dim
        self.self_layer = self_layer
        self.bias = bias

    def init(self, key, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        scale = 1.0 / jnp.sqrt(self.input_dim)
        params = {
            "w": jax.random.uniform(k1, (self.input_dim, self.output_dim),
                                    minval=-scale, maxval=scale, dtype=dtype),
        }
        if self.bias:
            params["b"] = jnp.zeros((self.output_dim,), dtype=dtype)
        if self.self_layer:
            params["w_self"] = jax.random.uniform(
                k2, (self.input_dim, self.output_dim),
                minval=-scale, maxval=scale, dtype=dtype)
            if self.bias:
                params["b_self"] = jnp.zeros((self.output_dim,), dtype=dtype)
        return params

    def apply(self, params, node_feat, adj, normalize_adj_flag=True):
        if normalize_adj_flag:
            adj = normalize_adj(adj)
        h = jnp.einsum("bnd,do->bno", node_feat, params["w"])
        if "b" in params:
            h = h + params["b"]
        out = sparse_bmm(adj, h) if _is_coo(adj) else jnp.einsum("mn,bno->bmo", adj, h)
        if self.self_layer:
            hs = jnp.einsum("bnd,do->bno", node_feat, params["w_self"])
            if "b_self" in params:
                hs = hs + params["b_self"]
            out = out + hs
        return out

    __call__ = apply
