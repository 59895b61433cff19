"""Sparse octree convolutions (SPC Conv3d / ConvTranspose3d).

TPU-native analog of reference ``kaolin/ops/spc/convolution.py`` (conv3d :69,
Conv3d :145, conv_transpose3d, ConvTranspose3d :369), backed there by
``csrc/ops/spc/convolution_cuda.cu``/``minkowski_conv.cu``.

Design: the neighborhood map n(i, k) (output point i, kernel vector k →
input point index or −1) depends only on octree topology, so it is built
host-side once per (level, jump, kernel) via morton binary search; the
convolution itself is a masked gather + one einsum on the MXU:
``Y = Σ_k X[n(:,k)] @ W_k``. The transpose uses the exact adjoint
(segment-sum scatter over the same map), so ⟨conv(X), Y⟩ = ⟨X, convᵀ(Y)⟩
holds to float precision. 1x1 kernels shortcut to a matmul (ref :133).
"""

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.spc.points import points_to_morton
from kaolin_tpu.ops.spc.spc import unbatched_get_level_points

__all__ = ["conv3d", "conv_transpose3d", "Conv3d", "ConvTranspose3d"]


def _neighbor_map(point_hierarchies, pyramids, in_level, out_level,
                  kernel_vectors):
    """(Nout, K) indices into the in_level point list (−1 = missing)."""
    pyramid = np.asarray(pyramids)[0]
    in_pts = np.asarray(unbatched_get_level_points(point_hierarchies, pyramid,
                                                   in_level)).astype(np.int64)
    out_pts = np.asarray(unbatched_get_level_points(point_hierarchies, pyramid,
                                                    out_level)).astype(np.int64)
    kv = np.asarray(kernel_vectors).astype(np.int64)
    jump = in_level - out_level
    in_morton = np.asarray(points_to_morton(in_pts))
    res = 2 ** in_level
    # output coords scaled to input level, plus kernel offsets
    targets = (out_pts[:, None, :] << jump) + kv[None]  # (Nout, K, 3)
    in_range = np.all((targets >= 0) & (targets < res), axis=-1)
    t_morton = np.asarray(points_to_morton(targets.reshape(-1, 3))).reshape(
        targets.shape[:2])
    pos = np.searchsorted(in_morton, t_morton)
    pos_c = np.clip(pos, 0, in_morton.shape[0] - 1)
    found = (in_morton[pos_c] == t_morton) & in_range
    return np.where(found, pos_c, -1), in_pts.shape[0], out_pts.shape[0]


def conv3d(octrees, point_hierarchies, level, pyramids, exsum, input,
           weight, kernel_vectors, jump=0, bias=None, **kwargs):
    """Y_i = Σ_k w_k · X_{n(i,k)} (+ b); downsamples by ``jump`` levels.
    Returns (outputs, out_level). Ref :69."""
    del octrees, exsum  # topology comes from the point hierarchy
    weight = jnp.asarray(weight)
    if weight.shape[0] == 1 and jump == 0:
        out = input @ weight[0]
    else:
        out_level = level - jump
        nmap, n_in, n_out = _neighbor_map(point_hierarchies, pyramids, level,
                                          out_level, kernel_vectors)
        nmap_j = jnp.asarray(nmap)
        safe = jnp.clip(nmap_j, 0, None)
        gathered = input[safe] * (nmap_j >= 0)[..., None]  # (Nout, K, Cin)
        out = jnp.einsum("nki,kio->no", gathered, weight)
        level = out_level
    if bias is not None:
        out = out + bias[None]
    return out, int(level)


def conv_transpose3d(octrees, point_hierarchies, level, pyramids, exsum,
                     input, weight, kernel_vectors, jump=0, bias=None,
                     **kwargs):
    """Adjoint of :func:`conv3d`: upsamples by ``jump`` levels. Returns
    (outputs, out_level). Ref :254."""
    del octrees, exsum
    weight = jnp.asarray(weight)
    if weight.shape[0] == 1 and jump == 0:
        out = input @ weight[0]
    else:
        out_level = level + jump
        # the adjoint of conv(in=out_level → out=level)
        nmap, n_fine, n_coarse = _neighbor_map(
            point_hierarchies, pyramids, out_level, level, kernel_vectors)
        nmap_j = jnp.asarray(nmap)  # (Ncoarse, K) → fine indices
        contrib = jnp.einsum("ni,kio->nko", input, weight)  # (Ncoarse, K, Cout)
        flat_idx = jnp.where(nmap_j >= 0, nmap_j, n_fine).reshape(-1)
        out = jax.ops.segment_sum(
            contrib.reshape(-1, contrib.shape[-1]), flat_idx,
            num_segments=n_fine + 1)[:n_fine]
        level = out_level
    if bias is not None:
        out = out + bias[None]
    return out, int(level)


class _ConvBase:
    def __init__(self, in_channels, out_channels, kernel_vectors, jump=0,
                 bias=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_vectors = np.asarray(kernel_vectors)
        self.jump = jump
        self.use_bias = bias

    def init(self, key, dtype=jnp.float32):
        k = self.kernel_vectors.shape[0]
        kw, kb = jax.random.split(key)
        scale = 1.0 / np.sqrt(self.in_channels * k)
        params = {"weight": jax.random.uniform(
            kw, (k, self.in_channels, self.out_channels),
            minval=-scale, maxval=scale, dtype=dtype)}
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_channels,), dtype=dtype)
        return params


class Conv3d(_ConvBase):
    """Functional sparse Conv3d module (params via ``init(key)``). Ref :145."""

    def apply(self, params, octrees, point_hierarchies, level, pyramids,
              exsum, input, **kwargs):
        return conv3d(octrees, point_hierarchies, level, pyramids, exsum,
                      input, params["weight"], self.kernel_vectors,
                      jump=self.jump, bias=params.get("bias"))

    __call__ = apply


class ConvTranspose3d(_ConvBase):
    """Functional sparse ConvTranspose3d module. Ref :369."""

    def apply(self, params, octrees, point_hierarchies, level, pyramids,
              exsum, input, **kwargs):
        return conv_transpose3d(octrees, point_hierarchies, level, pyramids,
                                exsum, input, params["weight"],
                                self.kernel_vectors, jump=self.jump,
                                bias=params.get("bias"))

    __call__ = apply
