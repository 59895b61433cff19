"""Skinning-weight networks for Simplicits.

TPU-native analog of reference ``kaolin/physics/simplicits/network.py``
(SkinningModule :28, SimplicitsMLP :116). Parameters are explicit pytrees
(functional JAX); a ``SkinningFn`` bundles params + apply + bbox
normalization and offers weights / spatial-Jacobian evaluation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SimplicitsMLP", "SkinningFn", "mlp_init", "mlp_apply"]


def mlp_init(key, spatial_dimensions, layer_width, num_handles, num_layers,
             dtype=jnp.float32):
    """Initialize ELU-MLP params matching the reference architecture
    (Linear(d,64) → ELU → [Linear(64,64) → ELU] × num_layers → Linear(64,H−1)).
    torch-style Kaiming-uniform init."""
    sizes = ([spatial_dimensions] + [layer_width] * (num_layers + 1)
             + [num_handles - 1])
    params = []
    for i in range(len(sizes) - 1):
        key, k1, k2 = jax.random.split(key, 3)
        fan_in = sizes[i]
        bound = 1.0 / np.sqrt(fan_in)
        w = jax.random.uniform(k1, (sizes[i], sizes[i + 1]),
                               minval=-bound, maxval=bound, dtype=dtype)
        b = jax.random.uniform(k2, (sizes[i + 1],),
                               minval=-bound, maxval=bound, dtype=dtype)
        params.append({"w": w, "b": b})
    return params


def mlp_apply(params, x):
    """Forward pass: learned handles only (no constant handle). Ref :154."""
    h = x
    for layer in params[:-1]:
        h = jax.nn.elu(h @ layer["w"] + layer["b"])
    return h @ params[-1]["w"] + params[-1]["b"]


@jax.tree_util.register_pytree_node_class
class SkinningFn:
    """Functional SkinningModule (ref :28): bbox-normalizes input points and
    appends the constant handle. ``params`` may be None for analytic weight
    functions (``from_function``)."""

    def __init__(self, params=None, fcn=None, bb_min=None, bb_max=None):
        self.params = params
        self.fcn = fcn if fcn is not None else mlp_apply
        self.bb_min = jnp.zeros(3) if bb_min is None else jnp.asarray(bb_min, dtype=jnp.float32)
        self.bb_max = jnp.ones(3) if bb_max is None else jnp.asarray(bb_max, dtype=jnp.float32)

    def tree_flatten(self):
        return (self.params, self.bb_min, self.bb_max), self.fcn

    @classmethod
    def tree_unflatten(cls, aux, children):
        params, bb_min, bb_max = children
        obj = cls.__new__(cls)
        obj.params = params
        obj.fcn = aux
        obj.bb_min = bb_min
        obj.bb_max = bb_max
        return obj

    @staticmethod
    def from_function(function, bb_min=0.0, bb_max=1.0):
        """Wrap an analytic weight function (ref :103)."""
        return SkinningFn(params=None,
                          fcn=lambda _params, pts: function(pts),
                          bb_min=jnp.broadcast_to(jnp.asarray(bb_min, jnp.float32), (3,)),
                          bb_max=jnp.broadcast_to(jnp.asarray(bb_max, jnp.float32), (3,)))

    def _offset_scale(self, pts):
        return (pts - self.bb_min) / (self.bb_max - self.bb_min)

    def __call__(self, pts):
        """Learned handles at normalized pts (N, d) → (N, H−1)."""
        return self.fcn(self.params, pts)

    def compute_skinning_weights(self, pts):
        """Weights at raw pts including the constant handle → (N, H). Ref :60."""
        norm_pts = self._offset_scale(pts)
        w = self.fcn(self.params, norm_pts)
        return jnp.concatenate(
            [w, jnp.ones((pts.shape[0], 1), dtype=w.dtype)], axis=1)

    def compute_dwdx(self, pts):
        """Spatial Jacobian of weights → (N, H, 3). Exact via jacrev. Ref :76."""
        jac_single = jax.jacrev(
            lambda p: self.compute_skinning_weights(p[None])[0])
        return jax.vmap(jac_single)(pts)


class SimplicitsMLP:
    """Convenience constructor mirroring reference SimplicitsMLP (:116):
    builds params + a SkinningFn."""

    def __new__(cls, spatial_dimensions, layer_width, num_handles, num_layers,
                bb_min=None, bb_max=None, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        params = mlp_init(key, spatial_dimensions, layer_width, num_handles,
                          num_layers)
        return SkinningFn(params=params, bb_min=bb_min, bb_max=bb_max)


# reference name for the skinning-weight module (ref network.py:28)
SkinningModule = SkinningFn
