"""DIB-R inverse rendering: silhouette pose optimization (BASELINE config 2).

Optimize vertex positions so the rendered soft silhouette matches a target
mask — the reference dibr_tutorial inner loop, jitted end to end.

Run: python examples/dibr_optimization.py  (CPU: small sizes; TPU: raise RES)
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from kaolin_tpu.metrics.render import mask_iou
from kaolin_tpu.render.mesh import dibr_rasterization

RES = 64


def triangle(shift):
    fvi = jnp.asarray([[[[-0.4 + shift, -0.4], [0.4 + shift, -0.4],
                         [0.0 + shift, 0.45]]]])
    fvz = jnp.full((1, 1, 3), -1.0)
    feat = jnp.ones((1, 1, 3, 3))
    return fvz, fvi, feat


def main():
    fvz, fvi_target, feat = triangle(0.0)
    nz = jnp.ones((1, 1))
    _, target_mask, _ = dibr_rasterization(RES, RES, fvz, fvi_target, feat,
                                           nz)
    fvi = triangle(0.45)[1]

    def loss_fn(v):
        _, soft, _ = dibr_rasterization(RES, RES, fvz, v, feat, nz,
                                        sigmainv=70, boxlen=0.5)
        return mask_iou(soft, (target_mask > 0.5).astype(jnp.float32))

    opt = optax.adam(2e-2)
    state = opt.init(fvi)
    step = jax.jit(jax.value_and_grad(loss_fn))
    for it in range(60):
        val, grad = step(fvi)
        updates, state = opt.update(grad, state)
        fvi = optax.apply_updates(fvi, updates)
        if it % 15 == 0:
            print(f"iter {it:3d}: silhouette IoU loss {float(val):.4f}")
    print(f"final loss {float(val):.4f}; "
          f"recovered shift {float(jnp.mean(fvi[..., 0])):+.3f} (target 0)")


if __name__ == "__main__":
    main()
