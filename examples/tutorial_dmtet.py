"""Tutorial: DMTet — optimizing an SDF on a tetrahedral grid.

TPU-native port of the reference notebook
``examples/tutorial/dmtet_tutorial.ipynb``: a small MLP predicts an SDF (and
per-vertex deformations) on a tet grid; :func:`marching_tetrahedra_fixed`
extracts the surface differentiably with STATIC shapes (one vertex slot per
unique grid edge + masks — the TPU answer to the reference's dynamic
nonzero-compaction), and the mesh is fit to a target point cloud with a
masked Chamfer loss. The whole train step is one jitted XLA program; no
recompiles as the topology changes.

Run: python examples/tutorial_dmtet.py   (CPU or TPU)
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from kaolin_tpu.ops.conversions.tetmesh import marching_tetrahedra_fixed


def make_tet_grid(res):
    """Axis-aligned tet grid on [-1, 1]^3: each cube → 6 tets (the standard
    Kuhn split, like the reference's quartet-generated grids in spirit)."""
    xs = np.linspace(-1, 1, res + 1, dtype=np.float32)
    verts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                     axis=-1).reshape(-1, 3)
    vid = np.arange((res + 1) ** 3).reshape(res + 1, res + 1, res + 1)
    c = [vid[:-1, :-1, :-1], vid[1:, :-1, :-1], vid[:-1, 1:, :-1],
         vid[1:, 1:, :-1], vid[:-1, :-1, 1:], vid[1:, :-1, 1:],
         vid[:-1, 1:, 1:], vid[1:, 1:, 1:]]
    c = [x.reshape(-1) for x in c]
    kuhn = [(0, 1, 3, 7), (0, 1, 5, 7), (0, 2, 3, 7),
            (0, 2, 6, 7), (0, 4, 5, 7), (0, 4, 6, 7)]
    tets = np.stack([np.stack([c[a], c[b], c[d], c[e]], 1)
                     for a, b, d, e in kuhn]).reshape(-1, 4)
    return verts, tets.astype(np.int64)


def target_points(n, rng):
    """Target surface: a squashed torus-ish blob."""
    u = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    v = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    r, rr = 0.55, 0.22
    x = (r + rr * np.cos(v)) * np.cos(u)
    y = rr * np.sin(v) * 0.9
    z = (r + rr * np.cos(v)) * np.sin(u)
    return np.stack([x, y, z], 1)


def masked_chamfer(verts, mask, target):
    """One-sided masked Chamfer both ways (invalid vertex slots excluded)."""
    d2 = jnp.sum((verts[:, None] - target[None]) ** 2, -1)    # (E, P)
    big = jnp.float32(1e9)
    d2_masked = jnp.where(mask[:, None], d2, big)
    to_target = jnp.where(mask, jnp.min(d2, axis=1), 0.0)
    loss_a = jnp.sum(to_target) / jnp.clip(jnp.sum(mask), 1, None)
    loss_b = jnp.mean(jnp.min(d2_masked, axis=0))
    return loss_a + loss_b


def main(smoke=False):
    res = 8 if smoke else 24
    iters = 8 if smoke else 120
    rng = np.random.RandomState(0)
    grid_v, tets = make_tet_grid(res)
    tgt = jnp.asarray(target_points(256 if smoke else 2048, rng))

    # tiny SDF MLP like the notebook's Decoder (positions → sdf + offset)
    def init_mlp(key, widths=(3, 64, 64, 4)):
        params = []
        for i in range(len(widths) - 1):
            key, sub = jax.random.split(key)
            w = jax.random.normal(sub, (widths[i], widths[i + 1])) \
                * np.sqrt(2.0 / widths[i])
            params.append((w, jnp.zeros(widths[i + 1])))
        return params

    def mlp(params, x):
        h = x
        for w, b in params[:-1]:
            h = jax.nn.relu(h @ w + b)
        w, b = params[-1]
        out = h @ w + b
        # init near a sphere so the surface starts inside the grid
        sdf = out[:, 0] + (jnp.linalg.norm(x, axis=-1) - 0.7)
        offset = jnp.tanh(out[:, 1:]) * (1.0 / res)
        return sdf, offset

    params = init_mlp(jax.random.PRNGKey(0))
    gv = jnp.asarray(grid_v)

    def loss_fn(params):
        sdf, offset = mlp(params, gv)
        out = marching_tetrahedra_fixed(gv + offset, tets, sdf)
        return masked_chamfer(out["verts"], out["vert_mask"], tgt)

    opt = optax.adam(3e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        val, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, val

    first = last = None
    for it in range(iters):
        params, state, val = step(params, state)
        if it == 0:
            first = float(val)
        if it % 20 == 0 or it == iters - 1:
            print(f"iter {it:4d}  chamfer {float(val):.5f}")
    last = float(val)
    assert np.isfinite(last)
    if not smoke:
        assert last < first * 0.5, (first, last)

    sdf, offset = mlp(params, gv)
    out = marching_tetrahedra_fixed(gv + offset, tets, sdf)
    nv = int(jnp.sum(out["vert_mask"]))
    nf = int(jnp.sum(out["face_mask"]))
    print(f"extracted mesh: {nv} verts, {nf} faces "
          f"(static buffers: {out['verts'].shape[0]} edge slots)")
    assert nv > 0 and nf > 0
    print("done")


if __name__ == "__main__":
    main()
