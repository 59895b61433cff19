"""TPU primitive cost probes: the measured numbers behind every
gather/scatter/sort design decision in this repo (BASELINE.md "primitive
cost table").

Run: ``python -m kaolin_tpu.utils.primitives_bench [--quick]``

Each probe times a single XLA/Pallas program with the true scalar-readback
fence (``utils.profiling.sync``) and reports throughput in millions of
elements per second. Results print as one JSON dict per line so they can be
pasted into BASELINE.md.
"""

import argparse
import json
import time

import numpy as np


def _timeit(fn, sync, repeats=5, inner=4):
    fn()
    sync()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            out = fn()
        sync()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaolin_tpu.utils.profiling import sync

    rng = np.random.RandomState(0)
    results = {}

    def report(name, n_elems, seconds, **extra):
        melems = n_elems / seconds / 1e6
        results[name] = {"Melem_s": round(melems, 1),
                         "ms": round(seconds * 1e3, 3), **extra}
        print(json.dumps({name: results[name]}), flush=True)

    sizes = [(1 << 20, 1 << 20)] if args.quick else [
        (1 << 16, 1 << 20), (1 << 20, 1 << 20), (1 << 22, 1 << 20),
        (1 << 22, 1 << 14)]

    # -- 1D gather: out[i] = table[idx[i]] --------------------------------
    for n_idx, n_tab in sizes:
        table = jnp.asarray(rng.randn(n_tab).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n_tab, n_idx).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        out = f(table, idx); sync(out)
        dt = _timeit(lambda: f(table, idx), lambda: sync(out))
        report(f"gather1d_n{n_idx}_tab{n_tab}", n_idx, dt)

    # -- row gather: out[i, :] = table[idx[i], :] (rows of 8 / 64 f32) ----
    for row in ([8] if args.quick else [8, 64]):
        n_idx, n_tab = (1 << 18), (1 << 16)
        table = jnp.asarray(rng.randn(n_tab, row).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, n_tab, n_idx).astype(np.int32))
        f = jax.jit(lambda t, i: t[i])
        out = f(table, idx); sync(out)
        dt = _timeit(lambda: f(table, idx), lambda: sync(out))
        report(f"rowgather_r{row}_n{n_idx}", n_idx, dt,
               GBps=round(n_idx * row * 4 / dt / 1e9, 2))

    # -- scatter-add and scatter-min (drop mode, non-unique) --------------
    n_idx, n_out = (1 << 20), (1 << 18)
    idx = jnp.asarray(rng.randint(0, n_out, n_idx).astype(np.int32))
    val = jnp.asarray(rng.rand(n_idx).astype(np.float32))
    f = jax.jit(lambda i, v: jnp.zeros((n_out,), jnp.float32)
                .at[i].add(v, mode="drop"))
    out = f(idx, val); sync(out)
    dt = _timeit(lambda: f(idx, val), lambda: sync(out))
    report(f"scatter_add_n{n_idx}", n_idx, dt)
    f = jax.jit(lambda i, v: jnp.full((n_out,), np.inf, jnp.float32)
                .at[i].min(v, mode="drop"))
    out = f(idx, val); sync(out)
    dt = _timeit(lambda: f(idx, val), lambda: sync(out))
    report(f"scatter_min_n{n_idx}", n_idx, dt)

    # unique-indices scatter (the collision-grid binning pattern)
    perm = jnp.asarray(rng.permutation(n_idx).astype(np.int32))
    f = jax.jit(lambda i, v: jnp.zeros((n_idx,), jnp.float32)
                .at[i].set(v, mode="drop", unique_indices=True))
    out = f(perm, val); sync(out)
    dt = _timeit(lambda: f(perm, val), lambda: sync(out))
    report(f"scatter_set_unique_n{n_idx}", n_idx, dt)

    # -- sort (1 key + 1 payload) -----------------------------------------
    for n in ([1 << 20] if args.quick else [1 << 18, 1 << 20, 1 << 22]):
        key = jnp.asarray(rng.randint(0, 1 << 30, n).astype(np.int32))
        pay = jnp.asarray(rng.rand(n).astype(np.float32))
        f = jax.jit(lambda k, p: jax.lax.sort((k, p), num_keys=1))
        out = f(key, pay); sync(out)
        dt = _timeit(lambda: f(key, pay), lambda: sync(out))
        report(f"sort_kv_n{n}", n, dt)

    # -- row-local sort (R, 128), 3 operands: the _raytrace_perray inner --
    r = 1 << 18
    key = jnp.asarray(rng.randint(0, 128, (r, 128)).astype(np.int32))
    a = jnp.asarray(rng.randint(0, 1 << 20, (r, 128)).astype(np.int32))
    f = jax.jit(lambda k, x: jax.lax.sort((k, x, x), dimension=-1,
                                          num_keys=1))
    out = f(key, a); sync(out)
    dt = _timeit(lambda: f(key, a), lambda: sync(out))
    report(f"rowsort128_r{r}", r * 128, dt)

    # -- cumsum (1D large) -------------------------------------------------
    n = 1 << 22
    x = jnp.asarray(rng.rand(n).astype(np.float32))
    f = jax.jit(jnp.cumsum)
    out = f(x); sync(out)
    dt = _timeit(lambda: f(x), lambda: sync(out))
    report(f"cumsum_n{n}", n, dt)

    # -- Pallas: dynamic per-lane gather from a VMEM table -----------------
    # THE raytrace-design question: can a kernel fetch table[idx] for a
    # (8, 128) block of runtime indices at vector rate?
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        n_tab = 1 << 20  # 4 MB table: fits VMEM
        n_idx = 1 << 20

        def gather_kernel(tab_ref, idx_ref, out_ref):
            out_ref[:] = tab_ref[idx_ref[:]]

        blk = 512  # (blk, 128) indices per program
        f = jax.jit(lambda t, i: pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((n_idx // 128, 128), jnp.float32),
            grid=(n_idx // 128 // blk,),
            in_specs=[
                pl.BlockSpec((n_tab,), lambda g: (0,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 128), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
        )(t, i))
        table = jnp.asarray(rng.randn(n_tab).astype(np.float32))
        idx = jnp.asarray(
            rng.randint(0, n_tab, (n_idx // 128, 128)).astype(np.int32))
        out = f(table, idx)
        ref = np.asarray(table)[np.asarray(idx)]
        ok = np.allclose(np.asarray(out), ref)
        sync(out)
        dt = _timeit(lambda: f(table, idx), lambda: sync(out))
        report(f"pallas_vmem_gather_n{n_idx}_tab{n_tab}", n_idx, dt,
               correct=bool(ok))
    except Exception as e:
        print(json.dumps({"pallas_vmem_gather": {
            "error": f"{type(e).__name__}: {e}"[:400]}}), flush=True)

    print(json.dumps({"ALL": results}))


if __name__ == "__main__":
    main()
