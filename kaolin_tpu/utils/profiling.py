"""Profiling helpers — the TPU analog of the reference's Nsight flow.

The reference documents profiling its physics benchmarks under Nsight Systems
(``/root/reference/tests/benchmarks/README.md``: ``nsys profile -o ...``).
On TPU the equivalent is a ``jax.profiler`` trace (viewable in
TensorBoard/Perfetto) plus simple wall-clock timing of compiled calls.

Two tools:

* :func:`trace` — context manager wrapping ``jax.profiler.trace`` with a
  stable output directory layout (one subdirectory per label).
* :func:`time_fn` — robust wall-clock timing of a (jitted) callable with
  warm-up compile, a TRUE device fence (scalar readback — see :func:`sync`),
  and best-of-k repeats; returns a :class:`Timing` with per-call
  milliseconds.

Example::

    from kaolin_tpu.utils.profiling import trace, time_fn

    t = time_fn(lambda: step_fn(z, z_prev, z_dot))   # -> Timing(ms=...)
    with trace("sim_step"):                          # writes a TB trace
        step_fn(z, z_prev, z_dot)
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from typing import Callable

import jax

__all__ = ["trace", "time_fn", "sync", "Timing", "default_trace_dir"]


def sync(x) -> None:
    """Force completion of everything ``x`` depends on — a TRUE fence.

    ``jax.block_until_ready`` does NOT block on the axon tunnel platform
    (dispatches queue without a completion signal), so timing loops fenced
    with it measure dispatch only. A 4-byte scalar readback is a real fence:
    the host transfer cannot start until the dependent program finishes.
    Falls back to ``block_until_ready`` for non-array leaves.
    """
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.numpy.ravel(leaf)[0])
            return
    jax.block_until_ready(x)


def default_trace_dir() -> str:
    """Trace output root: ``$KAOLIN_TPU_TRACE_DIR`` or ``/tmp/kaolin_tpu_traces``."""
    return os.environ.get("KAOLIN_TPU_TRACE_DIR", "/tmp/kaolin_tpu_traces")


@contextlib.contextmanager
def trace(label: str, trace_dir: str | None = None):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    The trace lands in ``<trace_dir>/<label>`` and can be opened with
    TensorBoard (``tensorboard --logdir <trace_dir>``) or converted with
    Perfetto. Nested traces are not supported (jax limitation).
    """
    out = os.path.join(trace_dir or default_trace_dir(), label)
    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out):
        yield out


@dataclasses.dataclass
class Timing:
    """Wall-clock timing result of :func:`time_fn`."""

    ms: float          # best (min) per-call milliseconds
    mean_ms: float     # mean per-call milliseconds over repeats
    repeats: int
    calls_per_repeat: int

    def __str__(self):
        return (f"{self.ms:.3f} ms/call (mean {self.mean_ms:.3f}, "
                f"{self.repeats}x{self.calls_per_repeat} calls)")


def time_fn(fn: Callable[[], object], *, repeats: int = 5,
            calls_per_repeat: int = 10, warmup: int = 1) -> Timing:
    """Time a nullary callable returning jax arrays (or pytrees of them).

    Runs ``warmup`` untimed calls (compile + autotune), then ``repeats``
    timed batches of ``calls_per_repeat`` calls each, fencing every batch
    with :func:`sync` (a scalar readback — ``jax.block_until_ready`` does
    NOT block on the axon tunnel platform, so fencing with it measures
    dispatch only). Reports min and mean per-call time; calls within a
    batch overlap dispatch, so this is a throughput ("dispatched rate")
    number like ``bench.py``'s.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn()
    sync(out)

    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(calls_per_repeat):
            out = fn()
        sync(out)
        samples.append((time.perf_counter() - t0) / calls_per_repeat)
    return Timing(ms=min(samples) * 1e3,
                  mean_ms=sum(samples) / len(samples) * 1e3,
                  repeats=repeats, calls_per_repeat=calls_per_repeat)
