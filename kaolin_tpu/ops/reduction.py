"""Packed reductions. Ref ``kaolin/ops/reduction.py:42`` (CUDA kernel
``csrc/ops/packed_simple_sum_cuda.cu``) — here a differentiable segment_sum;
see :func:`kaolin_tpu.ops.batch.packed_simple_sum`."""

from kaolin_tpu.ops.batch import packed_simple_sum  # noqa: F401

__all__ = ["packed_simple_sum"]
