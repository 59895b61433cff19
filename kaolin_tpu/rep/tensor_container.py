"""Tensor container base. Ref ``kaolin/rep/tensor_container.py:27``.

Device movement methods of the reference (.to/.cuda/.cpu) are no-ops /
dtype-casts in JAX (placement is managed by jit/sharding)."""

import jax.numpy as jnp

__all__ = ["TensorContainerBase"]


class TensorContainerBase:
    """Base for containers bundling named arrays. Subclasses declare
    ``class_tensor_attributes`` / ``class_other_attributes``."""

    @classmethod
    def class_tensor_attributes(cls):
        return []

    @classmethod
    def class_other_attributes(cls):
        return []

    def get_attributes(self, only_tensors=False):
        names = (self.class_tensor_attributes() if only_tensors else
                 self.class_tensor_attributes() + self.class_other_attributes())
        return [n for n in names if getattr(self, n, None) is not None]

    def float_tensors_to(self, dtype):
        for a in self.class_tensor_attributes():
            v = getattr(self, a, None)
            if v is not None and jnp.issubdtype(v.dtype, jnp.floating):
                setattr(self, a, v.astype(dtype))
        return self

    # API-parity no-ops (JAX manages placement)
    def to(self, *args, **kwargs):
        return self

    def cuda(self, *args, **kwargs):
        return self

    def cpu(self, *args, **kwargs):
        return self
