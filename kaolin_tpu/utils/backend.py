"""Backend detection helpers.

Pallas TPU kernels are run compiled on TPU and in interpreter mode everywhere
else (CPU CI, the 8-virtual-device sharding tests). Central switch so every
``pl.pallas_call`` site agrees.
"""

import functools

import jax


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    """True when the default JAX backend is a TPU."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode (non-TPU hosts)."""
    return not on_tpu()
