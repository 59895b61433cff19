"""Backend detection helpers.

Pallas TPU kernels are run compiled on TPU and in interpreter mode everywhere
else (CPU CI, the 8-virtual-device sharding tests). Central switch so every
``pl.pallas_call`` site agrees.
"""

import functools
import logging

import jax

logger = logging.getLogger(__name__)


@functools.lru_cache(maxsize=None)
def on_tpu() -> bool:
    """True when JAX is driving a real TPU.

    The axon tunnel registers as backend ``"tpu"`` today, but this is a
    one-string landmine (VERDICT r4 #4): if a plugin ever reports its own
    platform name, every ``pallas_call`` would silently run interpreted on
    the chip. So the device kind is checked too, and the resolution is
    logged once.
    """
    try:
        backend = jax.default_backend()
        if backend == "tpu":
            result = True
        else:
            dev = jax.devices()[0]
            kind = (getattr(dev, "device_kind", "") or "").lower()
            plat = (getattr(dev, "platform", "") or "").lower()
            result = "tpu" in kind or "tpu" in plat
        logger.info("kaolin_tpu backend: %s (pallas %s)", backend,
                    "compiled" if result else "interpret")
        return result
    except Exception:
        return False


def pallas_interpret() -> bool:
    """Whether Pallas kernels should run in interpreter mode (non-TPU hosts)."""
    return not on_tpu()
