"""nvdiffrast context management — API-compatibility stubs.

The reference (``kaolin/render/mesh/nvdiffrast_context.py``) caches one
nvdiffrast CUDA/GL context per device for its nvdiffrast rasterization
backend. nvdiffrast is CUDA-only; on TPU the equivalent functionality is the
native XLA/Pallas rasterizer (``kaolin_tpu.render.mesh.rasterize``), so these
entry points exist for API parity and report unavailability crisply.
"""

__all__ = ["nvdiffrast_is_available", "default_nvdiffrast_context",
           "set_default_nvdiffrast_context"]

_CONTEXTS = {}


def nvdiffrast_is_available():
    """Always False on TPU builds (nvdiffrast is CUDA-only). Ref
    (nvdiffrast_is_available)."""
    return False


def default_nvdiffrast_context(device=None, raise_error=True):
    """Ref (default_nvdiffrast_context). Raises (or returns None when
    ``raise_error=False``) — use the built-in rasterizer instead."""
    ctx = _CONTEXTS.get(device)
    if ctx is not None:
        return ctx
    if raise_error:
        raise RuntimeError(
            "nvdiffrast is not available on TPU; use "
            "kaolin_tpu.render.mesh.rasterize (XLA/Pallas backend) instead.")
    return None


def set_default_nvdiffrast_context(context, device=None):
    """Store a user-provided context object (for tests / future backends)."""
    _CONTEXTS[device] = context
    return context
