"""Material I/O errors (re-exported; ref ``kaolin/io/materials.py``)."""

from kaolin_tpu.io.obj import (  # noqa: F401
    MaterialError,
    MaterialFileError,
    MaterialLoadError,
    MaterialNotFoundError,
)

__all__ = ["MaterialError", "MaterialFileError", "MaterialLoadError",
           "MaterialNotFoundError"]
