"""Pluggable extrinsics parameterizations.

TPU-native analog of reference ``kaolin/render/camera/extrinsics_backends.py``
(ExtrinsicsRep :148 base + ``register_backend`` decorator): a backend defines
how (R, t) maps to the differentiable ``params`` vector and back. The two
built-ins ("matrix_se3", "matrix_6dof_rotation") are implemented directly in
:class:`CameraExtrinsics` for speed; custom backends registered here are
consulted for any other name.
"""

import enum
from abc import ABC, abstractmethod

__all__ = ["ExtrinsicsRep", "register_backend", "get_backend"]

_BACKEND_REGISTRY = {}


class ExtrinsicsRep(ABC):
    """A camera-extrinsics parameterization. Subclass + decorate with
    :func:`register_backend` to plug in a new representation. Ref :148."""

    @classmethod
    @abstractmethod
    def params_from_Rt(cls, R, t):
        """(C, 3, 3), (C, 3) → (C, P) parameter vector."""

    @classmethod
    @abstractmethod
    def R(cls, params):
        """(C, P) → (C, 3, 3)."""

    @classmethod
    @abstractmethod
    def t(cls, params):
        """(C, P) → (C, 3, 1)."""


def register_backend(name):
    """Class decorator registering an :class:`ExtrinsicsRep` under ``name``.
    Ref (register_backend)."""
    def wrap(cls):
        if not issubclass(cls, ExtrinsicsRep):
            raise TypeError("backend must subclass ExtrinsicsRep")
        _BACKEND_REGISTRY[name] = cls
        return cls
    return wrap


def get_backend(name):
    return _BACKEND_REGISTRY.get(name)


class ExtrinsicsParamsDefEnum(enum.IntEnum):
    """Semantic slots every extrinsics backend exposes (ref
    extrinsics_backends.py:34): the camera axes orientation and center."""
    R = 0
    t = 1
