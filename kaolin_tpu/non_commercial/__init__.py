"""API-parity namespace for the reference's ``kaolin.non_commercial``.

The reference gates FlexiCubes behind an NSCL license in
``kaolin/non_commercial/__init__.py``; this framework's FlexiCubes is an
independent Apache-clean TPU reimplementation living in
``kaolin_tpu.ops.conversions.flexicubes``, re-exported here so reference
imports (``from kaolin.non_commercial import FlexiCubes``) port verbatim.
"""

from kaolin_tpu.ops.conversions.flexicubes import FlexiCubes  # noqa: F401

__all__ = ["FlexiCubes"]
