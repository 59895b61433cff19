"""Unified mesh import dispatcher. Ref ``kaolin/io/mesh.py:23``."""

import os

__all__ = ["import_mesh"]


def import_mesh(path, **kwargs):
    """Dispatch on file extension (.obj/.off/.usd/.usda/.gltf/.glb/.ply).
    Ref :23."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        from kaolin_tpu.io import obj
        return obj.import_mesh(path, **kwargs)
    if ext == ".off":
        from kaolin_tpu.io import off
        kwargs.pop("triangulate", None)
        return off.import_mesh(path, **kwargs)
    if ext in (".usd", ".usda", ".usdc"):
        from kaolin_tpu.io import usd
        kwargs.pop("triangulate", None)
        return usd.import_mesh(path, **kwargs)
    if ext in (".gltf", ".glb"):
        from kaolin_tpu.io import gltf
        kwargs.pop("triangulate", None)
        return gltf.import_mesh(path)
    if ext == ".ply":
        from kaolin_tpu.io import ply
        kwargs.pop("triangulate", None)
        return ply.import_mesh(path)
    raise ValueError(f"unsupported mesh format {ext!r}")
