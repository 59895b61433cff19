"""Format-dispatching gaussian-splat cloud import.

TPU-native analog of reference ``kaolin/io/gaussians.py:20``.
"""

__all__ = ["import_gaussiancloud"]


def import_gaussiancloud(filename):
    """Read a 3D Gaussian Splat cloud (ply / usd[a]) → GaussianSplatModel.
    Ref :20."""
    extension = filename.split(".")[-1].lower()
    if extension == "ply":
        from kaolin_tpu.io import ply
        return ply.import_gaussiancloud(filename)
    if extension in ("usd", "usda", "usdc", "usdz"):
        from kaolin_tpu.io import usd
        return usd.import_gaussiancloud(filename)
    raise ValueError(
        f"Unsupported Gaussian Splat filename extension {extension}")
