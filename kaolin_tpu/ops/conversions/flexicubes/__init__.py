from kaolin_tpu.ops.conversions.flexicubes.flexicubes import FlexiCubes  # noqa: F401
