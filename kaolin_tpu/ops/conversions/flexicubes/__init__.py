from kaolin_tpu.ops.conversions.flexicubes.flexicubes import FlexiCubes  # noqa: F401
from kaolin_tpu.ops.conversions.flexicubes.dense import dense_extract  # noqa: F401
