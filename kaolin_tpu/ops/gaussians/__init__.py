from kaolin_tpu.ops.gaussians.densifier import sample_points_in_volume  # noqa: F401
from kaolin_tpu.ops.gaussians.transforms import (  # noqa: F401
    transform_gaussians,
    transform_shs,
)
