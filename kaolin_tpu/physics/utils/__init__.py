from kaolin_tpu.physics.utils.finite_diff import finite_diff_jac  # noqa: F401
from kaolin_tpu.physics.utils.torch_utilities import (  # noqa: F401
    create_projection_matrix,
    hess_reduction,
    standard_transform_to_relative,
)
