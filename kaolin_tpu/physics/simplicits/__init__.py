from kaolin_tpu.physics.simplicits import losses       # noqa: F401
from kaolin_tpu.physics.simplicits import network      # noqa: F401
from kaolin_tpu.physics.simplicits import precomputed  # noqa: F401
from kaolin_tpu.physics.simplicits import simulation   # noqa: F401
from kaolin_tpu.physics.simplicits import skinning     # noqa: F401
from kaolin_tpu.physics.simplicits import training     # noqa: F401
from kaolin_tpu.physics.simplicits.simulation import (  # noqa: F401
    SimplicitsScene,
    SimulatedObject,
)
from kaolin_tpu.physics.simplicits.training import (  # noqa: F401
    PhysicsPoints,
    SimplicitsObject,
    SkinnedPhysicsPoints,
    SkinnedPoints,
)
from kaolin_tpu.physics.simplicits.losses import (  # noqa: F401
    compute_losses,
    loss_elastic,
    loss_ortho,
)
from kaolin_tpu.physics.simplicits.network import (  # noqa: F401
    SimplicitsMLP,
    SkinningFn,
    SkinningModule,
)
from kaolin_tpu.physics.simplicits.precomputed import (  # noqa: F401
    dFdz_matrix,
    jacobian_dF_dz,
    lbs_matrix,
    lumped_mass_matrix,
    sparse_collision_jacobian_matrix,
    sparse_dFdz_matrix,
    sparse_dFdz_matrix_from_dense,
    sparse_lbs_matrix,
    sparse_mass_matrix,
)
from kaolin_tpu.physics.simplicits.rkpm import SimplicitsRKPM  # noqa: F401
from kaolin_tpu.physics.simplicits.skinning import (  # noqa: F401
    standard_lbs,
    weight_function_lbs,
)

# the reference's Warp fast-path losses are subsumed by the jitted XLA loss
compute_losses_warp = compute_losses
loss_elastic_warp = loss_elastic
