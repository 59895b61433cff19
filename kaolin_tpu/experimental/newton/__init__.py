"""Newton-engine bridge: couple Simplicits soft bodies to rigid colliders.

TPU-native analog of reference ``kaolin/experimental/newton/`` (builder :31,
model :28, solver :29, particle↔shape soft contact collisions.py:33-989).
The external NVIDIA Newton engine is replaced by a minimal rigid-shape set
(:mod:`shapes`) with the same contact data contract.
"""

from kaolin_tpu.experimental.newton.builder import SimplicitsModelBuilder  # noqa: F401
from kaolin_tpu.experimental.newton.collisions import (  # noqa: F401
    ParticleShapeSoftContact,
)
from kaolin_tpu.experimental.newton.model import (  # noqa: F401
    SimplicitsModel,
    SimplicitsState,
)
from kaolin_tpu.experimental.newton.shapes import RigidShapes  # noqa: F401
from kaolin_tpu.experimental.newton.solver import SimplicitsSolver  # noqa: F401
