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
