from kaolin_tpu.physics.common import optimization  # noqa: F401
from kaolin_tpu.physics.common import scene_forces  # noqa: F401
from kaolin_tpu.physics.common.optimization import newtons_method  # noqa: F401
from kaolin_tpu.physics.common.scene_forces import Boundary, Floor, Gravity  # noqa: F401
from kaolin_tpu.physics.common import collisions  # noqa: F401
from kaolin_tpu.physics.common.collisions import Collision, Contacts  # noqa: F401
