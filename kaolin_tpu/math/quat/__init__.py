from kaolin_tpu.math.quat.quaternion import *   # noqa: F401,F403
from kaolin_tpu.math.quat.rotation33 import *   # noqa: F401,F403
from kaolin_tpu.math.quat.matrix44 import *     # noqa: F401,F403
from kaolin_tpu.math.quat.angle_axis import *   # noqa: F401,F403
from kaolin_tpu.math.quat.euclidean import *    # noqa: F401,F403
from kaolin_tpu.math.quat.transform import *    # noqa: F401,F403
from kaolin_tpu.math.quat.util import *         # noqa: F401,F403
