from kaolin_tpu.render import camera  # noqa: F401
from kaolin_tpu.render import mesh    # noqa: F401
from kaolin_tpu.render import spc     # noqa: F401
