from kaolin_tpu.physics import common      # noqa: F401
from kaolin_tpu.physics import materials   # noqa: F401
from kaolin_tpu.physics import simplicits  # noqa: F401
from kaolin_tpu.physics import utils       # noqa: F401
