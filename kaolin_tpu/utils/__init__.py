from kaolin_tpu.utils import testing  # noqa: F401
from kaolin_tpu.utils.backend import on_tpu, pallas_interpret  # noqa: F401
