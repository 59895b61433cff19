from kaolin_tpu.render import camera       # noqa: F401
from kaolin_tpu.render import easy_render  # noqa: F401
from kaolin_tpu.render import lighting     # noqa: F401
from kaolin_tpu.render import materials    # noqa: F401
from kaolin_tpu.render import mesh         # noqa: F401
from kaolin_tpu.render import spc          # noqa: F401
from kaolin_tpu.render.materials import Material, PBRMaterial  # noqa: F401
