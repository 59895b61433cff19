from kaolin_tpu.rep.spc import Spc  # noqa: F401
from kaolin_tpu.rep.surface_mesh import SurfaceMesh  # noqa: F401
