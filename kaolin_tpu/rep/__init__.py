from kaolin_tpu.rep.gaussians import GaussianSplatModel, PointSamples  # noqa: F401
from kaolin_tpu.rep.tensor_container import TensorContainerBase  # noqa: F401
from kaolin_tpu.rep.spc import Spc  # noqa: F401
from kaolin_tpu.rep.surface_mesh import SurfaceMesh  # noqa: F401
