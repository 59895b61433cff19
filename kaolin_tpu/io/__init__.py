from kaolin_tpu.io import dataset   # noqa: F401
from kaolin_tpu.io import gltf      # noqa: F401
from kaolin_tpu.io import materials  # noqa: F401
from kaolin_tpu.io import obj       # noqa: F401
from kaolin_tpu.io import off       # noqa: F401
from kaolin_tpu.io import ply       # noqa: F401
from kaolin_tpu.io import shapenet  # noqa: F401
from kaolin_tpu.io import shrec     # noqa: F401
from kaolin_tpu.io import usd       # noqa: F401
from kaolin_tpu.io import utils     # noqa: F401
from kaolin_tpu.io.dataset import Cache, CachedDataset  # noqa: F401
from kaolin_tpu.io.mesh import import_mesh  # noqa: F401
from kaolin_tpu.io.modelnet import ModelNet  # noqa: F401
from kaolin_tpu.io.shapenet import ShapeNetV1, ShapeNetV2  # noqa: F401
from kaolin_tpu.io.shrec import SHREC16  # noqa: F401
from kaolin_tpu.io import gaussians  # noqa: F401
from kaolin_tpu.io import render     # noqa: F401
from kaolin_tpu.io.gaussians import import_gaussiancloud  # noqa: F401
from kaolin_tpu.io.render import import_synthetic_view  # noqa: F401
