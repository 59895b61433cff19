"""kaolin_tpu — a TPU-native 3D deep-learning framework (JAX / XLA / Pallas).

Re-implements the capabilities of NVIDIA Kaolin (reference: NVIDIAGameWorks/kaolin
v0.18.0, ``kaolin/__init__.py:1-15``) with a TPU-first architecture:

* batched 3D representations as JAX pytrees (:mod:`kaolin_tpu.rep`)
* differentiable rendering — soft rasterization, octree raytracing, SG/SH
  lighting, cameras (:mod:`kaolin_tpu.render`)
* representation conversions — marching cubes/tets, FlexiCubes, voxelization
  (:mod:`kaolin_tpu.ops.conversions`)
* metrics and losses (:mod:`kaolin_tpu.metrics`)
* reduced-order elastodynamics physics (:mod:`kaolin_tpu.physics`)
* 3D file I/O (:mod:`kaolin_tpu.io`)
* device-mesh sharding helpers, a capability the reference lacks
  (:mod:`kaolin_tpu.parallel`)

All compute paths are jittable JAX; hot kernels are Pallas TPU kernels with
custom VJPs. There is no torch dependency anywhere.
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry code expects fp32-exact small-matrix math (the reference's CUDA
# kernels are exact fp32). On TPU 'float32' precision lowers to the 3-pass
# bf16 MXU scheme (~fp32 accuracy); hot kernels that tolerate bf16 opt into
# lower precision explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "float32")

from kaolin_tpu import io         # noqa: F401
from kaolin_tpu import math       # noqa: F401
from kaolin_tpu import metrics    # noqa: F401
from kaolin_tpu import non_commercial  # noqa: F401
from kaolin_tpu import ops        # noqa: F401
from kaolin_tpu import parallel   # noqa: F401
from kaolin_tpu import physics    # noqa: F401
from kaolin_tpu import render     # noqa: F401
from kaolin_tpu import rep        # noqa: F401
from kaolin_tpu import utils      # noqa: F401
from kaolin_tpu import visualize  # noqa: F401
