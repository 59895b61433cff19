from kaolin_tpu.physics.materials import linear_elastic_material      # noqa: F401
from kaolin_tpu.physics.materials import material_utils               # noqa: F401
from kaolin_tpu.physics.materials import neohookean_elastic_material  # noqa: F401
from kaolin_tpu.physics.materials.material_utils import to_lame       # noqa: F401
from kaolin_tpu.physics.materials.neohookean_elastic_material import (  # noqa: F401
    NeohookeanElasticMaterial,
)
from kaolin_tpu.physics.materials.material_utils import get_defo_grad  # noqa: F401
