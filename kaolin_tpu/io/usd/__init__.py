from kaolin_tpu.io.usd.core import (  # noqa: F401
    UsdaStage,
    add_mesh,
    add_pointcloud,
    add_voxelgrid,
    create_stage,
    export_mesh,
    export_meshes,
    export_pointcloud,
    import_mesh,
    import_meshes,
    import_pointcloud,
)
from kaolin_tpu.io.usd.core import (  # noqa: F401
    add_gaussiancloud,
    add_physics_material,
    add_skinned_physics,
    export_gaussiancloud,
    get_physics_material,
    get_skinned_physics,
    import_gaussiancloud,
    import_gaussianclouds,
    import_voxelgrid,
)
