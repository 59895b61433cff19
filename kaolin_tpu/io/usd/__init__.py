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
