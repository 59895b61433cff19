from kaolin_tpu.ops.conversions.flexicubes import (  # noqa: F401
    FlexiCubes,
    dense_extract,
)
from kaolin_tpu.ops.conversions.gaussians import gs_to_voxelgrid  # noqa: F401
from kaolin_tpu.ops.conversions.pointcloud import (  # noqa: F401
    pointclouds_to_voxelgrids,
    unbatched_pointcloud_to_spc,
)
from kaolin_tpu.ops.conversions.sdf import sdf_to_voxelgrids  # noqa: F401
from kaolin_tpu.ops.conversions.tetmesh import (  # noqa: F401
    marching_tetrahedra,
    marching_tetrahedra_fixed,
)
from kaolin_tpu.ops.conversions.trianglemesh import (  # noqa: F401
    trianglemeshes_to_voxelgrids,
    unbatched_mesh_to_spc,
)
from kaolin_tpu.ops.conversions.voxelgrid import (  # noqa: F401
    voxelgrids_to_cubic_meshes,
    voxelgrids_to_trianglemeshes,
)
