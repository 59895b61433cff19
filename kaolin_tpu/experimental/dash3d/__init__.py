"""kaolin-dash3d: web visualizer for Timelapse checkpoints.

Ref ``kaolin/experimental/dash3d/`` (tornado server streaming Timelapse
geometry over websockets to a canvas frontend).
"""
from kaolin_tpu.experimental.dash3d.run import create_server, run_main  # noqa: F401
from kaolin_tpu.experimental.dash3d.util import (  # noqa: F401
    GeometryWebSocketHandler,
    StreamingGeometryHelper,
    meshes_to_binary,
    point_clouds_to_binary,
)
