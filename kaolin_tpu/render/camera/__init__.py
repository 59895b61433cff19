from kaolin_tpu.render.camera.camera import Camera  # noqa: F401
from kaolin_tpu.render.camera.coordinates import blender_coords, opengl_coords  # noqa: F401
from kaolin_tpu.render.camera.extrinsics import CameraExtrinsics  # noqa: F401
from kaolin_tpu.render.camera.intrinsics import (  # noqa: F401
    CameraFOV,
    CameraIntrinsics,
    OrthographicIntrinsics,
    PinholeIntrinsics,
    down_from_homogeneous,
    up_to_homogeneous,
)
from kaolin_tpu.render.camera.raygen import (  # noqa: F401
    generate_centered_custom_resolution_pixel_coords,
    generate_centered_pixel_coords,
    generate_default_grid,
    generate_ortho_rays,
    generate_pinhole_rays,
    generate_rays,
)
