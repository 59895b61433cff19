"""Polyscope camera conversions. Ref ``kaolin/render/camera/polyscope.py``."""

import numpy as np

__all__ = ["polyscope_camera_to_kaolin", "kaolin_camera_to_polyscope"]


def polyscope_camera_to_kaolin(ps_camera, width, height, near=1e-2, far=1e2,
                               dtype=None):
    """polyscope.core.CameraParameters → Camera. Ref :28."""
    from kaolin_tpu.render.camera.camera import Camera
    import jax.numpy as jnp
    return Camera.from_args(
        view_matrix=jnp.asarray(np.asarray(ps_camera.get_view_mat())),
        fov=np.deg2rad(ps_camera.get_fov_vertical_deg()),
        width=width, height=height, near=near, far=far)


def kaolin_camera_to_polyscope(camera):
    """Camera → polyscope.core.CameraParameters (requires polyscope).
    Ref :64."""
    import polyscope as ps
    assert len(camera) == 1, "only single camera supported"
    from kaolin_tpu.render.camera.intrinsics import CameraFOV
    view_matrix = np.asarray(camera.view_matrix())
    fov_y = float(np.asarray(camera.intrinsics.fov(CameraFOV.VERTICAL))[0])
    return ps.CameraParameters(
        ps.CameraIntrinsics(fov_vertical_deg=fov_y,
                            aspect=camera.width / camera.height),
        ps.CameraExtrinsics(mat=view_matrix[0]))
