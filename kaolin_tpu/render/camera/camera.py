"""The Camera class: extrinsics × intrinsics. Ref ``kaolin/render/camera/camera.py:109``.

A registered pytree pairing :class:`CameraExtrinsics` with a
:class:`CameraIntrinsics` subclass; passes through jit/vmap/grad, and all
mutating operations are pure (return new cameras).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kaolin_tpu.render.camera.extrinsics import CameraExtrinsics
from kaolin_tpu.render.camera.intrinsics import (
    CameraFOV,
    CameraIntrinsics,
    OrthographicIntrinsics,
    PinholeIntrinsics,
)

__all__ = ["Camera"]

_EXTRINSICS_ARGS = ("eye", "at", "up", "view_matrix", "cam_pos", "cam_dir",
                    "extrinsics")
_PINHOLE_ARGS = ("fov", "focal_x", "focal_y", "fov_direction")
_ORTHO_ARGS = ("fov_distance",)


@jax.tree_util.register_pytree_node_class
class Camera:
    """Differentiable batched camera. Construct via :meth:`from_args`. Ref :261."""

    def __init__(self, extrinsics: CameraExtrinsics, intrinsics: CameraIntrinsics):
        assert len(extrinsics) == len(intrinsics), \
            "extrinsics and intrinsics batch sizes differ"
        self.extrinsics = extrinsics
        self.intrinsics = intrinsics

    def tree_flatten(self):
        return (self.extrinsics, self.intrinsics), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def from_args(cls, **kwargs):
        """Build a camera from any valid combination of constructor args —
        mirrors reference Camera.from_args (:309). Examples::

            Camera.from_args(eye=..., at=..., up=..., fov=..., width=..., height=...)
            Camera.from_args(view_matrix=..., focal_x=..., width=..., height=...)
            Camera.from_args(eye=..., at=..., up=..., fov_distance=1.0,
                             width=..., height=...)
        """
        dtype = kwargs.pop("dtype", jnp.float32)
        kwargs.pop("device", None)  # accepted for API parity, unused

        # extrinsics
        backend = kwargs.pop("backend", "matrix_se3")
        if "extrinsics" in kwargs:
            extrinsics = kwargs.pop("extrinsics")
        elif all(k in kwargs for k in ("eye", "at", "up")):
            extrinsics = CameraExtrinsics.from_lookat(
                kwargs.pop("eye"), kwargs.pop("at"), kwargs.pop("up"),
                dtype=dtype, backend=backend)
        elif "view_matrix" in kwargs:
            extrinsics = CameraExtrinsics.from_view_matrix(
                kwargs.pop("view_matrix"), dtype=dtype, backend=backend)
        elif all(k in kwargs for k in ("cam_pos", "cam_dir")):
            extrinsics = CameraExtrinsics.from_camera_pose(
                kwargs.pop("cam_pos"), kwargs.pop("cam_dir"),
                dtype=dtype, backend=backend)
        else:
            raise ValueError("no valid extrinsics args given")

        # intrinsics
        if "intrinsics" in kwargs:
            intrinsics = kwargs.pop("intrinsics")
        else:
            width = kwargs.pop("width")
            height = kwargs.pop("height")
            common = {k: kwargs.pop(k) for k in ("near", "far") if k in kwargs}
            num_cameras = len(extrinsics)
            if "fov" in kwargs:
                intrinsics = PinholeIntrinsics.from_fov(
                    width, height, kwargs.pop("fov"),
                    kwargs.pop("fov_direction", CameraFOV.VERTICAL),
                    kwargs.pop("x0", 0.0), kwargs.pop("y0", 0.0),
                    num_cameras=num_cameras, dtype=dtype, **common)
            elif "focal_x" in kwargs:
                intrinsics = PinholeIntrinsics.from_focal(
                    width, height, kwargs.pop("focal_x"),
                    kwargs.pop("focal_y", None),
                    kwargs.pop("x0", 0.0), kwargs.pop("y0", 0.0),
                    num_cameras=num_cameras, dtype=dtype, **common)
            elif "fov_distance" in kwargs:
                intrinsics = OrthographicIntrinsics.from_frustum(
                    width, height, kwargs.pop("fov_distance"),
                    num_cameras=num_cameras, dtype=dtype, **common)
            else:
                raise ValueError("no valid intrinsics args given")
        if kwargs:
            raise TypeError(f"unused Camera.from_args arguments: {sorted(kwargs)}")
        return cls(extrinsics, intrinsics)

    # -- proxies --
    def __len__(self):
        return len(self.extrinsics)

    @property
    def width(self):
        return self.intrinsics.width

    @property
    def height(self):
        return self.intrinsics.height

    @property
    def lens_type(self):
        return self.intrinsics.lens_type

    @property
    def dtype(self):
        return self.extrinsics.dtype

    def __getattr__(self, item):
        # proxy to intrinsics then extrinsics (ref :608)
        intr = object.__getattribute__(self, "intrinsics")
        if hasattr(type(intr), item):
            return getattr(intr, item)
        extr = object.__getattribute__(self, "extrinsics")
        if hasattr(type(extr), item):
            return getattr(extr, item)
        raise AttributeError(item)

    def __getitem__(self, item):
        return Camera(self.extrinsics[item], self.intrinsics[item])

    # -- core transforms --
    def transform(self, vectors):
        """World space → NDC. Ref :536."""
        return self.intrinsics.transform(self.extrinsics.transform(vectors))

    def view_projection_matrix(self):
        """(C, 4, 4) full world→clip matrix. Ref :559."""
        return self.intrinsics.projection_matrix() @ self.extrinsics.view_matrix()

    def generate_rays(self, coords_grid=None):
        """Ray origins + directions for every pixel. Ref :573."""
        from kaolin_tpu.render.camera.raygen import (
            generate_ortho_rays,
            generate_pinhole_rays,
        )
        if self.lens_type == "pinhole":
            return generate_pinhole_rays(self, coords_grid)
        return generate_ortho_rays(self, coords_grid)

    @classmethod
    def cat(cls, cameras):
        """Concatenate same-type cameras along the batch dim. Ref :594."""
        ext = CameraExtrinsics(
            jnp.concatenate([c.extrinsics.params for c in cameras], axis=0),
            backend=cameras[0].extrinsics.backend)
        intr0 = cameras[0].intrinsics
        intr = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(intr0),
            [jnp.concatenate([c.intrinsics.params for c in cameras], axis=0)])
        return cls(ext, intr)

    def __repr__(self):
        return (f"Camera(num_cameras={len(self)}, lens={self.lens_type!r}, "
                f"res={self.width}x{self.height})")


def allclose(input, other, rtol=1e-05, atol=1e-08, equal_nan=False):
    """Closeness of two Cameras: extrinsics and intrinsics both close.
    Ref camera.py (allclose)."""
    from kaolin_tpu.render.camera import extrinsics as _ext
    from kaolin_tpu.render.camera import intrinsics as _int
    return (_ext.allclose(input.extrinsics, other.extrinsics, rtol=rtol,
                          atol=atol, equal_nan=equal_nan)
            and _int.allclose(input.intrinsics, other.intrinsics, rtol=rtol,
                              atol=atol, equal_nan=equal_nan))
