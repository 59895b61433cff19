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

    # -- differentiable-param machinery (ref :416-466, :686) --
    def parameters(self):
        """(extrinsics params, intrinsics params) buffers. Ref :416."""
        return self.extrinsics.parameters(), self.intrinsics.parameters()

    def gradient_mask(self, *args):
        """(extrinsics mask, intrinsics mask) boolean masks selecting the
        named params as trainable; string args are routed to extrinsics
        (``'R'``/``'t'``) or intrinsics (e.g. ``'focal_x'``) by name.
        Ref :426. The extrinsics camera axes are always masked together.

        JAX idiom — mask the cotangents instead of a torch hook::

            m_ext, m_int = camera.gradient_mask('t', 'focal_x', 'focal_y')
            (g_ext, g_int) = jax.grad(loss)((camera.extrinsics.params,
                                             camera.intrinsics.params))
            g_ext, g_int = g_ext * m_ext, g_int * m_int
        """
        ext_names = ("R", "t")
        ext_args, int_args = [], []
        for a in args:
            name = a if isinstance(a, str) else a.name
            (ext_args if name in ext_names else int_args).append(name)
        return (self.extrinsics.gradient_mask(*ext_args),
                self.intrinsics.gradient_mask(*int_args))

    def named_params(self):
        """Descriptive list of named parameters per camera (extrinsics +
        intrinsics merged). Ref :686."""
        return [dict(e, **i) for e, i in zip(self.extrinsics.named_params(),
                                             self.intrinsics.named_params())]

    def to_dict(self):
        """JSON/YAML-writable dict; round-trips via :meth:`from_dict`."""
        return {"classname": "Camera",
                "extrinsics": self.extrinsics.to_dict(),
                "intrinsics": self.intrinsics.as_dict()}

    @classmethod
    def from_dict(cls, d, dtype=jnp.float32):
        if d.get("classname") != "Camera":
            raise ValueError(f"not a Camera dict: {d.get('classname')}")
        from kaolin_tpu.render.camera.intrinsics import CameraIntrinsics
        return cls(CameraExtrinsics.from_dict(d["extrinsics"], dtype=dtype),
                   CameraIntrinsics.from_dict(d["intrinsics"], dtype=dtype))

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
