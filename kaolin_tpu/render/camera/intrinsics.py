"""Camera intrinsics — projection from camera space to NDC, as JAX pytrees.

TPU-native analog of reference ``kaolin/render/camera/intrinsics.py:85``
(base), ``intrinsics_pinhole.py:34`` and ``intrinsics_ortho.py:35``.

Conventions (matching the reference): left-handed NDC (depth increases into
the screen), camera looks down −z (OpenGL), NDC range [-1, 1] by default,
projection factored as ``ndc_matrix @ perspective_matrix``.

Params tensors are (num_cameras, P) traced arrays (differentiable); width /
height / near / far / ndc range are static python numbers (aux data).
"""

from __future__ import annotations

import enum
import math

import jax
import jax.numpy as jnp

__all__ = [
    "CameraFOV",
    "CameraIntrinsics",
    "PinholeIntrinsics",
    "OrthographicIntrinsics",
    "up_to_homogeneous",
    "down_from_homogeneous",
]

DEFAULT_NEAR = 1e-2
DEFAULT_FAR = 1e2


class CameraFOV(enum.Enum):
    """Camera field-of-view direction (ref ``intrinsics.py:52``)."""
    HORIZONTAL = 0
    VERTICAL = 1
    DIAGONAL = 2


def up_to_homogeneous(vectors):
    """Append w=1 if needed."""
    if vectors.shape[-1] == 4:
        return vectors
    return jnp.concatenate([vectors, jnp.ones_like(vectors[..., :1])], axis=-1)


def down_from_homogeneous(vectors):
    """Perspective divide by w."""
    return vectors[..., :-1] / vectors[..., -1:]


class CameraIntrinsics:
    """Base class for batched intrinsics. Ref ``intrinsics.py:85``."""

    def __init__(self, width, height, params, near=DEFAULT_NEAR, far=DEFAULT_FAR,
                 ndc_min=-1.0, ndc_max=1.0):
        self.width = int(width)
        self.height = int(height)
        self.params = params
        self.near = float(near)
        self.far = float(far)
        self.ndc_min = float(ndc_min)
        self.ndc_max = float(ndc_max)

    # -- pytree protocol (shared by subclasses) --
    def tree_flatten(self):
        aux = (self.width, self.height, self.near, self.far,
               self.ndc_min, self.ndc_max)
        return (self.params,), aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        width, height, near, far, ndc_min, ndc_max = aux
        return cls(width, height, children[0], near, far, ndc_min, ndc_max)

    def __len__(self):
        return self.params.shape[0]

    @property
    def dtype(self):
        return self.params.dtype

    def project(self, vectors):
        """Camera space → homogeneous clip space (C, B, 4). Ref pinhole :511."""
        proj = self.projection_matrix()
        v = up_to_homogeneous(vectors)
        if v.ndim == 2:
            v = v[None]
        return jnp.einsum("cij,cbj->cbi", proj, v)

    def transform(self, vectors):
        """Camera space → NDC with perspective divide (C, B, 3). Ref :551."""
        return down_from_homogeneous(self.project(vectors))

    def normalize_depth(self, depth):
        """Camera depth → NDC depth in [min(ndc), max(ndc)]. Ref :578."""
        if depth.ndim < 2:
            depth = jnp.broadcast_to(depth, (len(self),) + depth.shape)
        proj = self.projection_matrix()
        a = -proj[:, 2, 2]
        b = -proj[:, 2, 3]
        depth = jnp.clip(depth, min(self.near, self.far), max(self.near, self.far))
        ndc_depth = a[:, None] - b[:, None] / depth
        lo, hi = min(self.ndc_min, self.ndc_max), max(self.ndc_min, self.ndc_max)
        return jnp.clip(ndc_depth, lo, hi)

    def __getitem__(self, item):
        out = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(self),
            [self.params[item].reshape(-1, self.params.shape[-1])])
        return out

    def aspect_ratio(self):
        """Aspect ratio of the cameras held by this object. Ref :174."""
        return self.width / self.height

    def clip_mask(self, depth):
        """Boolean mask marking which ``depth`` values lie inside the view
        frustum (between near and far). Ref :435."""
        lo, hi = min(self.near, self.far), max(self.near, self.far)
        return (depth >= lo) & (depth <= hi)

    def viewport_matrix(self, vl=0, vr=None, vb=0, vt=None, min_depth=0.0,
                        max_depth=1.0):
        """NDC → pixel-space matrix (general glViewport form), (1, 4, 4).
        x/y NDC in [-1, 1] map to [vl, vr] x [vb, vt]; NDC z in
        [ndc_min, ndc_max] maps to [min_depth, max_depth]. Ref :182."""
        vr = self.width if vr is None else vr
        vt = self.height if vt is None else vt
        vl, vr, vb, vt = float(vl), float(vr), float(vb), float(vt)
        ndc_w, ndc_h = 2.0, 2.0
        ndc_d = self.ndc_max - self.ndc_min
        vw, vh = vr - vl, vt - vb
        dr = max_depth - min_depth
        m = jnp.asarray([
            [vw / ndc_w, 0.0, 0.0, vw / ndc_w + vl],
            [0.0, vh / ndc_h, 0.0, vh / ndc_h + vb],
            [0.0, 0.0, dr / ndc_d,
             -(self.ndc_min / ndc_d) * dr + min_depth],
            [0.0, 0.0, 0.0, 1.0]], dtype=self.dtype)
        return m[None]

    def set_ndc_range(self, ndc_min, ndc_max):
        """Unsupported, matching the reference (ref :516: 'Currently only
        NDC space of [-1, 1] is supported.')."""
        raise NotImplementedError(
            "Currently only NDC space of [-1, 1] is supported.")

    @classmethod
    def cat(cls, intrinsics):
        """Concatenate same-type intrinsics along the batch dim. Ref :556."""
        first = intrinsics[0]
        for other in intrinsics[1:]:
            if type(other) is not type(first) or \
                    (other.width, other.height) != (first.width, first.height):
                raise ValueError("cat needs same-type, same-canvas intrinsics")
        params = jnp.concatenate([i.params for i in intrinsics], axis=0)
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(first), [params])

    # -- differentiable-param machinery (ref :304-434, :148-172) --
    PARAMS = ()  # subclass param slot names, in buffer order

    def parameters(self):
        """The differentiable (C, P) parameter buffer. Ref :281."""
        return self.params

    @classmethod
    def param_types(cls):
        """Names of the per-camera parameter slots, in buffer order.
        Ref :304 (returned as a tuple of strings rather than an IntEnum —
        index == buffer position)."""
        return cls.PARAMS

    def param_count(self):
        """Number of intrinsic parameters per camera. Ref :314."""
        return len(self.param_types())

    def named_params(self):
        """Descriptive list of {name: value} per camera. Ref :321."""
        import numpy as np
        p = np.asarray(self.params)
        return [{name: float(p[c, i])
                 for i, name in enumerate(self.param_types())}
                for c in range(len(self))]

    def gradient_mask(self, *args):
        """Boolean mask over :meth:`parameters` selecting the named params
        as trainable (ref :404). Accepts slot names (e.g. ``'focal_x'``).

        JAX idiom::

            mask = intrinsics.gradient_mask('focal_x', 'focal_y')
            g = jax.grad(loss)(intrinsics.params) * mask
        """
        import numpy as np
        names = self.param_types()
        mask = np.zeros(np.asarray(self.params).shape, dtype=bool)
        for a in args:
            name = a if isinstance(a, str) else a.name
            if name not in names:
                raise ValueError(
                    f"unknown intrinsics param {name!r}; valid: {names}")
            mask[:, names.index(name)] = True
        return jnp.asarray(mask)

    def as_dict(self):
        """JSON/YAML-writable constructor dict (ref :148); round-trips via
        :meth:`from_dict`."""
        import numpy as np
        return {"classname": type(self).__name__,
                "width": self.width, "height": self.height,
                "near": self.near, "far": self.far,
                "ndc_min": self.ndc_min, "ndc_max": self.ndc_max,
                "params": np.asarray(self.params).tolist()}

    @staticmethod
    def from_dict(in_dict, dtype=jnp.float32):
        """Rebuild the right CameraIntrinsics subclass from :meth:`as_dict`
        output. Ref :160."""
        registry = {c.__name__: c for c in CameraIntrinsics.__subclasses__()}
        name = in_dict.get("classname")
        if name not in registry:
            raise ValueError(f"classname {name!r} not a registered "
                             f"CameraIntrinsics subclass: {sorted(registry)}")
        cls = registry[name]
        return cls(in_dict["width"], in_dict["height"],
                   jnp.asarray(in_dict["params"], dtype=dtype),
                   in_dict.get("near", DEFAULT_NEAR),
                   in_dict.get("far", DEFAULT_FAR),
                   in_dict.get("ndc_min", -1.0), in_dict.get("ndc_max", 1.0))


@jax.tree_util.register_pytree_node_class
class PinholeIntrinsics(CameraIntrinsics):
    """Perspective pinhole camera. Params: (x0, y0, focal_x, focal_y).
    Ref ``intrinsics_pinhole.py:34``."""

    PARAMS = ("x0", "y0", "focal_x", "focal_y")

    @classmethod
    def from_focal(cls, width, height, focal_x, focal_y=None, x0=0.0, y0=0.0,
                   near=DEFAULT_NEAR, far=DEFAULT_FAR, num_cameras=1,
                   dtype=jnp.float32):
        """Ref :160."""
        focal_y = focal_x if focal_y is None else focal_y
        params = jnp.broadcast_to(
            jnp.asarray([x0, y0, focal_x, focal_y], dtype=dtype), (num_cameras, 4))
        return cls(width, height, params, near, far)

    @classmethod
    def from_fov(cls, width, height, fov, fov_direction=CameraFOV.VERTICAL,
                 x0=0.0, y0=0.0, near=DEFAULT_NEAR, far=DEFAULT_FAR,
                 num_cameras=1, dtype=jnp.float32):
        """fov in radians. Ref :199."""
        tan_half = math.tan(fov / 2.0)
        aspect = width / 2.0 if fov_direction is CameraFOV.HORIZONTAL else height / 2.0
        focal = aspect / tan_half
        return cls.from_focal(width, height, focal, focal, x0, y0, near, far,
                              num_cameras, dtype)

    @property
    def lens_type(self):
        return "pinhole"

    x0 = property(lambda self: self.params[:, 0])
    y0 = property(lambda self: self.params[:, 1])
    focal_x = property(lambda self: self.params[:, 2])
    focal_y = property(lambda self: self.params[:, 3])

    @property
    def cx(self):
        """Principal point x in image coords. Ref :649."""
        return self.params[:, 0] + self.width / 2

    @property
    def cy(self):
        return self.params[:, 1] + self.height / 2

    def tan_half_fov(self, camera_fov_direction=CameraFOV.VERTICAL):
        """Ref :680."""
        if camera_fov_direction is CameraFOV.HORIZONTAL:
            return (self.width / 2.0) / self.focal_x
        if camera_fov_direction is CameraFOV.VERTICAL:
            return (self.height / 2.0) / self.focal_y
        diag = math.sqrt(self.width ** 2 + self.height ** 2) / 2.0
        return diag / self.focal_x

    def fov(self, camera_fov_direction=CameraFOV.VERTICAL, in_degrees=True):
        """Ref :698."""
        f = 2.0 * jnp.arctan(self.tan_half_fov(camera_fov_direction))
        return jnp.rad2deg(f) if in_degrees else f

    def perspective_matrix(self):
        """(C, 4, 4), ref :262 — intrinsic matrix in homogeneous form."""
        zero = jnp.zeros_like(self.focal_x)
        one = jnp.ones_like(self.focal_x)
        rows = [
            jnp.stack([self.focal_x, zero, -self.x0, zero], axis=-1),
            jnp.stack([zero, self.focal_y, -self.y0, zero], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
            jnp.stack([zero, zero, one, zero], axis=-1),
        ]
        return jnp.stack(rows, axis=1)

    def ndc_matrix(self, left, right, bottom, top, near, far):
        """(1, 4, 4) frustum→clip matrix; see ref :313 for the U/V derivation."""
        tx = -(right + left) / (right - left)
        ty = -(top + bottom) / (top - bottom)
        if self.ndc_min == -1 and self.ndc_max == 1:
            U = -2.0 * near * far / (far - near)
            V = -(far + near) / (far - near)
        elif self.ndc_min == 0 and self.ndc_max == 1:
            U = (near * far) / (near - far)
            V = far / (far - near)
        elif self.ndc_min == 1 and self.ndc_max == 0:
            U = (near * far) / (far - near)
            V = near / (far - near)
        else:
            raise NotImplementedError(
                f"NDC range [{self.ndc_min}, {self.ndc_max}] unsupported")
        m = jnp.asarray([
            [2.0 / (right - left), 0.0, 0.0, -tx],
            [0.0, 2.0 / (top - bottom), 0.0, -ty],
            [0.0, 0.0, U, V],
            [0.0, 0.0, 0.0, -1.0],
        ], dtype=self.dtype)
        return m[None]

    def projection_matrix(self):
        """OpenGL-compatible projection (C, 4, 4). Ref :484."""
        persp = self.perspective_matrix()
        top = self.height / 2
        right = self.width / 2
        ndc = self.ndc_matrix(-right, right, -top, top, self.near, self.far)
        return ndc @ persp

    def zoom(self, amount):
        """Zoom in by DECREASING fov_y by ``amount`` degrees while keeping
        the fov_x/fov_y RATIO constant (undistorted view), exactly like the
        reference (ref :751-763: ``fov_y -= amount; fov_x = fov_y *
        fov_ratio``). Pure — returns the adjusted intrinsics."""
        fov_y = jnp.deg2rad(self.fov(CameraFOV.VERTICAL))
        fov_x = jnp.deg2rad(self.fov(CameraFOV.HORIZONTAL))
        new_fov_y = fov_y - jnp.deg2rad(jnp.asarray(amount,
                                                    self.params.dtype))
        new_fov_x = new_fov_y * fov_x / fov_y
        focal_y = (self.height / 2) / jnp.tan(new_fov_y / 2.0)
        focal_x = (self.width / 2) / jnp.tan(new_fov_x / 2.0)
        params = self.params.at[:, 2].set(focal_x).at[:, 3].set(focal_y)
        return PinholeIntrinsics(self.width, self.height, params, self.near,
                                 self.far, self.ndc_min, self.ndc_max)


@jax.tree_util.register_pytree_node_class
class OrthographicIntrinsics(CameraIntrinsics):
    """Orthographic camera. Params: (fov_distance,). Ref ``intrinsics_ortho.py:35``."""

    PARAMS = ("fov_distance",)

    @classmethod
    def from_frustum(cls, width, height, fov_distance=1.0, near=DEFAULT_NEAR,
                     far=DEFAULT_FAR, num_cameras=1, dtype=jnp.float32):
        """Ref :96."""
        params = jnp.broadcast_to(
            jnp.asarray([fov_distance], dtype=dtype), (num_cameras, 1))
        return cls(width, height, params, near, far)

    @property
    def lens_type(self):
        return "ortho"

    fov_distance = property(lambda self: self.params[:, 0])

    def orthographic_matrix(self, left, right, bottom, top, near, far):
        """(C, 4, 4). Ref :125."""
        fov = self.fov_distance
        zero = jnp.zeros_like(fov)
        one = jnp.ones_like(fov)
        tx = jnp.full_like(fov, -(right + left) / (right - left))
        ty = jnp.full_like(fov, -(top + bottom) / (top - bottom))
        tz = jnp.full_like(fov, -(far + near) / (far - near))
        W = right - left
        H = top - bottom
        D = jnp.full_like(fov, far - near)
        rows = [
            jnp.stack([2.0 / (fov * W), zero, zero, tx], axis=-1),
            jnp.stack([zero, 2.0 / (fov * H), zero, ty], axis=-1),
            jnp.stack([zero, zero, -2.0 / D, tz], axis=-1),
            jnp.stack([zero, zero, zero, one], axis=-1),
        ]
        return jnp.stack(rows, axis=1)

    def projection_matrix(self):
        """Ref :181 — unit-height frustum scaled by aspect."""
        top = 1.0
        right = 1.0 * self.width / self.height
        return self.orthographic_matrix(-right, right, -top, top,
                                        self.near, self.far)

    def zoom(self, amount):
        """Ref :275."""
        params = jnp.clip(self.params + amount, 1e-5, None)
        return OrthographicIntrinsics(self.width, self.height, params, self.near,
                                      self.far, self.ndc_min, self.ndc_max)


class IntrinsicsParamsDefEnum(enum.IntEnum):
    """Base for enums naming the slots of an intrinsics params vector."""


class PinholeParamsDefEnum(IntrinsicsParamsDefEnum):
    """Pinhole params layout (ref intrinsics_pinhole.py:27); axis skew is
    always assumed zero."""
    x0 = 0
    y0 = 1
    focal_x = 2
    focal_y = 3


class OrthoParamsDefEnum(IntrinsicsParamsDefEnum):
    """Orthographic params layout (ref intrinsics_ortho.py:26): a single
    zoom scale, measured in distance units."""
    fov_distance = 0


def allclose(input, other, rtol=1e-05, atol=1e-08, equal_nan=False):
    """Elementwise-closeness of two CameraIntrinsics of the same lens type
    and canvas. Ref intrinsics.py (allclose)."""
    import numpy as np
    return (type(input) is type(other)
            and input.width == other.width and input.height == other.height
            and np.isclose(input.near, other.near, rtol=rtol, atol=atol)
            and np.isclose(input.far, other.far, rtol=rtol, atol=atol)
            and np.asarray(input.params).shape == np.asarray(other.params).shape
            and bool(np.allclose(np.asarray(input.params),
                                 np.asarray(other.params), rtol=rtol,
                                 atol=atol, equal_nan=equal_nan)))
