"""Camera extrinsics — world→camera rigid transform, as a JAX pytree.

TPU-native analog of reference ``kaolin/render/camera/extrinsics.py:51``.
The reference keeps swappable "param backends" (_MatrixSE3Rep,
_Matrix6DofRotationRep) to control which parameterization gradients flow
through; here the same is achieved functionally: parameters are a flat array
``params`` whose interpretation is picked by ``backend``:

* ``matrix_se3`` — params is the flattened (C, 12) [R | t] view matrix rows.
* ``matrix_6dof_rotation`` — params is (C, 9): two 3-vectors spanning the
  rotation (Gram-Schmidt orthonormalized on materialization — Zhou et al.'s
  6DoF continuous rotation rep) plus translation.

All methods are pure (return new objects); the class is a registered pytree
so cameras pass through jit/vmap/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["CameraExtrinsics"]


def _to_batched_3(x, dtype):
    x = jnp.asarray(x, dtype=dtype)
    x = x.reshape(-1, 3) if x.ndim <= 2 and x.size % 3 == 0 else x
    if x.ndim == 1:
        x = x[None]
    return x


@jax.tree_util.register_pytree_node_class
class CameraExtrinsics:
    """Batched world→camera transform: x_cam = R x_world + t. Ref :51."""

    def __init__(self, params, backend="matrix_se3", base_change=None):
        self.params = params
        self.backend = backend
        # accumulated coordinate-system basis change (ref
        # _base_change_matrix :1103); kept as a hashable tuple so it can
        # ride in pytree aux. None ≡ identity.
        self._base_change = base_change

    # -- pytree protocol --
    def tree_flatten(self):
        return (self.params,), (self.backend, self._base_change)

    @classmethod
    def tree_unflatten(cls, aux, children):
        if isinstance(aux, tuple):
            backend, base_change = aux
        else:  # legacy aux layout
            backend, base_change = aux, None
        return cls(children[0], backend=backend, base_change=base_change)

    # -- constructors --
    @classmethod
    def _from_R_t(cls, R, t, backend="matrix_se3"):
        if backend == "matrix_se3":
            params = jnp.concatenate([R.reshape(-1, 9), t.reshape(-1, 3)], axis=-1)
        elif backend == "matrix_6dof_rotation":
            params = jnp.concatenate([R[:, 0, :], R[:, 1, :], t.reshape(-1, 3)],
                                     axis=-1)
        else:
            from kaolin_tpu.render.camera.extrinsics_backends import get_backend
            rep = get_backend(backend)
            if rep is None:
                raise ValueError(f"unknown extrinsics backend {backend!r}")
            params = rep.params_from_Rt(R, t.reshape(-1, 3))
        return cls(params, backend=backend)

    @classmethod
    def from_lookat(cls, eye, at, up, dtype=jnp.float32, backend="matrix_se3"):
        """glm-compatible right-handed lookat. Ref :342."""
        eye = _to_batched_3(eye, dtype)
        at = _to_batched_3(at, dtype)
        up = _to_batched_3(up, dtype)
        backward = at - eye
        backward = backward / jnp.linalg.norm(backward, axis=-1, keepdims=True)
        right = jnp.cross(backward, up)
        right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
        up = jnp.cross(right, backward)
        R = jnp.stack([right, up, -backward], axis=1)  # (C, 3, 3)
        t = -jnp.einsum("cij,cj->ci", R, eye)
        return cls._from_R_t(R, t, backend)

    @classmethod
    def from_camera_pose(cls, cam_pos, cam_dir, dtype=jnp.float32,
                         backend="matrix_se3"):
        """From camera world position (C,3) and orientation matrix (C,3,3)
        (camera axes as rows in world space). Ref :290."""
        cam_pos = _to_batched_3(cam_pos, dtype)
        cam_dir = jnp.asarray(cam_dir, dtype=dtype)
        if cam_dir.ndim == 2:
            cam_dir = cam_dir[None]
        R = jnp.swapaxes(cam_dir, -1, -2)
        t = -jnp.einsum("cij,cj->ci", R, cam_pos)
        return cls._from_R_t(R, t, backend)

    @classmethod
    def from_view_matrix(cls, view_matrix, dtype=jnp.float32, backend="matrix_se3"):
        """From a (C, 4, 4) column-major world→camera matrix. Ref :430."""
        m = jnp.asarray(view_matrix, dtype=dtype)
        if m.ndim == 2:
            m = m[None]
        return cls._from_R_t(m[:, :3, :3], m[:, :3, 3], backend)

    # -- materialization --
    @property
    def R(self):
        """(C, 3, 3) rotation. Ref :563."""
        if self.backend == "matrix_se3":
            return self.params[:, :9].reshape(-1, 3, 3)
        if self.backend not in ("matrix_6dof_rotation",):
            from kaolin_tpu.render.camera.extrinsics_backends import get_backend
            return get_backend(self.backend).R(self.params)
        # 6dof: Gram-Schmidt the two stored rows, third = cross
        a1 = self.params[:, 0:3]
        a2 = self.params[:, 3:6]
        b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12, None)
        a2p = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
        b2 = a2p / jnp.clip(jnp.linalg.norm(a2p, axis=-1, keepdims=True), 1e-12, None)
        b3 = jnp.cross(b1, b2)
        return jnp.stack([b1, b2, b3], axis=1)

    @property
    def t(self):
        """(C, 3, 1) translation. Ref :612."""
        if self.backend not in ("matrix_se3", "matrix_6dof_rotation"):
            from kaolin_tpu.render.camera.extrinsics_backends import get_backend
            return get_backend(self.backend).t(self.params)
        return self.params[:, -3:, None]

    def __len__(self):
        return self.params.shape[0]

    @property
    def dtype(self):
        return self.params.dtype

    # -- API --
    def switch_backend(self, backend_name):
        """Re-parameterize (gradients will flow through the new params).
        Ref :175."""
        return CameraExtrinsics._from_R_t(self.R, self.t[..., 0], backend_name)

    def view_matrix(self):
        """(C, 4, 4) column-major world→camera matrix. Ref :706."""
        c = len(self)
        m = jnp.broadcast_to(jnp.eye(4, dtype=self.dtype), (c, 4, 4))
        m = m.at[:, :3, :3].set(self.R)
        return m.at[:, :3, 3].set(self.t[..., 0])

    def inv_view_matrix(self):
        """(C, 4, 4) camera→world matrix. Ref :753."""
        R = self.R
        Rt = jnp.swapaxes(R, -1, -2)
        c = len(self)
        m = jnp.broadcast_to(jnp.eye(4, dtype=self.dtype), (c, 4, 4))
        m = m.at[:, :3, :3].set(Rt)
        return m.at[:, :3, 3].set(-jnp.einsum("cij,cj->ci", Rt, self.t[..., 0]))

    def update(self, mat):
        """Replace the view matrix. Ref :793."""
        return CameraExtrinsics.from_view_matrix(mat, dtype=self.dtype,
                                                 backend=self.backend)

    def transform(self, vectors):
        """World → camera coords. vectors (B, 3) or (C, B, 3) → (C, B, 3).
        Ref :645."""
        if vectors.ndim == 2:
            vectors = vectors[None]
        return jnp.einsum("cij,cbj->cbi", self.R, vectors) + self.t[:, None, :, 0]

    def inv_transform_rays(self, ray_orig, ray_dir):
        """Camera → world for ray bundles. Ref :671."""
        if ray_orig.ndim == 2:
            ray_orig = ray_orig[None]
        if ray_dir.ndim == 2:
            ray_dir = ray_dir[None]
        Rt = jnp.swapaxes(self.R, -1, -2)
        d = jnp.einsum("cij,cbj->cbi", Rt, ray_dir)
        o = jnp.einsum("cij,cbj->cbi", Rt, ray_orig - self.t[:, None, :, 0])
        return o, d

    def cam_pos(self):
        """Camera center in world coords (C, 3, 1)."""
        Rt = jnp.swapaxes(self.R, -1, -2)
        return -jnp.einsum("cij,cj->ci", Rt, self.t[..., 0])[..., None]

    def cam_right(self):
        return self.R[:, 0, :, None]

    def cam_up(self):
        return self.R[:, 1, :, None]

    def cam_forward(self):
        """Camera forward axis in world coords — reference convention
        (ref :968-975: R^T e_z, the scratchapixel lookat 'forward' pointing
        from target TOWARD the camera; the viewing direction is its
        negation)."""
        return self.R[:, 2, :, None]

    # -- rigid manipulation (pure: returns new extrinsics) --
    def _update_R_t(self, R, t):
        out = CameraExtrinsics._from_R_t(R, t, self.backend)
        out._base_change = self._base_change
        return out

    def translate(self, t):
        """Translate the camera in world space: cam_pos moves by +t, axes
        unchanged (ref :802-818, ``self.t -= self.R @ t``)."""
        t = jnp.asarray(t, dtype=self.dtype).reshape(-1, 3)
        return self._update_R_t(self.R,
                                self.t[..., 0] - jnp.einsum("cij,cj->ci", self.R, t))

    def rotate(self, yaw=None, pitch=None, roll=None):
        """Rotate in camera space by yaw (around up), pitch (around right),
        roll (around forward). Ref :820."""
        c = len(self)
        rot = jnp.broadcast_to(jnp.eye(3, dtype=self.dtype), (c, 3, 3))

        def axis_rot(angle, axis):
            angle = jnp.broadcast_to(jnp.asarray(angle, dtype=self.dtype), (c,))
            cos, sin = jnp.cos(angle), jnp.sin(angle)
            one = jnp.ones_like(cos)
            zero = jnp.zeros_like(cos)
            # reference matrix layouts (ref :820-880)
            if axis == 0:  # pitch: around x/right
                rows = [[one, zero, zero], [zero, cos, sin], [zero, -sin, cos]]
            elif axis == 1:  # yaw: around y/up
                rows = [[cos, zero, -sin], [zero, one, zero], [sin, zero, cos]]
            else:  # roll: around z/forward
                rows = [[cos, -sin, zero], [sin, cos, zero], [zero, zero, one]]
            return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)

        if yaw is not None:
            rot = axis_rot(yaw, 1) @ rot
        if pitch is not None:
            rot = axis_rot(pitch, 0) @ rot
        if roll is not None:
            rot = axis_rot(roll, 2) @ rot
        return self._update_R_t(rot @ self.R,
                                jnp.einsum("cij,cj->ci", rot, self.t[..., 0]))

    def move_right(self, amount):
        """Ref :898."""
        return self._shift_cam(jnp.asarray([amount, 0.0, 0.0], dtype=self.dtype))

    def move_up(self, amount):
        """Ref :907."""
        return self._shift_cam(jnp.asarray([0.0, amount, 0.0], dtype=self.dtype))

    def move_forward(self, amount):
        """t ← t − e_z·amount: moves the camera along its forward axis
        (ref :916-923)."""
        return self._shift_cam(jnp.asarray([0.0, 0.0, amount], dtype=self.dtype))

    def _shift_cam(self, delta_cam):
        t = self.t[..., 0] - delta_cam[None, :]
        return self._update_R_t(self.R, t)

    def change_coordinate_system(self, basis_change):
        """Apply a (3, 3) axes permutation/reflection: ``R ← R @ Pᵀ``
        (rotating the world axes about the origin; t unchanged), exactly the
        reference's transform (ref :495, R update at :577-580). Pure."""
        p = jnp.asarray(basis_change, dtype=self.dtype)
        R = self.R @ p.T[None]
        out = self._update_R_t(R, self.t[..., 0])
        prev = (np.eye(3) if self._base_change is None
                else np.asarray(self._base_change))
        out._base_change = tuple(
            tuple(float(x) for x in row) for row in np.asarray(p) @ prev)
        return out

    @property
    def basis_change_matrix(self):
        """The accumulated coordinate-system change (permutation +
        reflections) applied via :meth:`change_coordinate_system`; (3, 3).
        Ref :1103."""
        if self._base_change is None:
            return jnp.eye(3, dtype=self.dtype)
        return jnp.asarray(self._base_change, dtype=self.dtype)

    def reset_coordinate_system(self):
        """Undo every accumulated :meth:`change_coordinate_system`, back to
        the default right-handed cartesian basis. Pure (returns a new
        extrinsics, unlike the reference's in-place :557)."""
        if self._base_change is None:
            return self
        out = self.change_coordinate_system(self.basis_change_matrix.T)
        out._base_change = None
        return out

    @classmethod
    def available_backends(cls):
        """Names of registered parameterization backends. Ref :1170."""
        from kaolin_tpu.render.camera.extrinsics_backends import (
            _BACKEND_REGISTRY)
        return ("matrix_se3", "matrix_6dof_rotation",
                *_BACKEND_REGISTRY.keys())

    @classmethod
    def cat(cls, extrinsics):
        """Concatenate same-backend extrinsics along the batch dim.
        Ref :1180 (coordinate system taken from the first, like the
        reference)."""
        first = extrinsics[0]
        for other in extrinsics[1:]:
            if other.backend != first.backend:
                raise ValueError("cat needs same-backend extrinsics")
        params = jnp.concatenate([e.params for e in extrinsics], axis=0)
        return cls(params, backend=first.backend,
                   base_change=first._base_change)

    def __getitem__(self, item):
        return CameraExtrinsics(self.params[item].reshape(-1, self.params.shape[-1]),
                                backend=self.backend,
                                base_change=self._base_change)

    def __repr__(self):
        return (f"CameraExtrinsics(num_cameras={len(self)}, "
                f"backend={self.backend!r})")

    def named_params(self):
        return [{"R": np.asarray(self.R[i]), "t": np.asarray(self.t[i, :, 0])}
                for i in range(len(self))]

    # -- differentiable-param machinery (ref :977-1146) --
    def parameters(self):
        """The backend-dependent differentiable parameter buffer (C, P).
        Ref :977."""
        return self.params

    def param_idx(self, param):
        """Indices of ``param`` (an :class:`ExtrinsicsParamsDefEnum` or its
        string name) inside the params vector; backend dependent. Ref
        extrinsics_backends.py:96,172,251."""
        from kaolin_tpu.render.camera.extrinsics_backends import (
            ExtrinsicsParamsDefEnum, get_backend)
        if isinstance(param, str):
            param = ExtrinsicsParamsDefEnum[param]
        if self.backend == "matrix_se3":
            # row-major 3x4 [R|t]... our layout is 9 R entries then 3 t
            return (list(range(9)) if param == ExtrinsicsParamsDefEnum.R
                    else [9, 10, 11])
        if self.backend == "matrix_6dof_rotation":
            return (list(range(6)) if param == ExtrinsicsParamsDefEnum.R
                    else [6, 7, 8])
        rep = get_backend(self.backend)
        if rep is None or not hasattr(rep, "param_idx"):
            raise ValueError(
                f"backend {self.backend!r} does not define param_idx")
        return rep.param_idx(param)

    def gradient_mask(self, *args):
        """Boolean mask over :meth:`parameters` selecting the named params as
        trainable (ref :1112). The 3 camera axes (R) are always masked
        together, keeping the view matrix orthogonalizable.

        JAX idiom — multiply the cotangent rather than registering a hook::

            mask = extrinsics.gradient_mask('t')
            g = jax.grad(loss)(extrinsics.params)
            g = g * mask                       # only translation trains
        """
        mask = np.zeros(np.asarray(self.params).shape, dtype=bool)
        for param in args:
            mask[:, self.param_idx(param)] = True
        return jnp.asarray(mask)

    def to_dict(self):
        """JSON/YAML-writable constructor dict; round-trips via
        :meth:`from_dict`."""
        out = {"classname": "CameraExtrinsics",
               "backend": self.backend,
               "params": np.asarray(self.params).tolist()}
        if self._base_change is not None:
            out["base_change"] = [list(r) for r in self._base_change]
        return out

    def as_dict(self):
        """Alias of :meth:`to_dict` (reference naming)."""
        return self.to_dict()

    @classmethod
    def from_dict(cls, d, dtype=jnp.float32):
        if d.get("classname") != "CameraExtrinsics":
            raise ValueError(f"not a CameraExtrinsics dict: {d.get('classname')}")
        bc = d.get("base_change")
        if bc is not None:
            bc = tuple(tuple(float(x) for x in row) for row in bc)
        return cls(jnp.asarray(d["params"], dtype=dtype),
                   backend=d["backend"], base_change=bc)


def allclose(input, other, rtol=1e-05, atol=1e-08, equal_nan=False):
    """Elementwise-closeness of two CameraExtrinsics (same backend and
    close params). Ref extrinsics.py:1240."""
    import numpy as np
    return (input.backend == other.backend
            and np.asarray(input.params).shape == np.asarray(other.params).shape
            and bool(np.allclose(np.asarray(input.params),
                                 np.asarray(other.params), rtol=rtol,
                                 atol=atol, equal_nan=equal_nan)))
