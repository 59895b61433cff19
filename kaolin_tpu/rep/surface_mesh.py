"""SurfaceMesh — the central mesh attribute container.

TPU-native analog of reference ``kaolin/rep/surface_mesh.py:34``: an
attribute container with three batching strategies (NONE / FIXED / LIST) and
a lazy auto-compute graph (face_vertices, face_normals, face_uvs,
vertex_normals, vertex_tangents, ... — see the attribute table in the
reference docstring :120-256).

Arrays are jnp (LIST batching holds python lists of arrays, host-side
convenience). Auto-computed attributes are cached on access like the
reference; ``allow_auto_compute=False`` disables that.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np

__all__ = ["SurfaceMesh"]

_FLOAT_ATTRS = [
    "vertices", "face_vertices", "normals", "face_normals", "vertex_normals",
    "uvs", "face_uvs", "vertex_tangents", "vertex_colors", "vertex_features",
    "face_tangents", "face_colors", "face_features", "transform",
]
_INT_ATTRS = ["faces", "face_normals_idx", "face_uvs_idx",
              "material_assignments"]
_TENSOR_ATTRS = _FLOAT_ATTRS + _INT_ATTRS
_MISC_ATTRS = ["materials", "batching", "allow_auto_compute",
               "unset_attributes_return_none"]

# ways an attribute can be auto-computed, in priority order (ref :226-246)
_COMPUTABLE = {
    "vertex_normals": [["faces", "face_normals"]],
    "vertex_tangents": [["faces", "face_vertices", "face_uvs",
                         "vertex_normals"]],
    "vertex_colors": [["faces", "face_colors"]],
    "vertex_features": [["faces", "face_features"]],
    "face_vertices": [["faces", "vertices"]],
    "face_normals": [["normals", "face_normals_idx"],
                     ["vertex_normals", "faces"],
                     ["vertices", "faces"]],
    "face_uvs": [["uvs", "face_uvs_idx"]],
    "face_tangents": [["vertex_tangents", "faces"]],
    "face_colors": [["vertex_colors", "faces"]],
    "face_features": [["vertex_features", "faces"]],
}


class SurfaceMesh:
    """Batched surface mesh container with lazy attribute compute. Ref :34."""

    class Batching(str, enum.Enum):
        NONE = "NONE"
        FIXED = "FIXED"
        LIST = "LIST"

    def __init__(self, vertices=None, faces=None,
                 batching=None, allow_auto_compute=True,
                 unset_attributes_return_none=True, strict_checks=True,
                 **kwargs):
        object.__setattr__(self, "_attrs", {})
        if batching is None:
            if isinstance(vertices, (list, tuple)):
                batching = SurfaceMesh.Batching.LIST
            elif vertices is not None and jnp.asarray(vertices).ndim == 3:
                batching = SurfaceMesh.Batching.FIXED
            else:
                batching = SurfaceMesh.Batching.NONE
        object.__setattr__(self, "batching", SurfaceMesh.Batching(batching))
        object.__setattr__(self, "allow_auto_compute", allow_auto_compute)
        object.__setattr__(self, "unset_attributes_return_none",
                           unset_attributes_return_none)
        object.__setattr__(self, "materials", kwargs.pop("materials", None))
        if vertices is not None:
            self._attrs["vertices"] = self._wrap(vertices)
        if faces is not None:
            self._attrs["faces"] = self._wrap(faces)
        for k, v in kwargs.items():
            if k not in _TENSOR_ATTRS:
                raise TypeError(f"unknown SurfaceMesh attribute {k!r}")
            if v is not None:
                self._attrs[k] = self._wrap(v)

    def _wrap(self, v):
        if isinstance(v, (list, tuple)):
            return [jnp.asarray(x) for x in v]
        return jnp.asarray(v)

    # -- attribute protocol --
    def __getattr__(self, name):
        if name.startswith("_") or name in _MISC_ATTRS:
            raise AttributeError(name)
        if name in self._attrs:
            return self._attrs[name]
        if name in _COMPUTABLE and self.allow_auto_compute:
            val = self._compute_attribute(name)
            if val is not None:
                self._attrs[name] = val
                return val
        if name in _TENSOR_ATTRS:
            if self.unset_attributes_return_none:
                return None
            raise AttributeError(f"attribute {name} is not set")
        raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in _TENSOR_ATTRS:
            if value is None:
                self._attrs.pop(name, None)
            else:
                self._attrs[name] = self._wrap(value)
            # invalidate derived caches
            for derived, reqs in _COMPUTABLE.items():
                if derived != name and any(name in r for r in reqs):
                    self._attrs.pop(derived, None)
        else:
            object.__setattr__(self, name, value)

    def has_attribute(self, name):
        """Ref :698."""
        return name in self._attrs or (name in _MISC_ATTRS
                                       and getattr(self, name) is not None)

    def has_or_can_compute_attribute(self, name, _visited=None):
        """Ref :713."""
        return self.has_attribute(name) or \
            self.probably_can_compute_attribute(name, _visited)

    def probably_can_compute_attribute(self, name, _visited=None):
        """Ref :728. ``_visited`` breaks dependency cycles
        (face_normals ↔ vertex_normals)."""
        if name not in _COMPUTABLE:
            return False
        visited = set() if _visited is None else _visited
        if name in visited:
            return False
        visited = visited | {name}
        return any(all(self.has_or_can_compute_attribute(r, visited)
                       for r in req if r != name)
                   for req in _COMPUTABLE[name])

    def get_attributes(self, only_tensors=False):
        """Ref :746."""
        out = list(self._attrs.keys())
        if not only_tensors and self.materials is not None:
            out.append("materials")
        return out

    # -- auto-compute (ref :1475) --
    def _compute_attribute(self, name):
        in_progress = getattr(self, "_computing", None)
        if in_progress is None:
            in_progress = set()
            object.__setattr__(self, "_computing", in_progress)
        if name in in_progress:
            return None  # cycle (e.g. face_normals ↔ vertex_normals)
        in_progress.add(name)
        try:
            for req in _COMPUTABLE[name]:
                vals = []
                ok = True
                for r in req:
                    v = getattr(self, r, None)
                    if v is None:
                        ok = False
                        break
                    vals.append(v)
                if ok:
                    return getattr(self, f"_compute_{name}")(*vals)
            return None
        finally:
            in_progress.discard(name)

    def _map(self, fn, *attrs):
        """Apply fn per item under the batching strategy."""
        if self.batching == SurfaceMesh.Batching.LIST:
            n = len(attrs[0])
            return [fn(*[a[i] for a in attrs]) for i in range(n)]
        return fn(*attrs)

    def _compute_face_vertices(self, faces, vertices):
        def one(f, v):
            if v.ndim == 3:  # FIXED
                return v[:, f]
            return v[f]
        return self._map(lambda f, v: one(f, v), faces, vertices)

    def _compute_face_uvs(self, uvs, face_uvs_idx):
        def one(u, fi):
            if u.ndim == 3:
                return u[:, jnp.clip(fi, 0, None)]
            return u[jnp.clip(fi, 0, None)]
        return self._map(one, uvs, face_uvs_idx)

    def _compute_face_normals(self, a, b):
        # three signatures by priority
        for req in _COMPUTABLE["face_normals"]:
            if all(getattr(self, r, None) is not None for r in req):
                kind = req[0]
                break
        if kind == "normals":  # normals + face_normals_idx
            return self._compute_face_uvs(self.normals, self.face_normals_idx)
        if kind == "vertex_normals":
            return self._compute_face_vertices(self.faces, self.vertex_normals)
        # flat normals from vertices + faces, repeated per corner
        from kaolin_tpu.ops.mesh import face_normals as fnormals

        def one(v, f):
            fv = v[:, f] if v.ndim == 3 else v[f][None]
            n = fnormals(fv, unit=True)
            out = jnp.broadcast_to(n[:, :, None, :],
                                   n.shape[:2] + (f.shape[-1], 3))
            return out if v.ndim == 3 else out[0]
        return self._map(one, self.vertices, self.faces)

    def _compute_vertex_normals(self, faces, face_normals):
        from kaolin_tpu.ops.mesh import compute_vertex_normals

        def one(f, fn):
            batched = fn.ndim == 4
            fn_ = fn if batched else fn[None]
            out = compute_vertex_normals(f, fn_, num_vertices=self._num_verts(f))
            return out if batched else out[0]
        return self._map(one, faces, face_normals)

    def _num_verts(self, faces):
        v = self._attrs.get("vertices")
        if v is None:
            return int(np.asarray(faces).max()) + 1
        if isinstance(v, list):
            return None
        return v.shape[-2]

    def _compute_vertex_colors(self, faces, face_colors):
        return self._compute_vertex_normals(faces, face_colors)

    def _compute_vertex_features(self, faces, face_features):
        return self._compute_vertex_normals(faces, face_features)

    def _compute_vertex_tangents(self, faces, face_vertices, face_uvs,
                                 vertex_normals):
        from kaolin_tpu.ops.mesh import vertex_tangents as vt

        def one(f, fv, fu, vn):
            if fv.ndim == 4:
                return jnp.stack([vt(f, fv[i], fu[i], vn[i])
                                  for i in range(fv.shape[0])])
            return vt(f, fv, fu, vn)
        return self._map(one, faces, face_vertices, face_uvs, vertex_normals)

    def _compute_face_tangents(self, vertex_tangents, faces):
        return self._compute_face_vertices(faces, vertex_tangents)

    def _compute_face_colors(self, vertex_colors, faces):
        return self._compute_face_vertices(faces, vertex_colors)

    def _compute_face_features(self, vertex_features, faces):
        return self._compute_face_vertices(faces, vertex_features)

    # -- batching (ref :955, :1033) --
    def __len__(self):
        v = self._attrs.get("vertices")
        if self.batching == SurfaceMesh.Batching.NONE:
            return 1
        if self.batching == SurfaceMesh.Batching.LIST:
            return len(v)
        return v.shape[0]

    def to_batched(self):
        """NONE → FIXED with batch dim 1. Ref :1000."""
        assert self.batching == SurfaceMesh.Batching.NONE
        kwargs = {}
        for k, v in self._attrs.items():
            if k in ("faces", "face_normals_idx", "face_uvs_idx",
                     "material_assignments"):
                kwargs[k] = v  # fixed topology: unbatched
            else:
                kwargs[k] = v[None]
        return SurfaceMesh(batching=SurfaceMesh.Batching.FIXED,
                           allow_auto_compute=self.allow_auto_compute,
                           materials=self.materials, **kwargs)

    @classmethod
    def cat(cls, meshes, fixed_topology=True, skip_errors=False):
        """Concatenate same-attribute meshes. Ref :1033."""
        metas = [m.to_batched() if m.batching == cls.Batching.NONE else m
                 for m in meshes]
        if fixed_topology:
            kwargs = {}
            common = set.intersection(*[set(m._attrs.keys()) for m in metas])
            for k in common:
                if k in _INT_ATTRS:
                    kwargs[k] = metas[0]._attrs[k]
                else:
                    kwargs[k] = jnp.concatenate(
                        [m._attrs[k] for m in metas], axis=0)
            return cls(batching=cls.Batching.FIXED, **kwargs)
        # LIST batching
        kwargs = {}
        common = set.intersection(*[set(m._attrs.keys()) for m in metas])
        for k in common:
            vals = []
            for m in metas:
                v = m._attrs[k]
                if isinstance(v, list):
                    vals.extend(v)
                elif k in _INT_ATTRS:
                    vals.extend([v] * len(m))
                else:
                    vals.extend([v[i] for i in range(v.shape[0])])
            kwargs[k] = vals
        return cls(batching=cls.Batching.LIST, **kwargs)

    def float_tensors_to(self, dtype):
        for k in list(self._attrs):
            if k in _FLOAT_ATTRS:
                v = self._attrs[k]
                self._attrs[k] = ([x.astype(dtype) for x in v]
                                  if isinstance(v, list) else v.astype(dtype))
        return self

    def as_transformed(self, transform):
        """Return a mesh with vertices transformed by a 4x4 matrix.
        Ref :1648."""
        v = self.vertices
        m = jnp.asarray(transform)

        def apply(verts):
            vh = jnp.concatenate([verts, jnp.ones_like(verts[..., :1])], -1)
            return (vh @ m.T)[..., :3]

        out = SurfaceMesh(batching=self.batching,
                          allow_auto_compute=self.allow_auto_compute,
                          materials=self.materials)
        for k, val in self._attrs.items():
            out._attrs[k] = val
        out._attrs = dict(out._attrs)
        out._attrs["vertices"] = (
            [apply(x) for x in v] if isinstance(v, list) else apply(v))
        for derived in ("face_vertices", "face_normals", "vertex_normals",
                        "vertex_tangents", "face_tangents"):
            out._attrs.pop(derived, None)
        return out

    def __repr__(self):
        attrs = ", ".join(sorted(self._attrs.keys()))
        return (f"SurfaceMesh(batching={self.batching.value}, "
                f"len={len(self)}, attrs=[{attrs}])")

    def describe_attribute(self, name):
        v = self._attrs.get(name)
        if v is None:
            return f"{name}: unset"
        if isinstance(v, list):
            return f"{name}: list of {len(v)} arrays"
        return f"{name}: {tuple(v.shape)} {v.dtype}"
