"""Point-sample and 3D-gaussian-splat containers.

TPU-native analog of reference ``kaolin/rep/gaussians.py`` (PointSamples :41,
GaussianSplatModel :537): per-point attribute containers with boolean-mask
get/set, cat, canonical transform handling, and SH-degree helpers. All
attributes are stored post-activation like the reference (:639).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.rep.tensor_container import TensorContainerBase

__all__ = ["PointSamples", "GaussianSplatModel"]


class PointSamples(TensorContainerBase):
    """Generic per-point container: positions (N, 3) + optional features
    (N, D) + optional canonical 4x4 transform. Ref :41."""

    @classmethod
    def class_tensor_attributes(cls):
        return ["positions", "features", "transform"]

    @classmethod
    def class_other_attributes(cls):
        return []

    @classmethod
    def class_point_attributes(cls):
        return ["positions", "features"]

    def __init__(self, positions, features=None, transform=None,
                 strict_checks=True):
        self.positions = jnp.asarray(positions)
        self.features = None if features is None else jnp.asarray(features)
        self.transform = None if transform is None else jnp.asarray(transform)
        if strict_checks:
            assert self.positions.ndim == 2 and self.positions.shape[1] == 3

    def __len__(self):
        return self.positions.shape[0]

    # -- masked indexing (ref :400, :429) --
    def __getitem__(self, mask):
        mask = np.asarray(mask)
        # reference validation (rep/gaussians.py:409-414): boolean (N,) only
        if mask.dtype != np.bool_:
            raise TypeError(f"Mask must be boolean, got {mask.dtype}")
        if mask.ndim != 1 or mask.shape[0] != len(self):
            raise ValueError(
                f"Mask length {mask.shape} does not match number of points "
                f"{len(self)}")
        kwargs = {}
        for a in self.class_point_attributes():
            v = getattr(self, a, None)
            kwargs[a] = None if v is None else v[jnp.asarray(mask)]
        for a in self.class_tensor_attributes():
            if a not in self.class_point_attributes():
                kwargs[a] = getattr(self, a, None)
        for a in self.class_other_attributes():
            kwargs[a] = getattr(self, a, None)
        return type(self)(strict_checks=False,
                          **{k: v for k, v in kwargs.items() if v is not None
                             or k in self.class_point_attributes()})

    def __setitem__(self, mask, value):
        assert isinstance(value, type(self))
        mask = jnp.asarray(np.asarray(mask))
        for a in self.class_point_attributes():
            v = getattr(self, a, None)
            vv = getattr(value, a, None)
            if v is not None and vv is not None:
                idx = jnp.nonzero(mask, size=int(np.asarray(mask).sum()))[0]
                setattr(self, a, v.at[idx].set(vv))

    # -- concatenation (ref :369) --
    @classmethod
    def cat(cls, models, skip_errors=False, **kwargs):
        """Concatenate along the point dimension. Any stored ``transform``
        is baked (``as_transformed``) before concatenation — the result
        always has ``transform=None`` (ref :383-384)."""
        if len(models) == 0:
            raise ValueError("cat requires at least one model")
        models = [m.as_transformed() if m.transform is not None else m
                  for m in models]
        if len(models) == 1:
            return models[0]
        out_kwargs = {}
        for a in cls.class_point_attributes():
            vals = [getattr(m, a, None) for m in models]
            if all(v is not None for v in vals):
                out_kwargs[a] = jnp.concatenate(vals, axis=0)
            elif not skip_errors and any(v is not None for v in vals):
                raise ValueError(f"attribute {a} set on some models only")
        for a in cls.class_other_attributes():
            out_kwargs[a] = getattr(models[0], a, None)
        return cls(strict_checks=False, **out_kwargs)

    # -- transforms (ref :490, :510) --
    def _combined_canonical_transform(self, input_transform=None):
        t = jnp.eye(4) if self.transform is None else self.transform
        if input_transform is not None:
            t = jnp.asarray(input_transform) @ t
        return t

    def as_transformed(self, additional_transform=None):
        """Bake transform into positions → new container with no transform.
        Ref :510."""
        t = self._combined_canonical_transform(additional_transform)
        ph = jnp.concatenate([self.positions,
                              jnp.ones_like(self.positions[:, :1])], axis=1)
        new_pos = (ph @ t.T)[:, :3]
        return type(self)(positions=new_pos, features=self.features,
                          strict_checks=False)

    def describe_attribute(self, attr, **kwargs):
        v = getattr(self, attr, None)
        if v is None:
            return f"{attr}: unset"
        return f"{attr}: {tuple(v.shape)} {v.dtype}"

    def __repr__(self):
        return (f"{type(self).__name__}(num_points={len(self)}, "
                f"attrs={self.get_attributes(only_tensors=True)})")


class GaussianSplatModel(PointSamples):
    """3D gaussian splats: positions, orientations (wxyz unit quats), scales,
    opacities, sh_coeff (N, S, 3), optional features/transform. Ref :537."""

    @classmethod
    def class_tensor_attributes(cls):
        return ["positions", "orientations", "scales", "opacities",
                "sh_coeff", "features", "transform"]

    @classmethod
    def class_other_attributes(cls):
        return ["sh_degree"]

    @classmethod
    def class_point_attributes(cls):
        return ["positions", "orientations", "scales", "opacities",
                "sh_coeff", "features"]

    def __init__(self, positions, orientations=None, scales=None,
                 opacities=None, sh_coeff=None, features=None, transform=None,
                 sh_degree=None, strict_checks=True):
        super().__init__(positions, features=features, transform=transform,
                         strict_checks=strict_checks)
        n = self.positions.shape[0]
        self.orientations = (jnp.asarray(orientations)
                             if orientations is not None else
                             jnp.zeros((n, 4)).at[:, 0].set(1.0))
        self.scales = (jnp.asarray(scales) if scales is not None
                       else jnp.ones((n, 3)))
        self.opacities = (jnp.asarray(opacities).reshape(n)
                          if opacities is not None else jnp.ones((n,)))
        self.sh_coeff = (jnp.asarray(sh_coeff) if sh_coeff is not None
                         else jnp.zeros((n, 1, 3)))
        if sh_degree is None:
            sh_degree = self.compute_sh_degree(self.sh_coeff.shape[1])
        self.sh_degree = sh_degree
        if strict_checks:
            assert self.orientations.shape == (n, 4)
            assert self.scales.shape == (n, 3)
            assert self.sh_coeff.ndim == 3 and self.sh_coeff.shape[2] == 3

    @classmethod
    def compute_sh_degree(cls, num_sh_coeff):
        """(deg+1)² coeffs → deg. Ref :714."""
        deg = math.isqrt(num_sh_coeff) - 1
        if (deg + 1) ** 2 != num_sh_coeff:
            raise ValueError(f"{num_sh_coeff} is not a valid SH coeff count")
        return deg

    @classmethod
    def compute_num_sh_coeff(cls, sh_degree):
        """Ref :731."""
        return (sh_degree + 1) ** 2

    @classmethod
    def from_gaussian_dict(cls, d, activated=True):
        """Build from an INRIA ply dict (see ``io.ply.import_gaussians``):
        applies sigmoid/exp activations unless ``activated`` is False."""
        ops = jnp.asarray(d["opacities"]).reshape(-1)
        scales = jnp.asarray(d["scales"])
        if activated:
            # INRIA checkpoints store logit opacity and log scales
            ops = 1.0 / (1.0 + jnp.exp(-ops))
            scales = jnp.exp(scales)
        rots = jnp.asarray(d["rotations"])
        rots = rots / jnp.clip(jnp.linalg.norm(rots, axis=-1, keepdims=True),
                               1e-12, None)
        return cls(positions=d["positions"], orientations=rots, scales=scales,
                   opacities=ops, sh_coeff=d["sh_coeffs"])

    def as_transformed(self, additional_transform=None):
        """Bake the canonical transform into all gaussian parameters
        (positions, orientations, scales, SH). Ref :762."""
        from kaolin_tpu.ops.gaussians.transforms import transform_gaussians
        t = self._combined_canonical_transform(additional_transform)
        pos, orient, scales, sh = transform_gaussians(
            self.positions, self.orientations, self.scales, t,
            sh_coeff=self.sh_coeff)
        return GaussianSplatModel(
            positions=pos, orientations=orient, scales=scales,
            opacities=self.opacities, sh_coeff=sh, features=self.features,
            sh_degree=self.sh_degree, strict_checks=False)
