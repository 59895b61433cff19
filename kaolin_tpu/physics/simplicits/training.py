"""Simplicits objects and skinning-weight training.

TPU-native analog of reference ``kaolin/physics/simplicits/training.py``
(PhysicsPoints :60, SkinnedPoints :225, SkinnedPhysicsPoints :313,
SimplicitsObject :474, create_with_mlp :679, create_rigid :551, bake :902).

Training runs as a jitted optax.adam step — the reference's 10k-step Adam
loop (:763-781) with the Warp fast-path loss replaced by one fused XLA
program per step.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from typing import Any, Protocol, runtime_checkable
import optax

from kaolin_tpu.physics.simplicits.losses import compute_losses
from kaolin_tpu.physics.simplicits.network import SimplicitsMLP, SkinningFn

logger = logging.getLogger(__name__)

__all__ = [
    "PhysicsPoints",
    "PhysicsPointsProtocol",
    "SkinnedPoints",
    "SkinnedPointsProtocol",
    "SkinnedPhysicsPoints",
    "SkinnedPhysicsPointsProtocol",
    "SimplicitsObject",
]


def _per_point(val, n, dtype=jnp.float32):
    val = jnp.asarray(val, dtype=dtype)
    if val.ndim == 0:
        val = jnp.full((n,), val, dtype=dtype)
    return val.reshape(-1)


@runtime_checkable
class PhysicsPointsProtocol(Protocol):
    """Point-sampled object + per-point material properties (pts, yms, prs,
    rhos, appx_vol + subsample). Ref :40."""
    pts: Any
    yms: Any
    prs: Any
    rhos: Any
    appx_vol: Any

    def subsample(self, num_pts=None, sample_indices=None):
        ...


@runtime_checkable
class SkinnedPointsProtocol(Protocol):
    """Points + per-point skinning weights — enough to LBS-move a renderable
    representation (e.g. gaussian splats). Ref :214."""
    pts: Any
    skinning_weights: Any


@runtime_checkable
class SkinnedPhysicsPointsProtocol(Protocol):
    """Everything the Simplicits simulator needs from a baked object:
    material point sampling + skinning weights + their spatial jacobian
    dwdx + optional renderable points. Ref :300."""
    pts: Any
    yms: Any
    prs: Any
    rhos: Any
    appx_vol: Any
    skinning_weights: Any
    dwdx: Any
    renderable: Any


class PhysicsPoints:
    """Material sample points: pts (N,3), per-point yms/prs/rhos, appx_vol.
    Ref :60."""

    def __init__(self, pts, yms, prs, rhos, appx_vol):
        self.pts = jnp.asarray(pts)
        n = self.pts.shape[0]
        self.yms = _per_point(yms, n, self.pts.dtype)
        self.prs = _per_point(prs, n, self.pts.dtype)
        self.rhos = _per_point(rhos, n, self.pts.dtype)
        self.appx_vol = float(appx_vol)

    def __len__(self):
        return self.pts.shape[0]

    @property
    def dtype(self):
        return self.pts.dtype

    def _get_subsample_indices(self, num_pts=None, sample_indices=None, key=None):
        if (num_pts is None) == (sample_indices is None):
            raise ValueError("provide exactly one of num_pts / sample_indices")
        if sample_indices is not None:
            return np.asarray(sample_indices)
        n = len(self)
        if num_pts >= n:
            return np.arange(n)
        rng = np.random.RandomState(0) if key is None else np.random.RandomState(int(key[0]) % (2**31))
        return rng.choice(n, size=num_pts, replace=False)

    def subsample(self, num_pts=None, sample_indices=None):
        """Random (or explicit) subsample → new PhysicsPoints. Ref :135."""
        idx = self._get_subsample_indices(num_pts, sample_indices)
        return PhysicsPoints(self.pts[idx], self.yms[idx], self.prs[idx],
                             self.rhos[idx], self.appx_vol)


class SkinnedPoints:
    """Points + baked skinning weights. Ref :225."""

    def __init__(self, pts, skinning_weights):
        self.pts = jnp.asarray(pts)
        self.skinning_weights = jnp.asarray(skinning_weights)

    @property
    def num_handles(self):
        return self.skinning_weights.shape[1]

    @classmethod
    def from_skinning_mod(cls, pts, skinning_mod: SkinningFn):
        return cls(pts, skinning_mod.compute_skinning_weights(pts))

    def __len__(self):
        return self.pts.shape[0]


class SkinnedPhysicsPoints(PhysicsPoints):
    """Physics points + baked weights + weight gradients (all a scene needs).
    Ref :313."""

    def __init__(self, pts, yms, prs, rhos, appx_vol, skinning_weights, dwdx,
                 renderable: SkinnedPoints = None, num_real_qp=None):
        super().__init__(pts, yms, prs, rhos, appx_vol)
        self.skinning_weights = jnp.asarray(skinning_weights)
        self.dwdx = jnp.asarray(dwdx)
        self.renderable = renderable
        # heterogeneous-batch padding support: points beyond num_real_qp are
        # phantoms carrying zero volume/mass (kaolin_tpu.parallel.simplicits.
        # pad_skinned_physics_points); None → all points real
        self.num_real_qp = num_real_qp

    @property
    def num_handles(self):
        return self.skinning_weights.shape[1]

    @classmethod
    def from_skinning_mod(cls, pts, yms, prs, rhos, appx_vol,
                          skinning_mod: SkinningFn, renderable_pts=None):
        """Bake weights + spatial gradients from a skinning function. Ref :400."""
        pts = jnp.asarray(pts)
        weights = skinning_mod.compute_skinning_weights(pts)
        dwdx = skinning_mod.compute_dwdx(pts)
        renderable = None
        if renderable_pts is not None:
            renderable = SkinnedPoints.from_skinning_mod(
                jnp.asarray(renderable_pts), skinning_mod)
        return cls(pts, yms, prs, rhos, appx_vol, weights, dwdx,
                   renderable=renderable)

    def subsample(self, num_pts=None, sample_indices=None):
        idx = self._get_subsample_indices(num_pts, sample_indices)
        return SkinnedPhysicsPoints(
            self.pts[idx], self.yms[idx], self.prs[idx], self.rhos[idx],
            self.appx_vol, self.skinning_weights[idx], self.dwdx[idx],
            renderable=self.renderable)


class SimplicitsObject(PhysicsPoints):
    """Physics points + a skinning weight field (trained or analytic).
    Ref :474."""

    def __init__(self, pts, yms, prs, rhos, appx_vol, skinning_mod: SkinningFn):
        super().__init__(pts, yms, prs, rhos, appx_vol)
        self.skinning_mod = skinning_mod

    # -- constructors --
    @classmethod
    def create_rigid(cls, physics_points: PhysicsPoints):
        """Single constant handle → rigid/affine motion only. Ref :551."""
        skin = SkinningFn.from_function(
            lambda x: jnp.zeros((x.shape[0], 0), dtype=x.dtype))
        return cls(physics_points.pts, physics_points.yms, physics_points.prs,
                   physics_points.rhos, physics_points.appx_vol, skin)

    @classmethod
    def create_from_function(cls, physics_points: PhysicsPoints, fcn):
        """Analytic weight function. Ref :852."""
        return cls(physics_points.pts, physics_points.yms, physics_points.prs,
                   physics_points.rhos, physics_points.appx_vol,
                   SkinningFn.from_function(fcn))

    @classmethod
    def create_with_mlp(cls,
                        physics_points: PhysicsPoints,
                        num_handles,
                        num_samples,
                        model_layers,
                        training_batch_size=10,
                        training_num_steps=10000,
                        training_lr_start=1e-3,
                        training_lr_end=1e-3,
                        training_le_coeff=1e-1,
                        training_lo_coeff=1e6,
                        training_log_every=1000,
                        normalize_for_training=True,
                        key=None):
        """Train an MLP skinning-weight field (ref :679): normalize points to
        the unit box, run Adam on elastic+orthogonality losses with the
        linear→neohookean interpolation schedule, return the trained object.
        The update step is jitted once and scanned on-device.
        """
        pts = physics_points.pts
        yms, prs, rhos = physics_points.yms, physics_points.prs, physics_points.rhos
        appx_vol = physics_points.appx_vol
        assert num_handles >= 1
        if num_handles == 1:
            return cls.create_rigid(physics_points)
        if key is None:
            key = jax.random.PRNGKey(0)

        if normalize_for_training:
            bb_max = jnp.max(pts, axis=0)
            bb_min = jnp.min(pts, axis=0)
            bb_vol = float(jnp.prod(bb_max - bb_min))
            training_pts = (pts - bb_min) / (bb_max - bb_min)
            training_appx_vol = appx_vol / bb_vol
        else:
            bb_min, bb_max = None, None
            training_pts = pts
            training_appx_vol = appx_vol

        key, k_init = jax.random.split(key)
        skin = SimplicitsMLP(3, 64, num_handles, model_layers,
                             bb_min=bb_min, bb_max=bb_max, key=k_init)
        params = skin.params

        # linear lr schedule start→end (ref :781-785)
        schedule = optax.linear_schedule(
            training_lr_start, training_lr_end, training_num_steps)
        optimizer = optax.adam(schedule)
        opt_state = optimizer.init(params)

        def loss_fn(p, en_interp, step_key):
            model = SkinningFn(params=p, bb_min=bb_min, bb_max=bb_max)
            le, lo = compute_losses(
                model, training_pts, yms, prs, rhos, en_interp,
                batch_size=training_batch_size, appx_vol=training_appx_vol,
                num_samples=num_samples, le_coeff=training_le_coeff,
                lo_coeff=training_lo_coeff, key=step_key)
            return le + lo, (le, lo)

        @jax.jit
        def train_step(p, opt_state, step, step_key):
            en_interp = step.astype(jnp.float32) / training_num_steps
            (loss, (le, lo)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, en_interp, step_key)
            updates, opt_state = optimizer.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return p, opt_state, le, lo

        for i in range(training_num_steps):
            key, step_key = jax.random.split(key)
            params, opt_state, le, lo = train_step(
                params, opt_state, jnp.asarray(i), step_key)
            if i % training_log_every == 0:
                logger.info("Training step: %d, le: %f, lo: %f",
                            i, float(le), float(lo))

        skin = SkinningFn(params=params, bb_min=bb_min, bb_max=bb_max)
        return cls(pts, yms, prs, rhos, appx_vol, skin)

    @classmethod
    def create_with_rkpm(cls, physics_points: PhysicsPoints, num_handles,
                         num_nodes, num_points=None, radius_scale=1.0,
                         radius_init_kNN=2, radius_min="3x", dtype=None):
        """Skinning weights from RKPM generalized eigenmodes (NVIDIA
        "Freeform"; ref :796). Deterministic — no training loop."""
        import numpy as np
        from kaolin_tpu.physics.simplicits.rkpm import SimplicitsRKPM
        pts = physics_points.pts
        bb_min = np.asarray(jnp.min(pts, axis=0))
        bb_max = np.asarray(jnp.max(pts, axis=0))
        skin = SimplicitsRKPM(num_handles=num_handles, num_nodes=num_nodes,
                              radius_scale=radius_scale,
                              radius_init_kNN=radius_init_kNN,
                              radius_min=radius_min, num_points=num_points,
                              bb_min=bb_min, bb_max=bb_max)
        skin.init(pts, physics_points.yms, physics_points.prs,
                  physics_points.rhos, physics_points.appx_vol)
        return cls(pts, physics_points.yms, physics_points.prs,
                   physics_points.rhos, physics_points.appx_vol, skin)

    # -- ops --
    def subsample(self, num_pts=None, sample_indices=None):
        """Ref :873."""
        idx = self._get_subsample_indices(num_pts, sample_indices)
        return SimplicitsObject(self.pts[idx], self.yms[idx], self.prs[idx],
                                self.rhos[idx], self.appx_vol, self.skinning_mod)

    def bake(self, num_qps=None, sampling_indices=None,
             renderable_pts=None) -> SkinnedPhysicsPoints:
        """Bake weights + gradients at sampled quadrature points. Ref :902."""
        if num_qps is None and sampling_indices is None:
            raise ValueError("bake() requires num_qps or sampling_indices")
        sampled = self.subsample(num_pts=num_qps, sample_indices=sampling_indices)
        return SkinnedPhysicsPoints.from_skinning_mod(
            pts=sampled.pts, yms=sampled.yms, prs=sampled.prs,
            rhos=sampled.rhos, appx_vol=sampled.appx_vol,
            skinning_mod=self.skinning_mod, renderable_pts=renderable_pts)

    def bake_for_rendering(self, renderable_pts) -> SkinnedPoints:
        """Ref :938."""
        return SkinnedPoints.from_skinning_mod(renderable_pts, self.skinning_mod)
