"""SimplicitsModelBuilder — assembles a coupled soft/rigid model.

TPU-native analog of reference
``kaolin/experimental/newton/builder.py:31``. Where the reference extends
the external Newton engine's ModelBuilder (registering Simplicits particles
into Newton's global particle arrays), this builder owns a minimal rigid
collider set (:class:`RigidShapes`) directly and wires the particle↔shape
soft-contact force into the scene's force registry under
``"newton_soft_collisions"`` with the same default coefficient
(ref builder.py:203-209, coeff 0.001).
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp
import numpy as np

from kaolin_tpu.experimental.newton.collisions import ParticleShapeSoftContact
from kaolin_tpu.experimental.newton.model import SimplicitsModel
from kaolin_tpu.experimental.newton.shapes import BOX, PLANE, SPHERE, RigidShapes

__all__ = ["SimplicitsModelBuilder"]

_AXIS = {"x": 0, "y": 1, "z": 2, 0: 0, 1: 1, 2: 2}


class SimplicitsModelBuilder:
    """Deferred-construction builder for :class:`SimplicitsModel`. Ref :31."""

    def __init__(self, up_axis="z", gravity=-9.81):
        self.up_axis = _AXIS[up_axis if not isinstance(up_axis, str)
                             else up_axis.lower()]
        self.gravity = float(gravity)
        self._pending_objects = []
        self._pending_boundary_conditions = []
        self._pending_collisions = None
        self._shapes = []            # (kind, pos, quat, lin_v, ang_v, com,
        #                               size, ke, kf, mu)
        self._contact_kwargs = {}

    # -- soft bodies (ref :51) --
    def add_simplicits_object(self, sim_object, num_qp=None,
                              init_transform=None, is_kinematic=False,
                              renderable_pts=None):
        self._pending_objects.append(
            (sim_object, num_qp, init_transform, is_kinematic,
             renderable_pts))
        return len(self._pending_objects) - 1

    def add_simplicits_collisions(self, collision_particle_radius=0.1,
                                  detection_ratio=1.5,
                                  impenetrable_barrier_ratio=0.25,
                                  collision_penalty=1000.0,
                                  max_contact_pairs=10000, friction=0.5):
        """Soft-soft collisions; deferred to finalize (ref :80)."""
        self._pending_collisions = (
            collision_particle_radius, detection_ratio,
            impenetrable_barrier_ratio, collision_penalty,
            max_contact_pairs, friction)

    def add_simplicits_object_boundary_condition(self, obj_idx, name, fcn,
                                                 bdry_penalty=10000.0,
                                                 pinned_x=None):
        """Deferred boundary condition (ref :97)."""
        self._pending_boundary_conditions.append(
            (obj_idx, name, fcn, bdry_penalty, pinned_x))

    # -- rigid shapes (the external engine's shape API, minimal) --
    def _add_shape(self, kind, pos, quat, size, ke, kf, mu, lin_vel, ang_vel):
        if quat is None:
            quat = (0.0, 0.0, 0.0, 1.0)
        self._shapes.append((kind, tuple(pos), tuple(quat),
                             tuple(lin_vel), tuple(ang_vel), (0.0, 0.0, 0.0),
                             tuple(size), float(ke), float(kf), float(mu)))
        return len(self._shapes) - 1

    def add_ground_plane(self, height=0.0, ke=1.0e3, kf=1.0e3, mu=0.5):
        """Rigid half-space with +up normal at ``height`` along up_axis."""
        pos = [0.0, 0.0, 0.0]
        pos[self.up_axis] = float(height)
        # plane normal is body +z: rotate body z onto the up axis
        quats = {0: (0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)),
                 1: (-np.sin(np.pi / 4), 0.0, 0.0, np.cos(np.pi / 4)),
                 2: (0.0, 0.0, 0.0, 1.0)}
        return self._add_shape(PLANE, pos, quats[self.up_axis],
                               (0.0, 0.0, 0.0), ke, kf, mu,
                               (0.0, 0.0, 0.0), (0.0, 0.0, 0.0))

    def add_shape_sphere(self, pos, radius, quat=None, ke=1.0e3, kf=1.0e3,
                         mu=0.5, lin_vel=(0.0, 0.0, 0.0),
                         ang_vel=(0.0, 0.0, 0.0)):
        return self._add_shape(SPHERE, pos, quat, (radius, 0.0, 0.0),
                               ke, kf, mu, lin_vel, ang_vel)

    def add_shape_box(self, pos, half_extents, quat=None, ke=1.0e3, kf=1.0e3,
                      mu=0.5, lin_vel=(0.0, 0.0, 0.0),
                      ang_vel=(0.0, 0.0, 0.0)):
        return self._add_shape(BOX, pos, quat, half_extents, ke, kf, mu,
                               lin_vel, ang_vel)

    def configure_soft_contact(self, **kwargs):
        """Extra kwargs for :class:`ParticleShapeSoftContact` (e.g.
        ``friction_use_lagged_body_contact_force_norm``, ``particle_radius``,
        ``velocity_penalty_kv_scale``, ``coeff_of_restitution``)."""
        self._contact_kwargs.update(kwargs)

    # -- finalize (ref :115) --
    def finalize(self, device=None, requires_grad=False,
                 timestep=0.03, **scene_kwargs) -> SimplicitsModel:
        if requires_grad:
            # the jax analog of torch's requires_grad: run Newton as a
            # fixed-trip (reverse-differentiable) loop so jax.grad flows
            # through sim steps
            scene_kwargs.setdefault("differentiable", True)
        from kaolin_tpu.physics.simplicits import SimplicitsScene

        model = SimplicitsModel(device)
        model.simplicits_scene = SimplicitsScene(timestep=timestep,
                                                 **scene_kwargs)
        scene = model.simplicits_scene

        for args in self._pending_objects:
            sim_object, num_qp, init_transform, is_kinematic, rpts = args
            scene.add_object(sim_object, num_qp=num_qp,
                             init_transform=init_transform,
                             is_kinematic=is_kinematic,
                             renderable_pts=rpts)

        if not self._pending_objects:
            if (self._shapes or self._pending_boundary_conditions
                    or self._pending_collisions is not None):
                raise ValueError(
                    "finalize() called with rigid shapes, boundary conditions "
                    "or collisions but no simplicits objects — add at least "
                    "one soft object via add_simplicits_object() first, or "
                    "these settings would be silently dropped.")
            return model

        acc_gravity = np.zeros(3, np.float32)
        acc_gravity[self.up_axis] = -self.gravity
        scene.set_scene_gravity(jnp.asarray(acc_gravity))

        for (obj_idx, name, fcn, bdry_penalty, pinned_x) in \
                self._pending_boundary_conditions:
            scene.set_object_boundary_condition(obj_idx, name, fcn,
                                                bdry_penalty, pinned_x)
        if self._pending_collisions is not None:
            scene.enable_collisions(*self._pending_collisions)

        if self._shapes:
            cols = list(zip(*self._shapes))
            model.shapes = RigidShapes(
                kinds=cols[0], pos=np.asarray(cols[1], np.float32),
                quat=np.asarray(cols[2], np.float32),
                lin_vel=np.asarray(cols[3], np.float32),
                ang_vel=np.asarray(cols[4], np.float32),
                com=np.asarray(cols[5], np.float32),
                size=np.asarray(cols[6], np.float32),
                ke=np.asarray(cols[7], np.float32),
                kf=np.asarray(cols[8], np.float32),
                mu=np.asarray(cols[9], np.float32))

        model.simplicits_particle_start = 0
        model.simplicits_particle_end = scene.total_qp

        # auto-register the coupling force (ref builder.py:203-209)
        if "newton_soft_collisions" not in scene.force_dict["pt_wise"]:
            kwargs = dict(particle_ke=model.soft_contact_ke,
                          particle_mu=model.soft_contact_mu,
                          friction_use_lagged_body_contact_force_norm=False)
            kwargs.update(self._contact_kwargs)
            force = ParticleShapeSoftContact(
                model.shapes, jnp.ones_like(scene.sim_vols),
                dt=scene.timestep, **kwargs)
            scene.force_dict["pt_wise"]["newton_soft_collisions"] = {
                "object": force, "coeff": 0.001}
            scene._step_fn = None
            scene._scan_fn = None
        return model
