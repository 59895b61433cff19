"""Minimal rigid-shape collider set for the Newton-engine bridge.

The reference bridge (``kaolin/experimental/newton/``) couples Simplicits
particles to shapes owned by the external NVIDIA Newton engine, whose
``collide()`` produces per-(particle, shape) soft contacts (closest surface
point, normal). That engine does not exist here, so this module provides a
TPU-native stand-in: a fixed struct-of-arrays of rigid colliders (planes,
spheres, boxes) with analytic closest-point/normal queries, batched over all
(particle, shape) pairs with static shapes — the same data Newton's
``Contacts`` carries into the coupling kernels
(ref ``experimental/newton/collisions.py:33-140``: ``contact_body_pos``,
``contact_normal``, ``shape_material_*``, ``body_q``/``body_qd``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.math.quat.quaternion import quat_conjugate, quat_rotate

__all__ = ["RigidShapes", "PLANE", "SPHERE", "BOX"]

PLANE, SPHERE, BOX = 0, 1, 2


@jax.tree_util.register_pytree_node_class
class RigidShapes:
    """Struct-of-arrays rigid colliders (pytree).

    Attributes (S shapes):
        kinds: static tuple of ints (PLANE / SPHERE / BOX).
        pos: (S, 3) world positions; quat: (S, 4) xyzw unit orientations.
        lin_vel / ang_vel: (S, 3) world-frame body velocities.
        com: (S, 3) body-frame center of mass.
        size: (S, 3) — sphere radius in [:, 0]; box half-extents; unused for
            planes (the plane is z=0 in body frame, +z normal).
        ke / kf / mu: (S,) contact stiffness / friction stiffness / friction
            coefficient (ref ``shape_material_*``).
    """

    def __init__(self, kinds, pos, quat, lin_vel, ang_vel, com, size, ke, kf,
                 mu):
        self.kinds = tuple(int(k) for k in kinds)
        self.pos = jnp.asarray(pos, jnp.float32)
        self.quat = jnp.asarray(quat, jnp.float32)
        self.lin_vel = jnp.asarray(lin_vel, jnp.float32)
        self.ang_vel = jnp.asarray(ang_vel, jnp.float32)
        self.com = jnp.asarray(com, jnp.float32)
        self.size = jnp.asarray(size, jnp.float32)
        self.ke = jnp.asarray(ke, jnp.float32)
        self.kf = jnp.asarray(kf, jnp.float32)
        self.mu = jnp.asarray(mu, jnp.float32)

    def tree_flatten(self):
        return ((self.pos, self.quat, self.lin_vel, self.ang_vel, self.com,
                 self.size, self.ke, self.kf, self.mu), self.kinds)

    @classmethod
    def tree_unflatten(cls, kinds, children):
        obj = object.__new__(cls)
        obj.kinds = kinds
        (obj.pos, obj.quat, obj.lin_vel, obj.ang_vel, obj.com, obj.size,
         obj.ke, obj.kf, obj.mu) = children
        return obj

    @property
    def num_shapes(self):
        return len(self.kinds)

    @classmethod
    def empty(cls):
        z = np.zeros((0, 3), np.float32)
        return cls((), z, np.zeros((0, 4), np.float32), z, z, z, z,
                   np.zeros((0,)), np.zeros((0,)), np.zeros((0,)))

    # -- closest-point queries (body frame: plane z=0 / sphere at origin /
    #    box centered at origin) --
    def _closest_local(self, kind, p_local, size):
        if kind == PLANE:
            cp = p_local.at[..., 2].set(0.0)
            n = jnp.zeros_like(p_local).at[..., 2].set(1.0)
            return cp, n
        if kind == SPHERE:
            r = size[0]
            d = jnp.linalg.norm(p_local, axis=-1, keepdims=True)
            n = p_local / jnp.clip(d, 1e-9, None)
            return r * n, n
        # BOX: half extents size; outside → clamp; inside → push to the
        # nearest face along the axis of least separation
        he = size
        clamped = jnp.clip(p_local, -he, he)
        outside = jnp.any(jnp.abs(p_local) > he, axis=-1, keepdims=True)
        diff = p_local - clamped
        n_out = diff / jnp.clip(jnp.linalg.norm(diff, axis=-1, keepdims=True),
                                1e-9, None)
        gap = he - jnp.abs(p_local)                       # (…, 3) ≥ 0 inside
        ax = jnp.argmin(gap, axis=-1)
        sign = jnp.sign(jnp.take_along_axis(p_local, ax[..., None],
                                            axis=-1))[..., 0]
        sign = jnp.where(sign == 0, 1.0, sign)
        n_in = jax.nn.one_hot(ax, 3, dtype=p_local.dtype) * sign[..., None]
        cp_in = p_local + n_in * jnp.take_along_axis(gap, ax[..., None],
                                                     axis=-1)
        cp = jnp.where(outside, clamped, cp_in)
        n = jnp.where(outside, n_out, n_in)
        return cp, n

    def detect(self, particle_pos):
        """All-pairs soft contacts for (N, 3) particle positions.

        Returns a dict of (N, S, …) arrays: ``bx`` world closest surface
        points, ``normal`` world outward normals, ``bv`` rigid velocity at
        the contact (v + ω×r), plus broadcasted per-shape materials. These
        stay FIXED through one implicit solve, exactly like the Newton
        engine's per-step ``collide()`` output (normals/contact points are
        not re-linearized inside the Newton loop)."""
        outs_bx, outs_n = [], []
        for s, kind in enumerate(self.kinds):
            local = quat_rotate(quat_conjugate(self.quat[s][None]),
                                particle_pos - self.pos[s][None])
            cp, n = self._closest_local(kind, local, self.size[s])
            outs_bx.append(self.pos[s][None] + quat_rotate(
                self.quat[s][None], cp))
            outs_n.append(quat_rotate(self.quat[s][None], n))
        bx = jnp.stack(outs_bx, axis=1)                  # (N, S, 3)
        normal = jnp.stack(outs_n, axis=1)
        com_w = self.pos + quat_rotate(self.quat, self.com)
        r = bx - com_w[None]                             # lever arm
        bv = self.lin_vel[None] + jnp.cross(
            jnp.broadcast_to(self.ang_vel[None], r.shape), r)
        return {"bx": bx, "normal": normal, "bv": bv}
