"""Particle↔rigid-shape soft contact coupling (the Newton-bridge force).

TPU-native analog of reference
``kaolin/experimental/newton/collisions.py`` — the Warp kernels
``_contact_subspace_energy``:33, ``_contact_subspace_gradient``:209,
``_contact_subspace_hessian``:416, and the lagged-friction-norm update
:602, wrapped by ``SimplicitsParticleNewtonShapeSoftContact``:717.

Energy model per (particle i, shape s) pair, with FIXED per-step contact
geometry (normal n, surface point bx, rigid velocity bv at the contact):

* penetration d = n·(pos − bx) − radius, active when d ≤ 0;
* collision: ½·ke·d²  (ke = ½(particle_ke + shape_ke));
* IPC friction: μ·‖f_n‖·f₀(‖u‖) with u the tangential part of the relative
  translation (pos − prev_pos − bv·dt), f₀ the IPC smoothing with
  ε_u = friction_epsilon·dt, and ‖f_n‖ either the CURRENT ke·|d| or a
  LAGGED norm frozen between solves (``friction_use_lagged...``, ref :717 —
  with lagging the gradient is the exact derivative of the energy, which
  stabilizes the Newton solve);
* optional velocity-level restitution penalty ½·k_v·((1+e)·max(−vₙ, 0))².

All pairs are evaluated densely ((N, S) arrays, S = #shapes is small) and
masked — the fixed-shape XLA formulation of the reference's
``soft_contact_max`` contact buffer.

The class satisfies the scene's point-wise force protocol
(``energy/gradient/hessian (dx, x0, coeff)``) so it registers in
``SimplicitsScene.force_dict["pt_wise"]`` exactly like the reference
registers it under ``"newton_soft_collisions"`` (ref builder.py:203).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kaolin_tpu.experimental.newton.shapes import RigidShapes

__all__ = ["ParticleShapeSoftContact", "build_orthonormal_basis"]


def build_orthonormal_basis(n):
    """Two unit tangents orthogonal to n (..., 3). Any orthonormal basis
    yields identical friction energies (u enters through norms and
    projections only)."""
    helper = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                       jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]),
                                        n.shape),
                       jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]),
                                        n.shape))
    e0 = jnp.cross(helper, n)
    e0 = e0 / jnp.clip(jnp.linalg.norm(e0, axis=-1, keepdims=True),
                       1e-9, None)
    e1 = jnp.cross(n, e0)
    return e0, e1


@jax.tree_util.register_pytree_node_class
class ParticleShapeSoftContact:
    """Soft contact between the scene's quadrature particles and rigid
    shapes. Ref ``SimplicitsParticleNewtonShapeSoftContact`` :717.

    Per-step mutable inputs (set by the solver before each implicit solve,
    all pytree children): ``shapes``, ``contacts`` (detection output),
    ``prev_pos`` (N, 3) step-start positions, ``lagged_norm`` (N,).
    """

    def __init__(self, shapes: RigidShapes, integration_pt_volume,
                 dt, particle_radius=0.0, particle_ke=1.0e3,
                 particle_mu=0.5,
                 friction_use_lagged_body_contact_force_norm=True,
                 velocity_penalty_kv_scale=0.0, friction_epsilon=1e-2,
                 coeff_of_restitution=0.0, contacts=None, prev_pos=None,
                 lagged_norm=None):
        n = integration_pt_volume.shape[0]
        self.shapes = shapes
        self.vols = jnp.asarray(integration_pt_volume, jnp.float32)
        self.dt = float(dt)
        self.particle_radius = float(particle_radius)
        self.particle_ke = float(particle_ke)
        self.particle_mu = float(particle_mu)
        self.friction_lagged = bool(friction_use_lagged_body_contact_force_norm)
        self.velocity_penalty_kv = float(velocity_penalty_kv_scale) \
            * float(particle_ke)
        self.friction_epsilon = float(friction_epsilon)
        self.coeff_of_restitution = float(coeff_of_restitution)
        self.contacts = contacts
        self.prev_pos = (jnp.zeros((n, 3), jnp.float32)
                         if prev_pos is None else prev_pos)
        self.lagged_norm = (jnp.zeros((n,), jnp.float32)
                            if lagged_norm is None else lagged_norm)

    # -- pytree --
    def tree_flatten(self):
        children = (self.shapes, self.vols, self.contacts, self.prev_pos,
                    self.lagged_norm)
        aux = (self.dt, self.particle_radius, self.particle_ke,
               self.particle_mu, self.friction_lagged,
               self.velocity_penalty_kv, self.friction_epsilon,
               self.coeff_of_restitution)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.shapes, obj.vols, obj.contacts, obj.prev_pos,
         obj.lagged_norm) = children
        (obj.dt, obj.particle_radius, obj.particle_ke, obj.particle_mu,
         obj.friction_lagged, obj.velocity_penalty_kv, obj.friction_epsilon,
         obj.coeff_of_restitution) = aux
        return obj

    def _replace(self, **kw):
        children, aux = self.tree_flatten()
        obj = self.tree_unflatten(aux, children)
        for k, v in kw.items():
            setattr(obj, k, v)
        return obj

    # -- per-step preparation (solver side, functional) --
    def with_step_state(self, prev_pos, shapes=None):
        """New force with updated step-start positions (and shape poses):
        the bridge analog of ``_set_state`` / ``_set_contacts`` (ref
        :779-798) — contacts are re-detected at the step-start positions."""
        s = shapes if shapes is not None else self.shapes
        contacts = s.detect(prev_pos) if s.num_shapes else None
        return self._replace(shapes=s, prev_pos=prev_pos, contacts=contacts)

    def update_lagged_body_contact_force_norm(self, dx, x0):
        """New force with refreshed lagged normal-force magnitudes
        (ref :815): ke·|d| at the current positions, 0 where separated."""
        if self.contacts is None:
            return self
        pos = dx + x0
        ke, _, _ = self._pair_materials()
        d = self._penetration(pos)
        norm_pair = jnp.where(d <= 0, ke * jnp.abs(d), 0.0)     # (N, S)
        # one lagged value per sample: the reference kernel writes
        # per-contact into the sample slot (last contact wins); the sum of
        # active-pair norms is the deterministic equivalent for S shapes
        return self._replace(lagged_norm=jnp.sum(norm_pair, axis=1))

    # -- pair quantities --
    def _pair_materials(self):
        ke = 0.5 * (self.particle_ke + self.shapes.ke)[None]    # (1, S)
        mu = 0.5 * (self.particle_mu + self.shapes.mu)[None]
        return ke, mu, self.shapes.kf[None]

    def _penetration(self, pos):
        c = self.contacts
        return (jnp.sum(c["normal"] * (pos[:, None] - c["bx"]), axis=-1)
                - self.particle_radius)                          # (N, S)

    def _friction_terms(self, pos):
        c = self.contacts
        rel = (pos - self.prev_pos)[:, None] - c["bv"] * self.dt
        n = c["normal"]
        e0, e1 = build_orthonormal_basis(n)
        u0 = jnp.sum(e0 * rel, axis=-1)
        u1 = jnp.sum(e1 * rel, axis=-1)
        u_norm = jnp.sqrt(u0 * u0 + u1 * u1 + 1e-20)
        eps_u = self.friction_epsilon * self.dt
        vn = jnp.sum(n * rel, axis=-1) / self.dt
        return rel, n, e0, e1, u0, u1, u_norm, eps_u, vn

    def _force_norm(self, ke, d):
        if self.friction_lagged:
            return self.lagged_norm[:, None]
        return ke * jnp.abs(d)

    # -- scene force protocol (dx (N,3) displacements, x0 (N,3) rest) --
    def energy(self, dx, x0, coeff=1.0):
        """Ref kernel :33-204."""
        if self.contacts is None:
            return jnp.asarray(0.0, jnp.float32)
        pos = dx + x0
        ke, mu, _ = self._pair_materials()
        d = self._penetration(pos)
        active = d <= 0
        collision = 0.5 * ke * d * d

        _, n, e0, e1, u0, u1, u_norm, eps_u, vn = self._friction_terms(pos)
        r = u_norm / eps_u
        f0 = jnp.where(u_norm > eps_u, u_norm - eps_u / 3.0,
                       u_norm * r * (1.0 - r / 3.0))
        friction = mu * self._force_norm(ke, d) * f0

        neg_vn = -vn
        vterm = (1.0 + self.coeff_of_restitution) * jnp.maximum(neg_vn, 0.0)
        vel = 0.5 * self.velocity_penalty_kv * vterm * vterm

        e = self.vols[:, None] * (collision + friction + vel)
        return coeff * jnp.sum(jnp.where(active, e, 0.0))

    def gradient(self, dx, x0, coeff=1.0):
        """dE/dpos per sample (N, 3), summed over that sample's shape
        contacts (ref kernel :209-390 accumulates with atomic_add)."""
        if self.contacts is None:
            return jnp.zeros_like(dx)
        pos = dx + x0
        ke, mu, _ = self._pair_materials()
        d = self._penetration(pos)
        active = (d <= 0)[..., None]

        _, n, e0, e1, u0, u1, u_norm, eps_u, vn = self._friction_terms(pos)
        collision_g = n * (ke * d)[..., None]

        f1_over = jnp.where(u_norm > eps_u, 1.0 / u_norm,
                            (2.0 - u_norm / eps_u) / eps_u)
        fn = self._force_norm(ke, d)
        # T·(f1/‖u‖·u) in world coords
        tang = e0 * u0[..., None] + e1 * u1[..., None]
        friction_g = (mu * fn * f1_over)[..., None] * tang

        neg_vn = -vn
        kfac = self.velocity_penalty_kv \
            * (1.0 + self.coeff_of_restitution) ** 2
        vel_g = jnp.where((neg_vn > 0)[..., None],
                          -(kfac * neg_vn / self.dt)[..., None] * n, 0.0)

        g = self.vols[:, None, None] * (collision_g + friction_g + vel_g)
        return coeff * jnp.sum(jnp.where(active, g, 0.0), axis=1)

    def hessian(self, dx, x0, coeff=1.0):
        """Per-sample 3x3 Hessian blocks (N, 3, 3), Gauss-Newton form of the
        reference kernel :416-599 (d(force_norm)/dpos dropped)."""
        if self.contacts is None:
            return jnp.zeros(dx.shape[:1] + (3, 3), dx.dtype)
        pos = dx + x0
        ke, mu, _ = self._pair_materials()
        d = self._penetration(pos)
        active = (d <= 0)[..., None, None]

        _, n, e0, e1, u0, u1, u_norm, eps_u, vn = self._friction_terms(pos)
        nn = n[..., :, None] * n[..., None, :]
        collision_h = ke[..., None, None] * nn

        f1_over = jnp.where(u_norm > eps_u, 1.0 / u_norm,
                            (2.0 - u_norm / eps_u) / eps_u)
        fn = self._force_norm(ke, d)
        # world-space tangential projector T·(f1 I2 + outer_term)·Tᵀ
        tang_proj = (e0[..., :, None] * e0[..., None, :]
                     + e1[..., :, None] * e1[..., None, :])
        uu = (e0 * u0[..., None] + e1 * u1[..., None])
        uu_outer = uu[..., :, None] * uu[..., None, :]
        u_sq = jnp.clip(u0 * u0 + u1 * u1, 1e-20, None)
        outer = jnp.where((u_norm > eps_u)[..., None, None],
                          -(f1_over / u_sq)[..., None, None] * uu_outer,
                          -(1.0 / (u_norm * eps_u * eps_u)
                            )[..., None, None] * uu_outer)
        friction_h = (mu * fn)[..., None, None] \
            * (f1_over[..., None, None] * tang_proj + outer)

        kfac = self.velocity_penalty_kv \
            * (1.0 + self.coeff_of_restitution) ** 2 / (self.dt * self.dt)
        vel_h = jnp.where(((-vn) > 0)[..., None, None], kfac * nn, 0.0)

        h = self.vols[:, None, None, None] \
            * (collision_h + friction_h + vel_h)
        return coeff * jnp.sum(jnp.where(active, h, 0.0), axis=1)
