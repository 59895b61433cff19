"""SimplicitsSolver — the coupled soft/rigid time stepper.

TPU-native analog of reference
``kaolin/experimental/newton/solver.py:29-94``. The reference copies state
into the scene, mutates the contact force with ``_set_state``/
``_set_contacts``, and calls ``run_sim_step``; here the step is FUNCTIONAL:
one jitted ``step(consts, state) -> state`` where the per-step contact
geometry (detected at step-start positions), the lagged friction norms, and
the rigid poses all flow through the consts pytree — so consecutive steps
recompile nothing and the whole coupled rollout can live in one
``lax.scan``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from kaolin_tpu.experimental.newton.collisions import ParticleShapeSoftContact
from kaolin_tpu.experimental.newton.model import SimplicitsModel, SimplicitsState

__all__ = ["SimplicitsSolver"]


class SimplicitsSolver:
    """Advances a :class:`SimplicitsModel` one implicit step at a time.
    Ref solver.py:29."""

    def __init__(self, model: SimplicitsModel):
        self.model = model
        scene = model.simplicits_scene
        step, consts = scene.build_functional_step()
        self._consts = consts
        self._force_idx = None
        for i, (obj, _c) in enumerate(consts["pt_forces"]):
            if isinstance(obj, ParticleShapeSoftContact):
                self._force_idx = i
        self._step = jax.jit(step)
        self._prepare = jax.jit(self._prepare_impl)

    def _prepare_impl(self, consts, state):
        """Per-step contact preparation: detect contacts at step-start
        positions, refresh lagged friction norms (ref collisions.py:815),
        and update rigid poses — all functional on the consts pytree."""
        if self._force_idx is None:
            return consts
        scene_pts = consts["pts"]
        force, coeff = consts["pt_forces"][self._force_idx]
        force = force.with_step_state(state.particle_q, shapes=state.shapes)
        if force.friction_lagged:
            dx0 = state.particle_q - scene_pts
            force = force.update_lagged_body_contact_force_norm(dx0,
                                                                scene_pts)
        pt_forces = list(consts["pt_forces"])
        pt_forces[self._force_idx] = (force, coeff)
        return dict(consts, pt_forces=pt_forces)

    def step(self, state_in: SimplicitsState, state_out=None, control=None,
             contacts=None, dt=None) -> SimplicitsState:
        """One coupled implicit step (ref solver.py:45). ``state_out``,
        ``control`` and ``contacts`` are accepted for API parity: output
        state is returned (functional), control inputs are unused by
        Simplicits (same as the reference), and contacts are re-detected
        from ``state_in`` rather than passed in. ``dt`` must match the
        scene timestep the model was finalized with (the step is compiled
        for it)."""
        del state_out, control, contacts
        scene = self.model.simplicits_scene
        if dt is not None and abs(float(dt) - scene.timestep) > 1e-12:
            raise ValueError(
                f"dt={dt} differs from the compiled scene timestep "
                f"{scene.timestep}; rebuild the model with this timestep")
        consts = self._prepare(self._consts, state_in)
        z, z_prev, z_dot = self._step(consts, state_in.sim_z,
                                      state_in.sim_z_prev,
                                      state_in.sim_z_dot)
        # mirror the solver's scene-side state (ref solver.py:75-78)
        scene.sim_z, scene.sim_z_prev, scene.sim_z_dot = z, z_prev, z_dot
        scene.current_sim_step += 1
        return SimplicitsState(
            sim_z=z, sim_z_prev=z_prev, sim_z_dot=z_dot,
            particle_q=self.model.sim_z_to_full(z),
            particle_qd=self.model.sim_z_dot_to_full(z_dot),
            shapes=state_in.shapes)
