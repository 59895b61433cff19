"""SimplicitsModel + SimplicitsState — the Newton-bridge data model.

TPU-native analog of reference ``kaolin/experimental/newton/model.py:28``
(SimplicitsModel) and ``state.py:23`` (SimplicitsState). The external Newton
engine's Model/State base classes don't exist here; the model owns a
:class:`SimplicitsScene` plus the rigid-shape set, and the state is a pure
pytree — so the whole coupled step jits and scans.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from kaolin_tpu.experimental.newton.collisions import ParticleShapeSoftContact
from kaolin_tpu.experimental.newton.shapes import RigidShapes

__all__ = ["SimplicitsModel", "SimplicitsState"]


class SimplicitsState(NamedTuple):
    """Extended state with flattened Simplicits DOFs (ref state.py:23).

    ``particle_q``/``particle_qd`` carry the Simplicits quadrature
    particles' world positions/velocities (the slice of Newton's global
    particle arrays the reference solver owns, ref model.py:44-52);
    ``shapes`` carries the rigid bodies' current poses/velocities.
    """
    sim_z: jnp.ndarray
    sim_z_prev: jnp.ndarray
    sim_z_dot: jnp.ndarray
    particle_q: jnp.ndarray       # (N, 3)
    particle_qd: jnp.ndarray      # (N, 3)
    shapes: Optional[RigidShapes]


class SimplicitsModel:
    """Holds the Simplicits scene, the rigid shapes, and the registered
    soft-contact coupling force. Ref model.py:28."""

    def __init__(self, device=None):
        # device kept for API parity; placement is JAX-managed
        from kaolin_tpu.physics.simplicits import SimplicitsScene
        self.simplicits_scene = SimplicitsScene()
        self.shapes = RigidShapes.empty()
        self.simplicits_particle_start = None
        self.simplicits_particle_end = None
        self.soft_contact_ke = 1.0e3
        self.soft_contact_mu = 0.5

    @property
    def contact_force(self) -> ParticleShapeSoftContact:
        entry = self.simplicits_scene.force_dict["pt_wise"].get(
            "newton_soft_collisions")
        return None if entry is None else entry["object"]

    def sim_z_to_full(self, sim_z):
        """Reduced DOFs → world particle positions (ref model.py:96)."""
        scene = self.simplicits_scene
        return (scene.sim_B @ sim_z).reshape(-1, 3) + scene.sim_pts

    def sim_z_dot_to_full(self, sim_z_dot):
        """Reduced DOF rates → world particle velocities (ref :108)."""
        scene = self.simplicits_scene
        return (scene.sim_B @ sim_z_dot).reshape(-1, 3)

    def state(self, requires_grad=None) -> SimplicitsState:
        """New state initialized from the scene (ref model.py:54)."""
        del requires_grad  # differentiability is jax-native
        scene = self.simplicits_scene
        if scene.sim_z is None:
            raise RuntimeError("add objects and finalize before state()")
        z = scene.sim_z
        zd = jnp.zeros_like(z)
        return SimplicitsState(
            sim_z=z, sim_z_prev=jnp.zeros_like(z), sim_z_dot=zd,
            particle_q=self.sim_z_to_full(z),
            particle_qd=self.sim_z_dot_to_full(zd),
            shapes=self.shapes)
