"""Scene potential-energy forces: gravity, floor, boundary pins.

TPU-native analog of reference ``kaolin/physics/common/scene_forces.py``
(Gravity :381, Floor :477, Boundary :595 and the @wp.kernel energy/gradient/
hessian trios :25-379). Each force exposes ``energy(dx, x0, coeff)`` →
scalar, ``gradient`` → (N, 3), ``hessian`` → (N, 3, 3) over all quadrature
points — fully batched jnp that XLA fuses into the Newton assembly instead of
per-point Warp kernels with atomics.
"""

import jax
import jax.numpy as jnp

__all__ = [
    "gravity_energy", "gravity_gradient",
    "floor_energy", "floor_gradient", "floor_hessian",
    "boundary_energy", "boundary_gradient", "boundary_hessian",
    "Gravity", "Floor", "Boundary",
]


# -- gravity (ref :25-102): E = m g·x --
def gravity_energy(g, rho, vol, dx, x0):
    return jnp.sum((dx + x0) @ g * rho * vol)


def gravity_gradient(g, rho, vol, dx, x0):
    return (rho * vol)[:, None] * g[None, :]


# -- floor (ref :105-261): one-sided quadratic penalty along an axis --
def floor_energy(floor_height, floor_axis, flip_floor, vol, dx, x0):
    p = (dx + x0)[:, floor_axis]
    pen = p - floor_height
    active = (pen > 0) if flip_floor else (pen < 0)
    return jnp.sum(jnp.where(active, vol * pen ** 2, 0.0))


def floor_gradient(floor_height, floor_axis, flip_floor, vol, dx, x0):
    p = (dx + x0)[:, floor_axis]
    pen = p - floor_height
    active = (pen > 0) if flip_floor else (pen < 0)
    sign = -1.0 if flip_floor else 1.0
    g_axis = jnp.where(active, sign * vol * 2.0 * pen, 0.0)
    out = jnp.zeros(dx.shape, dtype=dx.dtype)
    return out.at[:, floor_axis].set(g_axis)


def floor_hessian(floor_height, floor_axis, flip_floor, vol, dx, x0):
    p = (dx + x0)[:, floor_axis]
    pen = p - floor_height
    active = (pen > 0) if flip_floor else (pen < 0)
    sign = -1.0 if flip_floor else 1.0
    h_axis = jnp.where(active, sign * vol * 2.0, 0.0)
    out = jnp.zeros(dx.shape[:1] + (3, 3), dtype=dx.dtype)
    return out.at[:, floor_axis, floor_axis].set(h_axis)


# -- boundary pins (ref :265-379): quadratic pull to pinned positions --
def boundary_energy(pin_pos, pin_mask, dx, x0):
    cur = dx + x0
    d = cur - pin_pos
    return jnp.sum(pin_mask * jnp.sum(d * d, axis=-1))


def boundary_gradient(pin_pos, pin_mask, dx, x0):
    cur = dx + x0
    return (2.0 * (cur - pin_pos)) * pin_mask[:, None]


def boundary_hessian(pin_pos, pin_mask, dx, x0):
    eye = jnp.eye(3, dtype=dx.dtype)
    return 2.0 * pin_mask[:, None, None] * eye


@jax.tree_util.register_pytree_node_class
class Gravity:
    """Gravity force over all quadrature points. Ref :381.

    Registered as a pytree (array params are children) so force objects can
    live inside the scene-constants pytree of the functional sim step and be
    vmapped/sharded across scene batches.
    """

    def __init__(self, g, integration_pt_density, integration_pt_volume):
        self.g = jnp.asarray(g)
        self.rho = integration_pt_density.reshape(-1)
        self.vol = integration_pt_volume.reshape(-1)

    def tree_flatten(self):
        return (self.g, self.rho, self.vol), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.g, obj.rho, obj.vol = children
        return obj

    def energy(self, dx, x0, coeff=1.0):
        return coeff * gravity_energy(self.g, self.rho, self.vol, dx, x0)

    def gradient(self, dx, x0, coeff=1.0):
        return coeff * jnp.broadcast_to(
            gravity_gradient(self.g, self.rho, self.vol, dx, x0), dx.shape)

    def hessian(self, dx, x0, coeff=1.0):
        return jnp.zeros(dx.shape[:1] + (3, 3), dtype=dx.dtype)


@jax.tree_util.register_pytree_node_class
class Floor:
    """One-sided floor penalty. Ref :477. Pytree: height/vol are children
    (may vary per scene in a batch); axis and flip are static aux."""

    def __init__(self, floor_height, floor_axis, flip_floor, integration_pt_volume):
        self.floor_height = float(floor_height)
        self.floor_axis = int(floor_axis)
        self.flip_floor = bool(flip_floor)
        self.vol = integration_pt_volume.reshape(-1)

    def tree_flatten(self):
        return ((self.floor_height, self.vol),
                (self.floor_axis, self.flip_floor))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.floor_height, obj.vol = children
        obj.floor_axis, obj.flip_floor = aux
        return obj

    def energy(self, dx, x0, coeff=1.0):
        return coeff * floor_energy(self.floor_height, self.floor_axis,
                                    self.flip_floor, self.vol, dx, x0)

    def gradient(self, dx, x0, coeff=1.0):
        return coeff * floor_gradient(self.floor_height, self.floor_axis,
                                      self.flip_floor, self.vol, dx, x0)

    def hessian(self, dx, x0, coeff=1.0):
        return coeff * floor_hessian(self.floor_height, self.floor_axis,
                                     self.flip_floor, self.vol, dx, x0)


@jax.tree_util.register_pytree_node_class
class Boundary:
    """Pin selected points to fixed positions. Ref :595.

    Fixed-shape design: instead of an index list (dynamic size), keeps a
    dense per-point {0,1} mask and per-point target positions (zeros where
    unpinned) — same energy, static shapes for jit.
    """

    def __init__(self, integration_pt_volume):
        n = integration_pt_volume.reshape(-1).shape[0]
        self.pin_mask = jnp.zeros((n,), dtype=integration_pt_volume.dtype)
        self.pin_pos = jnp.zeros((n, 3), dtype=integration_pt_volume.dtype)

    def set_pinned(self, indices, pinned_x):
        """indices (K,) int, pinned_x (K, 3)."""
        self.pin_mask = self.pin_mask.at[indices].set(1.0)
        self.pin_pos = self.pin_pos.at[indices].set(pinned_x)
        return self

    def tree_flatten(self):
        return (self.pin_mask, self.pin_pos), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.pin_mask, obj.pin_pos = children
        return obj

    def energy(self, dx, x0, coeff=1.0):
        return coeff * boundary_energy(self.pin_pos, self.pin_mask, dx, x0)

    def gradient(self, dx, x0, coeff=1.0):
        return coeff * boundary_gradient(self.pin_pos, self.pin_mask, dx, x0)

    def hessian(self, dx, x0, coeff=1.0):
        return coeff * boundary_hessian(self.pin_pos, self.pin_mask, dx, x0)
