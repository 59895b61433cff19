"""Simplicits scene simulation: reduced-order implicit elastodynamics.

TPU-native analog of reference ``kaolin/physics/simplicits/simulation.py``
(SimulatedObject :46, SimplicitsScene :257, run_sim_step :1346).

Architecture shift (SURVEY §7): the reference assembles Warp BSR sparse
matrices and round-trips host↔device inside the Newton loop (energy
``.numpy()`` readbacks, python line search). Here B (3N×12H), dFdz (9N×12H)
and BMB are **dense** — at Simplicits scale every point touches every handle,
so the "sparse" operators are dense blocks anyway, and dense matmuls saturate
the MXU. The entire sim step (collision detection → energy/gradient/Hessian
assembly → Newton with Armijo line search → velocity update) compiles to ONE
XLA program with zero host syncs; CUDA-graph capture (ref :994-1066) is
subsumed by jit.
"""

from __future__ import annotations

import functools
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.physics.common.collisions import Collision
from kaolin_tpu.physics.common.optimization import newtons_method
from kaolin_tpu.physics.common.scene_forces import Boundary, Floor, Gravity
from kaolin_tpu.physics.materials.material_utils import to_lame
from kaolin_tpu.physics.materials.neohookean_elastic_material import (
    NeohookeanElasticMaterial,
)
from kaolin_tpu.physics.simplicits.precomputed import dFdz_matrix, lbs_matrix
from kaolin_tpu.physics.simplicits.skinning import standard_lbs
from kaolin_tpu.physics.simplicits.training import (
    SimplicitsObject,
    SkinnedPhysicsPoints,
)
from kaolin_tpu.physics.utils.torch_utilities import (
    hess_reduction,
    standard_transform_to_relative,
)

__all__ = ["SimulatedObject", "SimplicitsScene"]


class SimulatedObject(SkinnedPhysicsPoints):
    """Per-object simulation state + dense LBS operators. Ref :46."""

    def __init__(self, pts, yms, prs, rhos, appx_vol, skinning_weights, dwdx,
                 renderable=None, init_transform=None, is_kinematic=False,
                 normalize_weights_by_samples=False, apply_qr=False,
                 num_real_qp=None):
        handle_norms = None
        if normalize_weights_by_samples:
            handle_norms = jnp.clip(
                jnp.linalg.norm(skinning_weights, axis=0), 1e-10, None)
            skinning_weights = skinning_weights / handle_norms[None, :]
            dwdx = dwdx / handle_norms.reshape(1, -1, 1)
        super().__init__(pts, yms, prs, rhos, appx_vol, skinning_weights, dwdx,
                         renderable=renderable, num_real_qp=num_real_qp)
        self.handle_norms = handle_norms
        self.init_transform = init_transform
        self.is_kinematic = is_kinematic
        self.normalize_weights_by_samples = normalize_weights_by_samples
        self.apply_qr = apply_qr

        self.num_qp = self.pts.shape[0]
        self.num_cp = self.pts.shape[0]
        # phantom padding points (heterogeneous scene batching) carry zero
        # volume and mass: the quadrature rule integrates over the REAL
        # sample count only, so padding leaves the physics bit-identical
        n_real = self.num_qp if num_real_qp is None else int(num_real_qp)
        is_real = jnp.arange(self.num_qp) < n_real
        self.sample_vols = jnp.where(is_real, self.appx_vol / n_real, 0.0
                                     ).astype(self.dtype)
        self.sample_masses = jnp.where(is_real,
                                       (self.appx_vol / n_real) * self.rhos,
                                       0.0).astype(self.dtype)

        self.B_dense = lbs_matrix(self.pts, self.skinning_weights)
        if is_kinematic:
            self.dFdz_dense = jnp.zeros(
                (9 * self.num_qp, 12 * self.num_handles), dtype=self.dtype)
        else:
            self.dFdz_dense = dFdz_matrix(self.skinning_weights, self.dwdx,
                                          self.pts)

        self.qr_tfm = None
        self.qr_tfm_inv = None
        if apply_qr:
            self._apply_qr_decomposition()

        self.z = None
        self.z_prev = None
        self.z_dot = None
        self.reset_sim_state()

    def _apply_qr_decomposition(self):
        """Column-pivoted economic QR of B for conditioning (ref :123-188):
        B_old Π = Q R, K = Π R⁻¹ so B_new = B_old K = Q; dFdz_new = dFdz K.
        Host-side scipy (one-time precompute)."""
        from scipy.linalg import qr, solve_triangular
        np_b = np.asarray(self.B_dense)
        _, np_r, np_p = qr(np_b, mode="economic", pivoting=True)
        pmat = np.eye(np_b.shape[1], dtype=np_b.dtype)[:, np_p]
        rinv = solve_triangular(np_r, np.eye(np_r.shape[0], dtype=np_r.dtype))
        self.qr_tfm = jnp.asarray(pmat @ rinv)
        self.qr_tfm_inv = jnp.asarray(np_r @ pmat.T)
        self.B_dense = self.B_dense @ self.qr_tfm
        if not self.is_kinematic:
            self.dFdz_dense = self.dFdz_dense @ self.qr_tfm

    @classmethod
    def from_skinned_physics_points(cls, phys_pts, init_transform,
                                    is_kinematic=False,
                                    normalize_weights_by_samples=False,
                                    apply_qr=False):
        """Ref :206."""
        return cls(pts=phys_pts.pts, yms=phys_pts.yms, prs=phys_pts.prs,
                   rhos=phys_pts.rhos, appx_vol=phys_pts.appx_vol,
                   skinning_weights=phys_pts.skinning_weights,
                   dwdx=phys_pts.dwdx, renderable=phys_pts.renderable,
                   init_transform=init_transform, is_kinematic=is_kinematic,
                   normalize_weights_by_samples=normalize_weights_by_samples,
                   apply_qr=apply_qr,
                   num_real_qp=getattr(phys_pts, "num_real_qp", None))

    def reset_sim_state(self):
        """Reset handle transforms to the initial deformation. The constant
        (last) handle has weight 1 everywhere, so placing init_transform in
        it reproduces the rigid delta exactly (ref :229-247)."""
        z = jnp.zeros((self.num_handles * 12,), dtype=self.dtype)
        if self.init_transform is not None:
            scale = (self.handle_norms[-1]
                     if self.normalize_weights_by_samples else 1.0)
            z = z.at[-12:].set(jnp.asarray(self.init_transform).reshape(-1) * scale)
            if self.apply_qr:
                z = self.qr_tfm_inv @ z
        self.z = z
        self.z_prev = z
        self.z_dot = jnp.zeros_like(z)


class SimplicitsScene:
    """Scene assembly + jit-compiled implicit time stepping. Ref :257."""

    def __init__(self, direct_solve=True, timestep=0.03, max_newton_steps=5,
                 max_ls_steps=10, newton_hessian_regularizer=1e-4,
                 cg_tol=1e-4, cg_iters=100, conv_tol=1e-4, device=None,
                 use_cuda_graphs=False, differentiable=False):
        # device / use_cuda_graphs accepted for API parity; jit handles both.
        # differentiable=True runs Newton as a fixed-trip (reverse-mode
        # differentiable) loop instead of the early-exiting while_loop —
        # required to jax.grad through the sim step.
        self.dtype = jnp.float32
        self.direct_solve = direct_solve
        self.differentiable = bool(differentiable)
        self.timestep = float(timestep)
        self.current_sim_step = 0
        self.max_newton_steps = int(max_newton_steps)
        self.max_ls_steps = int(max_ls_steps)
        self.newton_hessian_regularizer = float(newton_hessian_regularizer)
        self.cg_tol = float(cg_tol)
        self.cg_iters = int(cg_iters)
        self.conv_tol = float(conv_tol)

        self.current_id = 0
        self.sim_obj_dict = {}

        self.force_dict = {"pt_wise": {}, "defo_grad_wise": {}}
        self._ready_for_forces = False
        self._step_fn = None
        self._scan_fn = None
        self._deformed_fns = {}
        self._deformed_fns = {}

        self.sim_z = None
        self.sim_z_prev = None
        self.sim_z_dot = None

        # collision capacity auto-resize (VERDICT r3 #2a: silently dropping
        # contacts is not a safety net): the jitted step OR-accumulates a
        # detection-overflow bitmask on-device; every
        # ``collision_resize_interval`` steps the host reads it (one scalar
        # readback) and, if tripped, re-measures capacities from the CURRENT
        # configuration and re-jits with escalating headroom.
        self.collision_auto_resize = True
        self.collision_resize_interval = 16
        self.collision_resizes = 0
        self._col_overflow = None   # device int32 bitmask (0 = healthy)

    # ---- object management ----
    def add_object(self, sim_object, num_qp=None, init_transform=None,
                   is_kinematic=False, renderable_pts=None,
                   normalize_weights_by_samples=True, apply_qr=True):
        """Add a SimplicitsObject (bakes weights) or SkinnedPhysicsPoints.
        Ref :684."""
        if self._ready_for_forces:
            raise RuntimeError("Cannot add object after a force is set")
        if init_transform is not None:
            relative = standard_transform_to_relative(init_transform)
        else:
            relative = jnp.zeros((3, 4), dtype=self.dtype)

        if isinstance(sim_object, SimplicitsObject):
            assert num_qp is not None, "'num_qp' required with SimplicitsObject"
            baked = sim_object.bake(num_qps=num_qp, renderable_pts=renderable_pts)
        else:
            assert renderable_pts is None
            baked = (sim_object.subsample(num_pts=num_qp)
                     if num_qp is not None else sim_object)
        obj = SimulatedObject.from_skinned_physics_points(
            baked, init_transform=relative, is_kinematic=is_kinematic,
            normalize_weights_by_samples=normalize_weights_by_samples,
            apply_qr=apply_qr)
        self.sim_obj_dict[self.current_id] = obj
        self.current_id += 1
        return self.current_id - 1

    def get_object(self, obj_idx):
        return self.sim_obj_dict[obj_idx]

    # ---- scene constants ----
    def _compute_sim_constants(self):
        """Stack per-object operators into scene-level dense operators.
        Ref :386."""
        objs = list(self.sim_obj_dict.values())
        if not objs:
            raise RuntimeError("scene has no objects")
        self.num_objects = len(objs)

        self.obj_qp_slices = []
        self.obj_z_slices = []
        qp0, z0 = 0, 0
        kin_dofs = []
        qp_is_kin = []
        qp_obj_ids = []
        for oid, obj in self.sim_obj_dict.items():
            self.obj_qp_slices.append(slice(qp0, qp0 + obj.num_qp))
            self.obj_z_slices.append(slice(z0, z0 + 12 * obj.num_handles))
            if obj.is_kinematic:
                kin_dofs.extend(range(z0, z0 + 12 * obj.num_handles))
            qp_is_kin.append(np.full(obj.num_qp, int(obj.is_kinematic)))
            qp_obj_ids.append(np.full(obj.num_qp, oid))
            qp0 += obj.num_qp
            z0 += 12 * obj.num_handles
        self.total_qp = qp0
        self.total_dofs = z0
        self.qp_is_kinematic = jnp.asarray(np.concatenate(qp_is_kin),
                                           dtype=jnp.int32)
        self.qp_to_object_map = jnp.asarray(np.concatenate(qp_obj_ids),
                                            dtype=jnp.int32)
        # phantom padding points (heterogeneous batching): excluded from
        # collision detection entirely — they are non-physical and sit far
        # outside the content bbox
        self.qp_is_phantom = jnp.asarray(np.concatenate([
            np.arange(o.num_qp) >= (o.num_qp if o.num_real_qp is None
                                    else int(o.num_real_qp))
            for o in objs]))
        self._has_phantoms = bool(np.any(np.asarray(self.qp_is_phantom)))
        mask = np.ones(z0, dtype=bool)
        mask[kin_dofs] = False
        self.dyn_idx = np.nonzero(mask)[0]

        self.sim_pts = jnp.concatenate([o.pts for o in objs], axis=0)
        self.sim_rhos = jnp.concatenate([o.rhos for o in objs])
        self.sim_vols = jnp.concatenate([o.sample_vols for o in objs])
        self.sim_masses = jnp.concatenate([o.sample_masses for o in objs])
        yms = jnp.concatenate([o.yms for o in objs])
        prs = jnp.concatenate([o.prs for o in objs])
        self.sim_mus, self.sim_lams = to_lame(yms, prs)

        # block-diagonal dense global operators
        def blockdiag(mats, rows, cols):
            out = jnp.zeros((sum(rows), sum(cols)), dtype=self.dtype)
            r, c = 0, 0
            for m, nr, nc in zip(mats, rows, cols):
                out = out.at[r:r + nr, c:c + nc].set(m)
                r += nr
                c += nc
            return out

        self.sim_B = blockdiag([o.B_dense for o in objs],
                               [3 * o.num_qp for o in objs],
                               [12 * o.num_handles for o in objs])
        self.sim_dFdz = blockdiag([o.dFdz_dense for o in objs],
                                  [9 * o.num_qp for o in objs],
                                  [12 * o.num_handles for o in objs])
        m_diag = jnp.repeat(self.sim_masses, 3)
        self.sim_BMB = self.sim_B.T @ (m_diag[:, None] * self.sim_B)

        self._sim_B_raw = None  # lazy; see sim_B_raw property

        # QR rotations (ref :487-516)
        if any(o.apply_qr for o in objs):
            blocks, red_blocks, red_inv_blocks = [], [], []
            for o in objs:
                dd = 12 * o.num_handles
                tf = o.qr_tfm if o.apply_qr else jnp.eye(dd, dtype=self.dtype)
                tfi = o.qr_tfm_inv if o.apply_qr else jnp.eye(dd, dtype=self.dtype)
                blocks.append(tf)
                if not o.is_kinematic:
                    red_blocks.append(tf)
                    red_inv_blocks.append(tfi)
            self.sim_qr_tfm = blockdiag(blocks, [b.shape[0] for b in blocks],
                                        [b.shape[1] for b in blocks])
            if red_blocks:
                self.sim_qr_tfm_red = blockdiag(
                    red_blocks, [b.shape[0] for b in red_blocks],
                    [b.shape[1] for b in red_blocks])
                self.sim_qr_tfm_inv_red = blockdiag(
                    red_inv_blocks, [b.shape[0] for b in red_inv_blocks],
                    [b.shape[1] for b in red_inv_blocks])
            else:
                self.sim_qr_tfm_red = None
                self.sim_qr_tfm_inv_red = None
        else:
            self.sim_qr_tfm = None
            self.sim_qr_tfm_red = None
            self.sim_qr_tfm_inv_red = None

        elastic = NeohookeanElasticMaterial(
            mu=self.sim_mus, lam=self.sim_lams,
            integration_pt_volume=self.sim_vols, reparameterize_lame=True)
        self.force_dict["defo_grad_wise"]["material"] = {
            "object": elastic, "coeff": 1.0}

    def _get_scene_ready_for_forces(self):
        if not self.sim_obj_dict:
            raise RuntimeError("scene has no objects to apply forces on")
        self._compute_sim_constants()
        self.reset_scene()
        self._ready_for_forces = True

    @property
    def sim_B_raw(self):
        """Raw (pre-QR) LBS rows, (3N, D). Built lazily — the sim step uses
        the per-particle Kronecker factors (w, [x;1]) instead of
        materializing jacobian rows (collisions.py module docstring); this
        exists for tests/tools that want the explicit operator."""
        if self._sim_B_raw is None:
            objs = list(self.sim_obj_dict.values())
            self._sim_B_raw = blockdiag(
                [lbs_matrix(o.pts, o.skinning_weights) for o in objs],
                [3 * o.num_qp for o in objs],
                [12 * o.num_handles for o in objs])
        return self._sim_B_raw

    # ---- forces (ref :755-875) ----
    def set_scene_gravity(self, acc_gravity=(0.0, 9.8, 0.0), gravity_coeff=1.0):
        if not self._ready_for_forces:
            self._get_scene_ready_for_forces()
        g = jnp.asarray(acc_gravity, dtype=self.dtype)
        self.force_dict["pt_wise"]["gravity"] = {
            "object": Gravity(g, self.sim_rhos, self.sim_vols),
            "coeff": float(gravity_coeff)}
        self._step_fn = None
        self._scan_fn = None
        self._deformed_fns = {}

    def set_scene_floor(self, floor_height=0.0, floor_axis=1,
                        floor_penalty=10000.0, flip_floor=False):
        if not self._ready_for_forces:
            self._get_scene_ready_for_forces()
        self.force_dict["pt_wise"]["floor"] = {
            "object": Floor(floor_height, floor_axis, flip_floor,
                            jnp.ones_like(self.sim_vols)),
            "coeff": float(floor_penalty)}
        self._step_fn = None
        self._scan_fn = None
        self._deformed_fns = {}

    def set_object_boundary_condition(self, obj_idx, name, fcn,
                                      bdry_penalty=10000.0, pinned_x=None):
        """Pin points of an object selected by ``fcn(pts) -> bool mask``.
        Ref :801."""
        if not self._ready_for_forces:
            self._get_scene_ready_for_forces()
        boundary = Boundary(self.sim_vols)
        sl = self.obj_qp_slices[obj_idx]
        deformed = self.get_object_deformed_pts(obj_idx, points="simulated")
        sel = np.nonzero(np.asarray(fcn(deformed)))[0]
        global_idx = np.arange(sl.start, sl.stop)[sel]
        bdry_pos = deformed[sel]
        if pinned_x is None:
            pinned_x = bdry_pos
        boundary.set_pinned(jnp.asarray(global_idx), jnp.asarray(pinned_x))
        self.force_dict["pt_wise"][name] = {
            "object": boundary, "coeff": float(bdry_penalty)}
        self._step_fn = None
        self._scan_fn = None
        self._deformed_fns = {}
        return pinned_x

    # contact-particle count above which the grid broad phase is the
    # product default (the reference always uses wp.HashGrid, ref :641;
    # here small scenes keep the dense pair matrix, whose single fused
    # mask beats the grid's sort+searchsorted overhead below ~2k points)
    GRID_BROAD_PHASE_THRESHOLD = 2048

    def enable_collisions(self, collision_particle_radius=0.1,
                          detection_ratio=1.5, impenetrable_barrier_ratio=0.25,
                          collision_penalty=1000.0, max_contact_pairs=10000,
                          friction=0.5, broad_phase=None, cell_capacity=None,
                          sweep_window=None, slot_contact_capacity=None,
                          max_occupied_cells=None):
        """Ref :838.

        ``broad_phase``: ``"dense"`` (exact O(N²) pair matrix), ``"grid"``
        (occupied-cell-compacted grid — one sort + slot scatter; candidate
        blocks over occupied cells only; the TPU analog of the reference's
        ``wp.HashGrid``), ``"sweep"`` (sort-and-window sweep — for
        elongated distributions with bounded axis density), or None (auto —
        grid at/above ``GRID_BROAD_PHASE_THRESHOLD`` contact particles,
        dense below). ``cell_capacity`` (points per cell) and
        ``max_occupied_cells`` default to sizes measured on the REST
        configuration with headroom; overflow during simulation is surfaced
        by :meth:`collision_diagnostics` and auto-resized.
        ``slot_contact_capacity`` is accepted for API compatibility and
        ignored (the per-particle compaction stage no longer exists).
        """
        if not self._ready_for_forces:
            self._get_scene_ready_for_forces()
        auto_broad = broad_phase is None
        if broad_phase is None:
            broad_phase = ("grid" if self.total_qp >=
                           self.GRID_BROAD_PHASE_THRESHOLD else "dense")
        if broad_phase == "sweep" and sweep_window is None:
            sweep_window = self._auto_sweep_window(
                collision_particle_radius, detection_ratio)
        collision = Collision(
            dt=self.timestep,
            collision_particle_radius=collision_particle_radius,
            detection_ratio=detection_ratio,
            impenetrable_barrier_ratio=impenetrable_barrier_ratio,
            collision_penalty_stiffness=collision_penalty,
            friction_regularization=0.1, friction_fluid=0.1,
            friction=friction,
            max_contacting_pairs=min(max_contact_pairs,
                                     self.total_qp * (self.total_qp - 1) // 2),
            bounds=True, broad_phase=broad_phase,
            cell_capacity=16 if cell_capacity is None else cell_capacity,
            sweep_window=128 if sweep_window is None else sweep_window,
            max_occupied_cells=(2048 if max_occupied_cells is None
                                else max_occupied_cells))
        if broad_phase == "grid":
            # geometry/capacities from REAL points only: phantom padding
            # points (heterogeneous batching) sit far outside the content
            # bbox and would blow the grid span; at runtime they clamp into
            # boundary cells and the exact distance test rejects them
            real = np.concatenate([
                np.arange(o.num_qp) < (o.num_qp if o.num_real_qp is None
                                       else int(o.num_real_qp))
                for o in self.sim_obj_dict.values()])
            collision.configure_grid(
                np.asarray(self.sim_pts)[real],
                obj_ids=np.asarray(self.qp_to_object_map)[real],
                headroom_k=1.25,
                auto_capacities=(cell_capacity is None
                                 or max_occupied_cells is None))
            if cell_capacity is not None:
                collision.cell_capacity = int(cell_capacity)
            if max_occupied_cells is not None:
                collision.max_occupied_cells = int(max_occupied_cells)
            if auto_broad:
                # grid cells can never shrink below the detection radius, so
                # dense point clouds packed tighter than the radius corner
                # the grid into huge cell capacities where the candidate
                # blocks (M·14·K²) dwarf the exact N² matrix. Pick whichever
                # narrow-phase test count is smaller (host-side, configure
                # time): for such scenes the dense broad phase IS the fast
                # path on TPU (one (N, N) distance block, no slot padding).
                n_real = int(np.sum(real))
                grid_tests = (collision.max_occupied_cells * 14
                              * collision.cell_capacity ** 2)
                if n_real * n_real < grid_tests:
                    collision.broad_phase = "dense"
        self.force_dict["collision"] = {"object": collision,
                                        "coeff": float(collision_penalty)}
        self._step_fn = None
        self._scan_fn = None
        self._deformed_fns = {}

    def _collision_provably_empty(self):
        """True when the enabled collision force can NEVER produce a contact,
        so the step may skip detection entirely with identical semantics.

        The narrow phase ignores same-object pairs whose REST squared
        distance is under ``collision_radius * ignore_self_collision_ratio``
        (the reference kernel's dimensional quirk, ref
        ``kaolin/physics/common/collision.py:66-72``; the huge default ratio
        effectively disables self-collision). Rest distances never change, so
        for a SINGLE collision-active object whose rest bbox diagonal²
        stays under that bound, every candidate pair is immune forever —
        detection is a semantic no-op. The reference pays a HashGrid query
        per step to discover the empty set; a query is latency-cheap on GPU
        but block-padded on TPU, so proving emptiness host-side and skipping
        is the TPU-shaped answer (scene floors/boundaries are separate
        forces and unaffected)."""
        if "collision" not in self.force_dict:
            return True
        col = self.force_dict["collision"]["object"]
        ids = np.asarray(self.qp_to_object_map)
        if self._has_phantoms:
            ids = ids[~np.asarray(self.qp_is_phantom)]
        if np.unique(ids).size > 1:
            return False
        pts = np.asarray(self.sim_pts)
        diag2 = float(((pts.max(0) - pts.min(0)) ** 2).sum())
        return diag2 < col.collision_radius * col.ignore_self_collision_ratio

    def _auto_sweep_window(self, collision_particle_radius, detection_ratio,
                           margin=1.5, minimum=64):
        """Size the sweep window from the REST configuration: the max number
        of points inside any point's detection slab along the longest axis,
        with headroom for deformation (overflow during sim is surfaced by
        :meth:`collision_diagnostics`)."""
        pts = np.asarray(self.sim_pts)
        axis = int(np.argmax(pts.max(0) - pts.min(0)))
        key = np.sort(pts[:, axis])
        radius = 2.0 * collision_particle_radius * detection_ratio
        load = np.searchsorted(key, key + radius, side="right") \
            - np.arange(key.shape[0]) - 1
        want = int(load.max() * margin) + 8
        return int(min(max(minimum, 1 << int(np.ceil(np.log2(max(want, 1))))),
                       self.total_qp))

    def collision_diagnostics(self):
        """Capacity-overflow surfacing for the enabled collision force at the
        scene's CURRENT state: ``num_pairs``, ``contacts_overflow`` and (grid
        broad phase) ``max_bucket_load`` / ``cell_overflow``. See
        :meth:`Collision.detection_diagnostics`."""
        if "collision" not in self.force_dict:
            raise RuntimeError("collisions are not enabled on this scene")
        col = self.force_dict["collision"]["object"]
        dx = (self.sim_B @ self.sim_z).reshape(-1, 3)
        return col.detection_diagnostics(
            dx, self.sim_pts, self.qp_to_object_map, self.qp_is_kinematic,
            cp_exclude=self.qp_is_phantom if self._has_phantoms else None)

    # ---- state ----
    def reset_scene(self):
        """Ref :943."""
        self.current_sim_step = 0
        zs = []
        for obj in self.sim_obj_dict.values():
            obj.reset_sim_state()
            zs.append(obj.z)
        self.sim_z = jnp.concatenate(zs)
        self.sim_z_prev = jnp.zeros_like(self.sim_z)
        self.sim_z_dot = jnp.zeros_like(self.sim_z)
        self._col_overflow = None

    def set_object_initial_transform(self, object_id, init_transform):
        """Ref :594."""
        if self.current_sim_step > 0:
            raise ValueError("cannot set initial transform mid-simulation")
        obj = self.sim_obj_dict[object_id]
        if obj.is_kinematic:
            raise ValueError("use set_kinematic_object_transform for kinematic objects")
        obj.init_transform = standard_transform_to_relative(init_transform)
        self.reset_scene()

    def set_kinematic_object_transform(self, obj_idx, transform):
        """Script a kinematic object's motion mid-sim. Ref :734."""
        obj = self.sim_obj_dict[obj_idx]
        if not obj.is_kinematic:
            raise ValueError("object is not kinematic")
        obj.init_transform = standard_transform_to_relative(transform)
        obj.reset_sim_state()
        sl = self.obj_z_slices[obj_idx]
        self.sim_z = self.sim_z.at[sl].set(obj.z)

    # ---- queries ----
    def _get_object_transforms_internal(self, object_id):
        """Transforms in the (normalized, pre-QR) weight space. Ref :623."""
        obj = self.sim_obj_dict[object_id]
        if self.sim_z is not None and self._ready_for_forces:
            tfms = self.sim_z[self.obj_z_slices[object_id]]
        else:
            tfms = obj.z
        if obj.apply_qr:
            tfms = obj.qr_tfm @ tfms
        tfms = tfms.reshape(-1, 3, 4)
        pad = jnp.zeros((tfms.shape[0], 1, 4), dtype=self.dtype).at[:, 0, 3].set(1.0)
        return jnp.concatenate([tfms, pad], axis=1)

    def get_object_transforms(self, object_id):
        """Relative 4x4 transforms in raw physical space. Ref :657."""
        tfms = self._get_object_transforms_internal(object_id)
        obj = self.sim_obj_dict[object_id]
        if obj.normalize_weights_by_samples:
            tfms = tfms.at[:, :3, :].set(
                tfms[:, :3, :] / obj.handle_norms.reshape(-1, 1, 1))
        return tfms

    def get_object_deformed_pts(self, obj_idx, points="simulated"):
        """LBS of the object's (simulated or renderable) points by its
        current transforms. Ref :1265.

        The z → transforms → LBS chain compiles to ONE cached jit per
        (object, points) pair, so calling this every frame (the render loop
        of a simulatable-gaussians scene) costs a single dispatch instead
        of ~8 eager ops."""
        obj = self.sim_obj_dict[obj_idx]
        if points == "rendered" and obj.renderable is None:
            raise ValueError(f"object {obj_idx} has no renderable points")
        key = (obj_idx, points)
        if key not in self._deformed_fns:
            if points == "rendered":
                pts = obj.renderable.pts
                weights = obj.renderable.skinning_weights
            else:
                pts = obj.pts
                weights = obj.skinning_weights
            sl = self.obj_z_slices[obj_idx]
            qr_tfm = obj.qr_tfm if obj.apply_qr else None
            norms = (obj.handle_norms if (points == "rendered"
                                          and obj.normalize_weights_by_samples)
                     else None)

            @jax.jit
            def deformed(z):
                tfms = z[sl]
                if qr_tfm is not None:
                    tfms = qr_tfm @ tfms
                tfms = tfms.reshape(-1, 3, 4)
                if norms is not None:
                    tfms = tfms / norms.reshape(-1, 1, 1)
                return standard_lbs(pts, tfms[None], weights).reshape(
                    pts.shape[0], 3)

            self._deformed_fns[key] = deformed
        z = (self.sim_z if (self.sim_z is not None and self._ready_for_forces)
             else None)
        if z is None:
            # pre-assembly state: fall back to the eager per-object path
            if points == "rendered":
                pts = obj.renderable.pts
                weights = obj.renderable.skinning_weights
                tfms = self.get_object_transforms(obj_idx)[:, :3, :]
            else:
                pts = obj.pts
                weights = obj.skinning_weights
                tfms = self._get_object_transforms_internal(obj_idx)[:, :3, :]
            return standard_lbs(pts, tfms[None], weights).reshape(
                pts.shape[0], 3)
        return self._deformed_fns[key](z)

    def get_object_point_transforms(self, obj_idx, points="simulated"):
        """Absolute per-point 4x4 transforms. Ref :1297."""
        obj = self.sim_obj_dict[obj_idx]
        if points == "rendered":
            weights = obj.renderable.skinning_weights
            transforms = self.get_object_transforms(obj_idx)
        else:
            weights = obj.skinning_weights
            transforms = self._get_object_transforms_internal(obj_idx)
        per_pt = jnp.sum(weights[..., None, None] * transforms[None], axis=1)
        per_pt = per_pt.at[:, :3, :3].add(jnp.eye(3, dtype=per_pt.dtype))
        per_pt = per_pt.at[:, 3, :].set(0.0)
        return per_pt.at[:, 3, 3].set(1.0)

    # ---- the functional core ----
    def build_functional_step(self, with_diag=False):
        """The scene's implicit time step as a PURE function over a pytree of
        scene constants. Returns ``(step_fn, consts)`` with

        ``step_fn(consts, z, z_prev, z_dot) -> (z_new, z_prev_out, z_dot_new)``

        With ``with_diag=True`` the step returns a fourth output: an int32
        overflow bitmask (:meth:`Collision.diag_flags`) of THIS step's
        collision detection — 0 when healthy or when collisions are off.

        ``step_fn`` closes only over static Python config (solver knobs,
        force order, DOF slices); every array — operators, force parameters
        (forces are registered pytrees), QR rotations — flows through
        ``consts``. The SAME function therefore serves (a) the single-scene
        jit of :meth:`run_sim_step`, (b) ``lax.scan`` rollouts
        (:meth:`run_sim_steps`), and (c) ``vmap``/``shard_map`` scene-batch
        parallelism over the REAL simulator
        (``kaolin_tpu.parallel.simplicits``). Ref: energy/gradient/Hessian
        assembly ``simulation.py:959-1252`` + ``run_sim_step:1346``.
        """
        dt = self.timestep
        reg = self.newton_hessian_regularizer
        dtype = self.dtype
        total_dofs = self.total_dofs
        dyn_idx = self.dyn_idx
        obj_slices = list(zip(self.obj_qp_slices, self.obj_z_slices))
        has_collision = ("collision" in self.force_dict
                         and not self._collision_provably_empty())
        collision_bounds = (has_collision
                            and self.force_dict["collision"]["object"].bounds)
        nm_kwargs = dict(nm_max_iters=self.max_newton_steps,
                         cg_tol=self.cg_tol, cg_iters=self.cg_iters,
                         conv_tol=self.conv_tol,
                         direct_solve=self.direct_solve,
                         max_ls_steps=self.max_ls_steps,
                         differentiable=self.differentiable)
        eye3 = jnp.eye(3, dtype=dtype)

        objs = list(self.sim_obj_dict.values())
        consts = {
            "B": self.sim_B,
            "dFdz": self.sim_dFdz,
            "BMB": self.sim_BMB,
            "pts": self.sim_pts,
            "obj_Bs": [o.B_dense for o in objs],
            "obj_dFdzs": [o.dFdz_dense for o in objs],
            "qr_tfm": self.sim_qr_tfm,
            "qr_red": self.sim_qr_tfm_red,
            "qr_red_inv": self.sim_qr_tfm_inv_red,
            "qp_obj_ids": self.qp_to_object_map,
            "qp_is_kin": self.qp_is_kinematic,
            "pt_forces": [(f["object"], jnp.asarray(f["coeff"], dtype))
                          for f in self.force_dict["pt_wise"].values()],
            "defo_forces": [(f["object"], jnp.asarray(f["coeff"], dtype))
                            for f in self.force_dict["defo_grad_wise"].values()],
        }
        if has_collision:
            consts["collision"] = self.force_dict["collision"]["object"]
            consts["collision_coeff"] = jnp.asarray(
                self.force_dict["collision"]["coeff"], dtype)
            consts["qp_is_phantom"] = (self.qp_is_phantom
                                       if self._has_phantoms else None)
            # global block-diagonal skinning weights (N, H_total): the
            # q-form contact factors w ⊗ [x;1] are built from these at
            # detection so the Newton loop never gathers (collisions.py
            # module docstring)
            wblocks = jnp.zeros((self.total_qp, self.total_dofs // 12),
                                dtype=dtype)
            h0 = 0
            for o, (qsl, _) in zip(objs, obj_slices):
                wblocks = wblocks.at[
                    qsl, h0:h0 + o.num_handles].set(o.skinning_weights)
                h0 += o.num_handles
            consts["col_w"] = wblocks

        def step(c, z, z_prev_in, z_dot):
            B, dFdz, BMB, pts = c["B"], c["dFdz"], c["BMB"], c["pts"]
            collision = c.get("collision")
            collision_coeff = c.get("collision_coeff")

            def dx_of(z_):
                return (B @ z_).reshape(-1, 3)

            def F_of(z_):
                return (dFdz @ z_).reshape(-1, 3, 3) + eye3

            # detect collisions at step start (ref run_sim_step :1353).
            # Contacts carry the Kronecker factors w ⊗ [x;1] of their LBS
            # jacobian rows, so offsets / pullbacks / bounds below are all
            # dense matmuls — no (3C, D) jacobian, no gathers in the Newton
            # loop (collisions.py module docstring).
            qr = c["qr_tfm"]
            diag_flags = jnp.int32(0)
            if has_collision:
                dx0 = dx_of(z)
                contacts, det_diag = collision.detect_collisions(
                    dx0, pts, c["qp_obj_ids"], c["qp_is_kin"],
                    weights=c["col_w"], cp_exclude=c.get("qp_is_phantom"),
                    return_diag=True)
                diag_flags = type(collision).diag_flags(det_diag)

                def zq_of(z_):
                    dzq = z_ - z
                    return dzq if qr is None else qr @ dzq

                def to_post(g_raw):
                    return g_raw if qr is None else qr.T @ g_raw
            else:
                contacts = None

            def assemble_energy(z_, delta_dz, contacts):
                dx = dx_of(z_)
                F = F_of(z_)
                pe = jnp.asarray(0.0, dtype=dtype)
                for obj, coeff in c["pt_forces"]:
                    pe = pe + obj.energy(dx, pts, coeff)
                for obj, coeff in c["defo_forces"]:
                    pe = pe + obj.energy(F, coeff)
                if has_collision:
                    pe = pe + collision.energy(contacts,
                                               coeff=collision_coeff,
                                               zq=zq_of(z_))
                ke = 0.5 * delta_dz @ (BMB @ delta_dz)
                return ke + dt * dt * pe

            def assemble_gradient(z_, delta_dz, contacts):
                dx = dx_of(z_)
                F = F_of(z_)
                dEdx = jnp.zeros_like(dx)
                for obj, coeff in c["pt_forces"]:
                    dEdx = dEdx + obj.gradient(dx, pts, coeff)
                dEdF = jnp.zeros_like(F)
                for obj, coeff in c["defo_forces"]:
                    dEdF = dEdF + obj.gradient(F, coeff)
                g = B.T @ dEdx.reshape(-1) + dFdz.T @ dEdF.reshape(-1)
                if has_collision:
                    c_dEdx = collision.gradient(contacts,
                                                coeff=collision_coeff,
                                                zq=zq_of(z_))
                    g = g + to_post(
                        collision.pullback_gradient(contacts, c_dEdx))
                return BMB @ delta_dz + dt * dt * g

            def assemble_hessian(z_, contacts):
                dx = dx_of(z_)
                F = F_of(z_)
                d2Edx2 = jnp.zeros(dx.shape[:1] + (3, 3), dtype=dtype)
                for obj, coeff in c["pt_forces"]:
                    d2Edx2 = d2Edx2 + obj.hessian(dx, pts, coeff)
                d2EdF2 = jnp.zeros(F.shape[:1] + (9, 9), dtype=dtype)
                for obj, coeff in c["defo_forces"]:
                    d2EdF2 = d2EdF2 + obj.hessian(F, coeff)
                H = jnp.zeros((total_dofs, total_dofs), dtype=dtype)
                for oB, odFdz, (qsl, zsl) in zip(c["obj_Bs"], c["obj_dFdzs"],
                                                 obj_slices):
                    h_ii = hess_reduction(oB, d2Edx2[qsl]) + \
                        hess_reduction(odFdz, d2EdF2[qsl])
                    H = H.at[zsl, zsl].add(h_ii)
                if has_collision:
                    c_h = collision.hessian(contacts, coeff=collision_coeff,
                                            zq=zq_of(z_))
                    c_H = collision.reduced_hessian(contacts, c_h)
                    if qr is not None:
                        c_H = qr.T @ c_H @ qr
                    H = H + c_H
                return BMB + dt * dt * H + reg * jnp.eye(total_dofs,
                                                         dtype=dtype)

            z_prev = z

            def delta_of(z_):
                return z_ - z_prev - dt * z_dot

            energy_fn = lambda z_: assemble_energy(z_, delta_of(z_), contacts)  # noqa: E731
            grad_fn = lambda z_: assemble_gradient(z_, delta_of(z_), contacts)  # noqa: E731
            hess_fn = lambda z_: assemble_hessian(z_, contacts)  # noqa: E731

            if collision_bounds:
                def bounds_fn(dz_full, z_):
                    dzq = dz_full if qr is None else qr @ dz_full
                    return collision.get_bounds_q(contacts, dzq, zq_of(z_))
            else:
                bounds_fn = None

            z_new = newtons_method(
                z, energy_fn, grad_fn, hess_fn, bounds_fcn=bounds_fn,
                dyn_idx=dyn_idx, bounds_qr_tfm=c["qr_red"],
                bounds_qr_tfm_inv=c["qr_red_inv"], **nm_kwargs)
            z_dot_new = (z_new - z_prev) / dt
            if with_diag:
                return z_new, z_prev, z_dot_new, diag_flags
            return z_new, z_prev, z_dot_new

        return step, consts

    def _build_step_fn(self):
        # consts flow as runtime ARGUMENTS (device arrays), not as closure
        # captures: capturing would bake the dense operators (B, dFdz, ...)
        # into the HLO as literal constants — hundreds of MB of program text
        # at 10k+ qp, which inflates compiles and overflows remote-compile
        # transports
        step, consts = self.build_functional_step(with_diag=True)

        # the overflow bitmask OR-accumulates on-device (no extra dispatch,
        # no host sync): the host polls it sparsely via
        # check_collision_capacity
        @jax.jit
        def stepped(c, z, z_prev, z_dot, ovf):
            z1, zp, zd, flags = step(c, z, z_prev, z_dot)
            return z1, zp, zd, ovf | flags

        return lambda z, z_prev, z_dot, ovf: stepped(consts, z, z_prev,
                                                     z_dot, ovf)

    def run_sim_step(self):
        """Run one implicit time step — a single compiled XLA call.
        Ref :1346."""
        if not self._ready_for_forces:
            raise RuntimeError("Forces need to be set")
        if self._step_fn is None:
            self._step_fn = self._build_step_fn()
        if self._col_overflow is None:
            self._col_overflow = jnp.int32(0)
        (self.sim_z, self.sim_z_prev, self.sim_z_dot,
         self._col_overflow) = self._step_fn(
            self.sim_z, self.sim_z_prev, self.sim_z_dot, self._col_overflow)
        self.current_sim_step += 1
        if (self.collision_auto_resize and "collision" in self.force_dict
                and self.current_sim_step % self.collision_resize_interval
                == 0):
            self.check_collision_capacity()

    def run_sim_steps(self, num_steps):
        """Run ``num_steps`` implicit time steps as ONE compiled
        ``lax.scan`` rollout — zero per-step dispatch overhead.

        Semantically identical to calling :meth:`run_sim_step` ``num_steps``
        times (same step function scanned on-device); use it whenever no
        host-side scripting (kinematic transforms, force changes) is needed
        between steps. This is the TPU answer to the reference's CUDA-graph
        capture (ref simulation.py:994-1066) — and goes further, also
        removing the per-step launch/dispatch round-trip.
        """
        if not self._ready_for_forces:
            raise RuntimeError("Forces need to be set")
        if self._scan_fn is None:
            step, consts = self.build_functional_step(with_diag=True)

            # consts as runtime args (see _build_step_fn)
            @functools.partial(jax.jit, static_argnames="n")
            def rollout(c, z, z_prev, z_dot, ovf, n):
                def body(carry, _):
                    z1, zp, zd, flags = step(c, *carry[:3])
                    return (z1, zp, zd, carry[3] | flags), None
                carry, _ = jax.lax.scan(body, (z, z_prev, z_dot, ovf), None,
                                        length=n)
                return carry
            self._scan_fn = functools.partial(rollout, consts)
        if self._col_overflow is None:
            self._col_overflow = jnp.int32(0)
        (self.sim_z, self.sim_z_prev, self.sim_z_dot,
         self._col_overflow) = self._scan_fn(
            self.sim_z, self.sim_z_prev, self.sim_z_dot, self._col_overflow,
            n=int(num_steps))
        self.current_sim_step += int(num_steps)
        if self.collision_auto_resize and "collision" in self.force_dict:
            self.check_collision_capacity()

    def check_collision_capacity(self):
        """Poll the on-device detection-overflow bitmask (ONE scalar
        readback). If any detection since the last check dropped points,
        contacts, or pairs (VERDICT r3 #2a), re-measure grid capacities from
        the CURRENT deformed configuration with escalating headroom, rebuild
        the step functions, and return the tripped bitmask (0 = healthy).

        Called automatically every ``collision_resize_interval`` steps (and
        after every :meth:`run_sim_steps` rollout) while
        ``collision_auto_resize`` is True; safe to call manually.
        """
        if "collision" not in self.force_dict or self._col_overflow is None:
            return 0
        flags = int(np.asarray(self._col_overflow))
        if flags == 0:
            return 0
        self._resize_collision_capacities(flags)
        return flags

    def _resize_collision_capacities(self, flags):
        col = self.force_dict["collision"]["object"]
        self.collision_resizes += 1
        headroom = 1.5 * (2.0 ** min(self.collision_resizes - 1, 4))
        cur = np.asarray(self.sim_pts) + np.asarray(
            (self.sim_B @ self.sim_z)).reshape(-1, 3)
        real = (~np.asarray(self.qp_is_phantom) if self._has_phantoms
                else slice(None))
        if col.broad_phase == "grid":
            old = (col.grid_dims, col.cell_capacity,
                   col.max_occupied_cells)
            col.configure_grid(
                cur[real], obj_ids=np.asarray(self.qp_to_object_map)[real],
                headroom=headroom,
                bounds_pts=np.asarray(self.sim_pts)[real])
            warnings.warn(
                f"collision capacity overflow (flags={flags:#x}); grid "
                f"re-measured from the current configuration: dims/K/M "
                f"{old} -> {(col.grid_dims, col.cell_capacity, col.max_occupied_cells)}"
                f" (resize #{self.collision_resizes}, re-jit follows)")
        if flags & type(col).FLAG_CONTACTS_OVERFLOW:
            col.max_contacts = int(min(
                max(col.max_contacts * 2, 1024),
                self.total_qp * (self.total_qp - 1) // 2))
        if flags & type(col).FLAG_PP_OVERFLOW:
            col.point_contact_capacity = int(min(
                max(col.point_contact_capacity * 2, 8),
                14 * col.cell_capacity))
        if flags & type(col).FLAG_WINDOW_OVERFLOW:
            col.sweep_window = int(min(col.sweep_window * 2, self.total_qp))
        self._col_overflow = jnp.int32(0)
        self._step_fn = None
        self._scan_fn = None
