"""Particle-particle penalty contact with friction.

TPU-native analog of reference ``kaolin/physics/common/collisions.py``
(detection kernel :37, energy :159, gradient :256, hessian :366, bounds :509,
Collision :578).

Fixed-shape design for XLA: detection emits a capacity-bounded contact
buffer with a validity mask via ``jnp.nonzero(..., size=max_contacts)`` (the
reference also caps contacts at ``max_contacting_pairs``). Two broad phases
share that narrow phase:

* ``dense`` — the (N, N) pairwise-distance mask; simplest, exact, O(N²).
* ``grid`` — the TPU answer to the reference's ``wp.HashGrid`` (ref :641):
  spatial-hash cells of side = detection radius, points sorted by cell key,
  per-point candidate lookup over the 27 neighbor cells by ``searchsorted``
  into the sorted keys with a fixed ``cell_capacity`` read per cell. O(N·27·K)
  with static shapes; hash collisions only add candidates (rejected by the
  exact distance test), never lose pairs. Capacity overflow (a cell holding
  more than ``cell_capacity`` points, or more than ``max_contacts`` true
  pairs) is surfaced via :meth:`detection_diagnostics`.

All energy/gradient/hessian terms are batched over the contact axis and
masked.

Energy model (ref :159-254): quadratic-log barrier on the normal gap
``E = −(d̂−1)² log(d̂−rp)`` active for ``rp < d̂ ≤ 1``, plus regularized
stick-slip Coulomb friction on the tangential slip velocity.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Collision", "Contacts"]

NULL = -1


class Contacts(NamedTuple):
    """Fixed-capacity contact buffer (all shapes (C,) or (C, 3))."""
    indices_a: jnp.ndarray      # int32, NULL for static/invalid
    indices_b: jnp.ndarray
    normals: jnp.ndarray        # (C, 3)
    kinematic_gaps: jnp.ndarray  # (C, 3)
    valid: jnp.ndarray          # bool (C,)
    dx0: jnp.ndarray            # (N, 3) displacements at start of timestep


@jax.tree_util.register_pytree_node_class
class Collision:
    """Scene-wide particle contact. Ref :578.

    Pytree: the float parameters are children (so scene batches may vary
    them); ``max_contacts`` (a buffer capacity) and ``bounds`` are static aux.
    """

    def __init__(self, dt, collision_particle_radius=0.1, detection_ratio=1.5,
                 impenetrable_barrier_ratio=0.5,
                 ignore_self_collision_ratio=100000.0,
                 collision_penalty_stiffness=100.0,
                 friction_regularization=0.1, friction_fluid=0.1, friction=0.5,
                 max_contacting_pairs=10000, bounds=True,
                 broad_phase="dense", cell_capacity=16, sweep_window=128):
        self.dt = float(dt)
        self.collision_radius = float(collision_particle_radius)
        self.collision_detection_ratio = float(detection_ratio)
        self.collision_barrier_ratio = float(impenetrable_barrier_ratio)
        self.ignore_self_collision_ratio = float(ignore_self_collision_ratio)
        self.collision_penalty_stiffness = float(collision_penalty_stiffness)
        self.friction_reg = float(friction_regularization)
        self.friction_fluid = float(friction_fluid)
        self.friction = float(friction)
        self.max_contacts = int(max_contacting_pairs)
        self.bounds = bounds
        if broad_phase not in ("dense", "grid", "sweep"):
            raise ValueError(f"unknown broad_phase {broad_phase!r}")
        self.broad_phase = broad_phase
        self.cell_capacity = int(cell_capacity)
        self.sweep_window = int(sweep_window)

    def tree_flatten(self):
        children = (self.dt, self.collision_radius,
                    self.collision_detection_ratio,
                    self.collision_barrier_ratio,
                    self.ignore_self_collision_ratio,
                    self.collision_penalty_stiffness,
                    self.friction_reg, self.friction_fluid, self.friction)
        return children, (self.max_contacts, self.bounds, self.broad_phase,
                          self.cell_capacity, self.sweep_window)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (obj.dt, obj.collision_radius, obj.collision_detection_ratio,
         obj.collision_barrier_ratio, obj.ignore_self_collision_ratio,
         obj.collision_penalty_stiffness, obj.friction_reg,
         obj.friction_fluid, obj.friction) = children
        if len(aux) == 4:  # legacy aux layout
            (obj.max_contacts, obj.bounds, obj.broad_phase,
             obj.cell_capacity) = aux
            obj.sweep_window = 128
        else:
            (obj.max_contacts, obj.bounds, obj.broad_phase,
             obj.cell_capacity, obj.sweep_window) = aux
        return obj

    # -- broad phases --
    def _pair_mask_of(self, ca, cb, cur, cp_x0, cp_obj_ids, radius):
        """Exact narrow test on candidate pairs: within detection radius,
        deduped (a < b), and not self-collision-immune.

        NOTE the immune test compares a SQUARED rest distance against the
        linear ``collision_radius * ignore_self_collision_ratio`` — this is
        deliberately faithful to the reference kernel
        (ref collisions.py:66-72: ``wp.length_sq(...) <
        self_collision_immune_radius`` with ``immune_radius = radius *
        ratio``, :679), whose huge default ratio (1e5) effectively disables
        self-collisions; a tuned ratio inherits the reference's
        dimensional quirk."""
        d2 = jnp.sum((cur[ca] - cur[cb]) ** 2, axis=-1)
        rest_d2 = jnp.sum((cp_x0[ca] - cp_x0[cb]) ** 2, axis=-1)
        immune = (cp_obj_ids[ca] == cp_obj_ids[cb]) & (
            rest_d2 < self.collision_radius * self.ignore_self_collision_ratio)
        return (ca < cb) & (d2 <= radius * radius) & ~immune

    @staticmethod
    def _hash_cells(cells, table_size):
        """Spatial hash of int32 cell coords → bucket in [0, table_size)."""
        h = (cells[..., 0] * jnp.int32(73856093)
             ^ cells[..., 1] * jnp.int32(19349663)
             ^ cells[..., 2] * jnp.int32(83492791))
        return h & jnp.int32(table_size - 1)

    def _grid_candidates(self, cur, radius, cp_x0=None, cp_obj_ids=None):
        """Grid broad phase: candidate pairs (ca, cb) with a coarse validity
        mask. Returns (ca, cb, cand_ok, bucket_load) all of static shape
        (N·27·K,) / (N, 27).

        TPU layout note: each neighbor-cell lookup is a CONTIGUOUS run of
        the cell-key-sorted point array, so candidate data is fetched with
        per-(point, cell) row-slice gathers of a packed (K, 8) block —
        ~N·27 row fetches — instead of N·27·K element gathers (XLA scalar
        gathers are latency-bound at ~10 ns/element; this was 450 ms of a
        510 ms sim step at N=10.7k). When ``cp_x0``/``cp_obj_ids`` are
        given, the narrow-phase inputs ride in the same packed fetch and
        the returned mask INCLUDES the exact narrow test."""
        n = cur.shape[0]
        k = self.cell_capacity
        table_size = 1 << max(int(np.ceil(np.log2(max(2 * n, 64)))), 6)

        cells = jnp.floor(cur / radius).astype(jnp.int32)
        key = self._hash_cells(cells, table_size)
        order = jnp.argsort(key).astype(jnp.int32)
        skey = key[order]

        offs = jnp.asarray(
            [(i, j, l) for i in (-1, 0, 1) for j in (-1, 0, 1)
             for l in (-1, 0, 1)], dtype=jnp.int32)                 # (27, 3)
        nkeys = self._hash_cells(cells[:, None, :] + offs[None], table_size)
        # two neighbor cells hashing to one bucket would return the same run
        # twice — keep only the first lookup per distinct bucket key
        dup = jnp.triu(nkeys[:, :, None] == nkeys[:, None, :], k=1)
        first_use = ~jnp.any(dup, axis=1)                            # (N, 27)

        start = jnp.searchsorted(skey, nkeys.reshape(-1),
                                 side="left").reshape(n, 27).astype(jnp.int32)
        end = jnp.searchsorted(skey, nkeys.reshape(-1),
                               side="right").reshape(n, 27).astype(jnp.int32)
        bucket_load = jnp.where(first_use, end - start, 0)

        in_run = (start[..., None] + jnp.arange(k, dtype=jnp.int32)
                  < jnp.minimum(end, start + k)[..., None])          # (N,27,K)

        # pack per-point data in sorted order: [cur(3) | x0(3) | ids | idx]
        if cp_x0 is None:
            packed = jnp.concatenate(
                [cur[order], order[:, None].astype(cur.dtype)], axis=1)
        else:
            packed = jnp.concatenate(
                [cur[order], cp_x0[order],
                 cp_obj_ids[order][:, None].astype(cur.dtype),
                 order[:, None].astype(cur.dtype)], axis=1)
        d = packed.shape[1]
        packed = jnp.concatenate(
            [packed, jnp.full((k, d), jnp.inf, packed.dtype)], axis=0)
        starts_c = jnp.clip(start.reshape(-1), 0, n)                 # (N*27,)
        blocks = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(packed, s, k, 0)
        )(starts_c).reshape(n, 27, k, d)

        cb = blocks[..., -1]
        cb = jnp.where(jnp.isfinite(cb), cb, -1).astype(jnp.int32)
        ca = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None, None], cb.shape)
        cand_ok = in_run & first_use[..., None] & (cb >= 0)

        if cp_x0 is not None:
            pos_b = blocks[..., 0:3]
            x0_b = blocks[..., 3:6]
            ids_b = blocks[..., 6]
            d2 = jnp.sum((cur[:, None, None, :] - pos_b) ** 2, axis=-1)
            rest_d2 = jnp.sum((cp_x0[:, None, None, :] - x0_b) ** 2, axis=-1)
            immune = (cp_obj_ids[:, None, None] == ids_b) & (
                rest_d2 < self.collision_radius
                * self.ignore_self_collision_ratio)
            mask = (cand_ok & (ca < cb) & (d2 <= radius * radius) & ~immune)
            return (ca.reshape(-1), cb.reshape(-1), mask.reshape(-1),
                    bucket_load)
        return (ca.reshape(-1), cb.reshape(-1), cand_ok.reshape(-1),
                bucket_load)

    def _sweep_candidates(self, cur, cp_x0, cp_obj_ids, radius):
        """Sweep-and-prune broad phase — the TPU-fast path.

        Sort points along the longest axis once; every candidate pair is a
        (i, i+d) pair of the SORTED order with d in [1, sweep_window], built
        by pure array shifts — zero data-dependent gathers (the grid broad
        phase's per-candidate position gathers are latency-bound on TPU at
        ~10 ns/element; measured 450 ms of a 510 ms step at N=10.7k).
        Window overflow (more than sweep_window sorted neighbors within the
        detection radius along the sweep axis) is surfaced via
        ``detection_diagnostics`` and grows the window.

        Returns (ca, cb, mask (N, W), window_load (N,)) with ca/cb ORIGINAL
        point indices of shape (N, W)."""
        n = cur.shape[0]
        w = self.sweep_window
        # longest-extent axis (traced): select key by one-hot projection
        ext = jnp.max(cur, axis=0) - jnp.min(cur, axis=0)
        key = cur @ jax.nn.one_hot(jnp.argmax(ext), 3, dtype=cur.dtype)
        order = jnp.argsort(key).astype(jnp.int32)
        key_s = key[order]
        cur_s = cur[order]
        x0_s = cp_x0[order]
        ids_s = cp_obj_ids[order]

        pad = lambda a, fill: jnp.concatenate(  # noqa: E731
            [a, jnp.full((w,) + a.shape[1:], fill, a.dtype)])
        keyp = pad(key_s, jnp.inf)
        curp = pad(cur_s, jnp.inf)
        x0p = pad(x0_s, jnp.inf)
        idsp = pad(ids_s, -2)
        orderp = pad(order, -1)

        # windows as explicit static shifts (slices — guaranteed not to
        # lower as data-dependent gathers)
        def windows(a):
            return jnp.stack([a[d:d + n] for d in range(1, w + 1)], axis=1)

        pos_b = windows(curp)                                 # (N, W, 3)
        key_b = windows(keyp)                                 # (N, W)
        x0_b = windows(x0p)
        ids_b = windows(idsp)
        idx_b = jnp.arange(n)[:, None] + jnp.arange(1, w + 1)[None, :]
        in_range = (idx_b < n) & (key_b - key_s[:, None] <= radius)

        d2 = jnp.sum((cur_s[:, None] - pos_b) ** 2, axis=-1)
        rest_d2 = jnp.sum((x0_s[:, None] - x0_b) ** 2, axis=-1)
        immune = (ids_s[:, None] == ids_b) & (
            rest_d2 < self.collision_radius * self.ignore_self_collision_ratio)
        mask = in_range & (d2 <= radius * radius) & ~immune

        window_load = jnp.sum(
            (key_b - key_s[:, None] <= radius) & (idx_b < n), axis=-1)
        # +count of in-radius neighbors BEYOND the window (overflow signal)
        beyond = jnp.searchsorted(key_s, key_s + radius, side="right") \
            - jnp.arange(n) - 1
        window_load = jnp.maximum(window_load, beyond)
        ca = jnp.broadcast_to(order[:, None], (n, w))
        cb = windows(orderp)
        return ca, cb, mask, window_load

    def _candidate_pairs(self, cur, cp_x0, cp_obj_ids):
        """Dispatch on ``broad_phase``; returns (ca, cb, pair_mask,
        load or None) with flat (C,) candidate arrays."""
        n = cur.shape[0]
        radius = 2.0 * self.collision_radius * self.collision_detection_ratio
        if self.broad_phase == "sweep":
            ca, cb, mask, load = self._sweep_candidates(cur, cp_x0,
                                                        cp_obj_ids, radius)
            return (ca.reshape(-1), cb.reshape(-1), mask.reshape(-1), load)
        if self.broad_phase == "grid":
            ca, cb, mask, bucket_load = self._grid_candidates(
                cur, radius, cp_x0=cp_x0, cp_obj_ids=cp_obj_ids)
            return ca, cb, mask, bucket_load
        iu = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0).reshape(-1)
        ju = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1).reshape(-1)
        mask = self._pair_mask_of(iu, ju, cur, cp_x0, cp_obj_ids, radius)
        return iu, ju, mask, None

    def detection_diagnostics(self, cp_dx, cp_x0, cp_obj_ids):
        """Capacity-overflow surfacing (jittable). Returns a dict with
        ``num_pairs`` (true pair count), ``contacts_overflow`` (true pairs
        exceed ``max_contacts`` — pairs were silently dropped), and for the
        grid broad phase ``max_bucket_load`` / ``cell_overflow`` (a bucket
        held more than ``cell_capacity`` points — candidates were dropped)."""
        cur = cp_dx + cp_x0
        _, _, mask, load = self._candidate_pairs(cur, cp_x0, cp_obj_ids)
        num_pairs = jnp.sum(mask.astype(jnp.int32))
        out = {"num_pairs": num_pairs,
               "contacts_overflow": num_pairs > self.max_contacts}
        if self.broad_phase == "grid":
            out["max_bucket_load"] = jnp.max(load)
            out["cell_overflow"] = jnp.max(load) > self.cell_capacity
        elif self.broad_phase == "sweep":
            out["max_window_load"] = jnp.max(load)
            out["window_overflow"] = jnp.max(load) > self.sweep_window
        return out

    # -- detection (ref :643) --
    def detect_collisions(self, cp_dx, cp_x0, cp_obj_ids, cp_is_static=None):
        """Find contact pairs. Returns a :class:`Contacts` buffer (jittable).

        cp_dx (N, 3) current displacements; cp_x0 (N, 3) rest positions;
        cp_obj_ids (N,) int; cp_is_static (N,) int {0,1}.
        """
        n = cp_x0.shape[0]
        if cp_is_static is None:
            cp_is_static = jnp.zeros((n,), dtype=jnp.int32)
        cur = cp_dx + cp_x0

        ca, cb, pair_mask, _ = self._candidate_pairs(cur, cp_x0, cp_obj_ids)
        row_w = {"sweep": self.sweep_window,
                 "grid": 27 * self.cell_capacity}.get(self.broad_phase, 0)
        if row_w > 64:
            # row-compact the (N, W) candidate window to ≤64 true contacts
            # per particle before the global nonzero, so wide windows don't
            # inflate the extraction cost (per-particle true contact counts
            # are tiny; >64 would mean interpenetration far past the
            # barrier). Both broad phases emit ca constant per row.
            w = row_w
            k2 = 64
            m2 = pair_mask.reshape(n, w)
            key = jnp.where(m2,
                            jax.lax.broadcasted_iota(jnp.int32, (n, w), 1),
                            jnp.int32(w))
            key_s, cb_s = jax.lax.sort(
                (key, cb.reshape(n, w)), dimension=-1, num_keys=1)
            pair_mask = (key_s[:, :k2] < w).reshape(-1)
            cb = cb_s[:, :k2].reshape(-1)
            ca = jnp.broadcast_to(
                ca.reshape(n, w)[:, :1], (n, k2)).reshape(-1)
        flat_idx = jnp.nonzero(pair_mask, size=self.max_contacts,
                               fill_value=-1)[0]
        valid = flat_idx >= 0
        safe = jnp.where(valid, flat_idx, 0)
        ia = ca[safe]
        ib = cb[safe]
        # canonicalize: a static partner always sits on the b side — the
        # barrier's target distance rc and the offset formula are asymmetric
        # in (a, b) (rc halves for static contacts, ref :107-157), and broad
        # phases emit pairs in arbitrary order
        swap = (cp_is_static[ia] == 1) & (cp_is_static[ib] == 0)
        ia, ib = (jnp.where(swap, ib, ia), jnp.where(swap, ia, ib))

        pos_a = cur[ia]
        pos_b = cur[ib]
        diff = pos_a - pos_b
        nrm = diff / jnp.clip(jnp.linalg.norm(diff, axis=-1, keepdims=True),
                              1e-12, None)
        # pos_delta is zero at detection time (ref :671: pos_delta = zeros)
        gaps = jnp.sum(diff * nrm, axis=-1, keepdims=True) * nrm

        indices_a = jnp.where(valid & (cp_is_static[ia] == 0), ia, NULL)
        indices_b = jnp.where(valid & (cp_is_static[ib] == 0), ib, NULL)
        return Contacts(indices_a=indices_a, indices_b=indices_b, normals=nrm,
                        kinematic_gaps=gaps, valid=valid, dx0=cp_dx)

    # -- jacobian (ref :753) --
    def calculate_jacobian(self, contacts: Contacts, B_dense, qr_tfm=None):
        """Dense contact jacobian J = J_a − J_b of shape (3C, D), where rows
        of J_a are the LBS rows of contact point a (zero for static/invalid).

        Returns (J_post_qr, J_a_raw, J_b_raw) — J rotated into the post-QR
        basis when qr_tfm given; J_a/J_b kept raw for the bounds clamp.
        """
        d = B_dense.shape[1]

        def side(idx):
            ok = idx != NULL
            safe = jnp.where(ok, idx, 0)
            rows = B_dense.reshape(-1, 3, d)[safe]       # (C, 3, D)
            return jnp.where(ok[:, None, None], rows, 0.0)

        ja = side(contacts.indices_a) * contacts.valid[:, None, None]
        jb = side(contacts.indices_b) * contacts.valid[:, None, None]
        j = (ja - jb).reshape(-1, d)
        if qr_tfm is not None:
            j = j @ qr_tfm
        return j, ja.reshape(-1, d), jb.reshape(-1, d)

    # -- per-contact geometry --
    def _offset_rc(self, contacts: Contacts, dx):
        """Relative offset (C,3) and target distance rc (C,1). Ref :107-157."""
        ia = contacts.indices_a
        ib = contacts.indices_b
        sa = jnp.where(ia != NULL, ia, 0)
        sb = jnp.where(ib != NULL, ib, 0)
        delta_a = jnp.where((ia != NULL)[:, None], dx[sa] - contacts.dx0[sa], 0.0)
        delta_b = jnp.where((ib != NULL)[:, None], dx[sb] - contacts.dx0[sb], 0.0)
        offset = delta_a + contacts.kinematic_gaps - delta_b
        rc = jnp.where(ib == NULL, 1.0, 2.0)[:, None] * self.collision_radius
        return offset, rc

    def _barrier_terms(self, contacts, dx):
        offset, rc = self._offset_rc(contacts, dx)
        nor = contacts.normals
        d = jnp.sum(offset * nor, axis=-1, keepdims=True)
        d_hat = d / rc
        rp = self.collision_barrier_ratio
        active = (d_hat > rp) & (d_hat <= 1.0) & contacts.valid[:, None]
        # clamp for safe log even when inactive
        dp = jnp.clip(d_hat - rp, 1e-9, None)
        dc = d_hat - 1.0
        barrier = 2.0 * jnp.log(dp)
        dE_d_hat = -dc * (barrier + dc / dp)
        vt = (offset - d * nor) / self.dt
        vt_norm = jnp.linalg.norm(vt, axis=-1, keepdims=True)
        return offset, rc, nor, d, d_hat, active, dp, dc, barrier, dE_d_hat, vt, vt_norm

    def _h_vt(self, vt_norm):
        nu = self.friction_fluid
        return (0.5 * nu * vt_norm ** 2
                + jnp.where(vt_norm < 1.0,
                            vt_norm ** 2 * (1.0 - vt_norm / 3.0),
                            vt_norm - 1.0 / 3.0))

    # -- energy (ref :159) --
    def energy(self, contacts: Contacts, dx, coeff=1.0):
        (offset, rc, nor, d, d_hat, active, dp, dc, barrier, dE_d_hat,
         vt, vt_norm) = self._barrier_terms(contacts, dx)
        mu = self.friction
        e = -(dc ** 2) * jnp.log(dp)
        mu_fn = -mu * dE_d_hat / rc
        e = e + mu_fn * self.dt * self._h_vt(vt_norm)
        return coeff * jnp.sum(jnp.where(active, e, 0.0))

    # -- gradient wrt per-contact offset (ref :256) → (C, 3) --
    def gradient(self, contacts: Contacts, dx, coeff=1.0):
        (offset, rc, nor, d, d_hat, active, dp, dc, barrier, dE_d_hat,
         vt, vt_norm) = self._barrier_terms(contacts, dx)
        mu = self.friction
        nu = self.friction_fluid
        g = dE_d_hat / rc * nor
        mu_fn = -mu * dE_d_hat / rc
        f1_over = jnp.where(vt_norm < 1.0, 2.0 - vt_norm,
                            1.0 / jnp.clip(vt_norm, 1e-12, None))
        g = g + mu_fn * (f1_over + nu) * vt
        h_vt = self._h_vt(vt_norm)
        dbarrier = 2.0 / dp
        ddcdp = (dp - dc) / (dp * dp)
        d2E = -(barrier + dc / dp) - dc * (dbarrier + ddcdp)
        g = g + (-mu * self.dt * h_vt * d2E / (rc * rc)) * nor
        return coeff * jnp.where(active, g, 0.0)

    # -- hessian diag blocks (ref :366) → (C, 3, 3) --
    def hessian(self, contacts: Contacts, dx, coeff=1.0):
        (offset, rc, nor, d, d_hat, active, dp, dc, barrier, dE_d_hat,
         vt, vt_norm) = self._barrier_terms(contacts, dx)
        mu = self.friction
        nu = self.friction_fluid
        dt = self.dt
        rc2 = (rc * rc)[..., None]

        dbarrier = 2.0 / dp
        ddcdp = (dp - dc) / (dp * dp)
        d2E = -(barrier + dc / dp) - dc * (dbarrier + ddcdp)
        nn = nor[:, :, None] * nor[:, None, :]
        h = d2E[..., None] / rc2 * nn

        mu_fn = -mu * dE_d_hat / rc
        mu_fn_p = -mu * d2E / rc
        f1_over = jnp.where(vt_norm < 1.0, 2.0 - vt_norm,
                            1.0 / jnp.clip(vt_norm, 1e-12, None))
        f1_nu = f1_over + nu
        eye = jnp.eye(3, dtype=dx.dtype)
        tangent_proj = eye - nn
        eps = 1e-4
        vv = vt[:, :, None] * vt[:, None, :]

        near_zero = vt_norm < eps
        stick = (vt_norm >= eps) & (vt_norm < 1.0)
        vt_safe = jnp.clip(vt_norm, eps, None)
        h_nz = mu_fn[..., None] / dt * f1_nu[..., None] * tangent_proj
        h_stick = mu_fn[..., None] / dt * (
            f1_nu[..., None] * tangent_proj - vv / (vt_safe[..., None] * dt))
        f1_p = -1.0 / (vt_safe ** 2)
        h_slip = mu_fn[..., None] * (
            f1_p[..., None] / (vt_safe[..., None] * dt) * vv
            + f1_nu[..., None] / dt * tangent_proj)
        h = h + jnp.where(near_zero[..., None], h_nz,
                          jnp.where(stick[..., None], h_stick, h_slip))
        h = h + mu_fn_p[..., None] * f1_nu[..., None] / rc[..., None] \
            * (vt[:, :, None] * nor[:, None, :])

        h_vt = self._h_vt(vt_norm)
        h_vt_p = jnp.where(vt_norm < 1.0,
                           nu * vt_norm + 2.0 * vt_norm - vt_norm ** 2,
                           nu * vt_norm + 1.0)
        d2barrier = -2.0 / (dp * dp)
        dddcdp = -2.0 * ddcdp / dp
        df = dbarrier - dc / (dp * dp)
        dg = d2barrier + dddcdp
        d3E = -df - dg * dc - (dbarrier + ddcdp)
        dvtn = jnp.where(vt_norm > eps, vt / (vt_safe * dt), 0.0)
        chain = -mu * dt / rc2
        h = h + chain * (
            d2E[..., None] * h_vt_p[..., None] * (nor[:, :, None] * dvtn[:, None, :])
            + (h_vt * d3E / rc)[..., None] * nn)
        return coeff * jnp.where(active[..., None], h, 0.0)

    # -- line-search bounds (ref :509, :821) → (D,) per-DOF step clamp --
    def get_bounds(self, contacts: Contacts, delta_dx, dx, ja_raw, jb_raw):
        """delta_dx (N, 3) = (B dz); dx (N, 3) = (B z); ja/jb (3C, D) raw-basis
        contact jacobians used only for their sparsity pattern."""
        d = ja_raw.shape[1]
        c = contacts.normals.shape[0]
        nor = contacts.normals
        ia, ib = contacts.indices_a, contacts.indices_b
        sa = jnp.where(ia != NULL, ia, 0)
        sb = jnp.where(ib != NULL, ib, 0)

        delta_d_a = jnp.sum(nor * delta_dx[sa], axis=-1)
        delta_d_a = jnp.where(ia != NULL, delta_d_a, 0.0)
        delta_d_b = -jnp.sum(nor * delta_dx[sb], axis=-1)
        delta_d_b = jnp.where(ib != NULL, delta_d_b, 0.0)

        offset, rc = self._offset_rc(contacts, dx)
        rp = self.collision_barrier_ratio * rc[:, 0]
        gap_cur = rp - jnp.sum(offset * nor, axis=-1)
        ok = (gap_cur < 0.0) & contacts.valid
        max_delta_d = 0.5 * 0.75 * gap_cur

        def tmax(delta_d):
            closing = (delta_d < 0.0) & ok
            t = jnp.clip(max_delta_d / jnp.where(closing, delta_d, -1.0), 0.0, 1.0)
            return jnp.where(closing, t, 1.0)

        t_a = tmax(delta_d_a)  # (C,)
        t_b = tmax(delta_d_b)
        # per-contact touched DOFs from the raw jacobian sparsity
        mask_a = jnp.any(ja_raw.reshape(c, 3, d) != 0.0, axis=1)
        mask_b = jnp.any(jb_raw.reshape(c, 3, d) != 0.0, axis=1)
        bounds = jnp.min(jnp.where(mask_a, t_a[:, None], 1.0), axis=0)
        bounds = jnp.minimum(bounds,
                             jnp.min(jnp.where(mask_b, t_b[:, None], 1.0), axis=0))
        return bounds
