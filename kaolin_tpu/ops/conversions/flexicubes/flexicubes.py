"""FlexiCubes — differentiable isosurface extraction with learnable weights.

TPU-native analog of reference
``kaolin/ops/conversions/flexicubes/flexicubes.py:24-700`` ("Flexible
Isosurface Extraction for Gradient-Based Mesh Optimization", Shen et al.,
SIGGRAPH 2023). Dual-marching-cubes topology with per-cube learnable edge
weights (beta), corner weights (alpha), and quad-splitting weights (gamma),
plus the L_dev regularizer (Eq. 8) and the QEF path when a surface-gradient
function is given.

Two-phase TPU design: topology extraction (sign-pattern dependent — surface
cubes/edges, DMC case ids, dual-vertex groups, quad assembly) runs host-side
on concrete scalar fields via :meth:`precompute_topology`; the geometry math
(zero crossings, weighted dual-vertex placement, L_dev, differentiable quad
splitting) is pure jnp over those static index arrays, so
``jax.grad``/``jax.jit`` flow through scalar_field / vertices / beta / alpha
/ gamma once a topology is fixed — exactly the quantities the reference
differentiates (its topology steps are @torch.no_grad).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from kaolin_tpu.ops.conversions.flexicubes._tables import (
    CHECK_TABLE,
    DMC_TABLE,
    NUM_VD_TABLE,
    TET_TABLE,
)

__all__ = ["FlexiCubes"]

_CUBE_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                          [0, 0, 1], [1, 0, 1], [0, 1, 1], [1, 1, 1]],
                         dtype=np.float64)
_CUBE_EDGES = np.array([0, 1, 1, 5, 4, 5, 0, 4, 2, 3, 3, 7, 6, 7, 2, 6,
                        2, 0, 3, 1, 7, 5, 6, 4], dtype=np.int64)
_QUAD_SPLIT_1 = np.array([0, 1, 2, 0, 2, 3])
_QUAD_SPLIT_2 = np.array([0, 1, 3, 3, 1, 2])
_QUAD_SPLIT_TRAIN = np.array([0, 1, 1, 2, 2, 3, 3, 0])

# tetrahedralization constants (ref flexicubes.py:107-114): the axis of each
# cube edge, the face shared by consecutive cube pairs around an edge of a
# given axis, and the ring ordering of the 4 cubes around an edge
_EDGE_DIR_TABLE = np.array([0, 2, 0, 2, 0, 2, 0, 2, 1, 1, 1, 1],
                           dtype=np.int64)
_DIR_FACES_TABLE = np.array([
    [[5, 4], [3, 2], [4, 5], [2, 3]],
    [[5, 4], [1, 0], [4, 5], [0, 1]],
    [[3, 2], [1, 0], [2, 3], [0, 1]],
], dtype=np.int64)
_ADJ_PAIRS = np.array([0, 1, 1, 3, 3, 2, 2, 0], dtype=np.int64)


class _Topology(NamedTuple):
    """Static index arrays extracted from the sign pattern (all numpy)."""
    surf_cubes: np.ndarray          # (C,) bool
    case_ids: np.ndarray            # (Cs,)
    surf_edges: np.ndarray          # (E, 2) vertex ids
    idx_map: np.ndarray             # (Cs, 12) cube-edge → surf-edge id or -1
    edge_group: np.ndarray          # (G,) cube-edge slot of each group entry
    edge_group_to_vd: np.ndarray    # (G,)
    edge_group_to_cube: np.ndarray  # (G,) surf-cube row
    vd_num_edges: np.ndarray        # (V, 1)
    vd_gamma_cube: np.ndarray       # (V,) surf-cube row providing gamma
    total_num_vd: int
    quad_vd_idx: np.ndarray         # (Q, 4) dual-vertex ids per quad
    quad_cube: np.ndarray           # (Q,) surf-cube row of gamma source... unused
    quad_s_edge: np.ndarray         # (Q,) surf-edge id the quad wraps around
    flip_mask: np.ndarray           # (Q,) bool


class _TetTopology(NamedTuple):
    """Static index structure for interior tetrahedralization (all numpy,
    final vertex-index space: [dual verts (+quad centers when training),
    inside grid verts, inside cube centers])."""
    inside_grid_idx: np.ndarray   # (Ni,) grid-vertex ids of inside verts
    inside_cube_rows: np.ndarray  # (Nc, 8) corner grid ids of inside cubes
    apex_idx: np.ndarray          # (Qf,) apex vertex index per surface face
    tets_inside: np.ndarray       # (Ti, 4) interior tets, final indices


class FlexiCubes:
    """Mesh extraction from scalar fields with learnable weights. Ref :24."""

    def __init__(self, device=None):
        # device kept for API parity; placement is JAX-managed
        self.device = device

    def construct_voxel_grid(self, resolution):
        """Regular grid: vertices in [-0.5, 0.5], cube corner indices.
        Returns ((R+1)³, 3) verts and (R³, 8) cube_idx. Ref :116."""
        if isinstance(resolution, int):
            resolution = (resolution, resolution, resolution)
        rx, ry, rz = resolution
        gx, gy, gz = np.meshgrid(np.arange(rx + 1), np.arange(ry + 1),
                                 np.arange(rz + 1), indexing="ij")
        verts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float64)
        verts = verts / np.array([rx, ry, rz], dtype=np.float64)

        cx, cy, cz = np.meshgrid(np.arange(rx), np.arange(ry), np.arange(rz),
                                 indexing="ij")
        cells = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)
        corners = cells[:, None, :] + _CUBE_CORNERS[None].astype(np.int64)
        cube_idx = ((corners[..., 0] * (ry + 1) + corners[..., 1]) * (rz + 1)
                    + corners[..., 2])
        return (jnp.asarray((verts - 0.5).astype(np.float32)),
                jnp.asarray(cube_idx.astype(np.int64)))

    # ---------------- topology (host, sign-dependent) ----------------
    def precompute_topology(self, scalar_field, cube_idx, resolution):
        """Extract all sign-dependent index structure (numpy). The result can
        be reused for traced/jitted geometry while signs don't change."""
        s = np.asarray(scalar_field)
        cube_idx_np = np.asarray(cube_idx)
        occ_n = s < 0
        occ_fx8 = occ_n[cube_idx_np]
        occ_sum = occ_fx8.sum(-1)
        surf_cubes = (occ_sum > 0) & (occ_sum < 8)
        if surf_cubes.sum() == 0:
            return None

        case_ids = (occ_fx8[surf_cubes] * (2 ** np.arange(8))).sum(-1)
        case_ids = self._resolve_ambiguities(case_ids, surf_cubes, resolution)

        # surface edges
        all_edges = cube_idx_np[surf_cubes][:, _CUBE_EDGES].reshape(-1, 2)
        unique_edges, _idx_map, counts = np.unique(
            all_edges, axis=0, return_inverse=True, return_counts=True)
        mask_edges = occ_n[unique_edges].sum(-1) == 1
        surf_edges_mask = mask_edges[_idx_map]
        counts = counts[_idx_map]
        mapping = np.full((unique_edges.shape[0],), -1, dtype=np.int64)
        mapping[mask_edges] = np.arange(mask_edges.sum())
        idx_map = mapping[_idx_map].reshape(-1, 12)
        surf_edges = unique_edges[mask_edges]

        # dual-vertex groups (ref _compute_vd :455), batched per num_vd
        num_vd = NUM_VD_TABLE[case_ids]
        edge_group, e2vd, e2cube, vd_num_edges, vd_gamma_cube = [], [], [], [], []
        total_num_vd = 0
        cube_rows = np.arange(idx_map.shape[0])
        for num in np.unique(num_vd):
            cur = num_vd == num
            cur_rows = cube_rows[cur]
            grp = DMC_TABLE[case_ids[cur], :num].reshape(-1, num * 7)
            n_vd = cur.sum() * num
            g2vd = (np.arange(n_vd)[:, None].repeat(7, 1)
                    + total_num_vd).reshape(grp.shape)
            total_num_vd += n_vd
            g2cube = cur_rows[:, None].repeat(num * 7, 1).reshape(grp.shape)
            m = grp != -1
            edge_group.append(grp[m])
            e2vd.append(g2vd[m])
            e2cube.append(g2cube[m])
            vd_num_edges.append(m.reshape(-1, 7).sum(-1, keepdims=True))
            vd_gamma_cube.append(np.repeat(cur_rows, num))
        edge_group = np.concatenate(edge_group)
        e2vd = np.concatenate(e2vd)
        e2cube = np.concatenate(e2cube)
        vd_num_edges = np.concatenate(vd_num_edges)
        vd_gamma_cube = np.concatenate(vd_gamma_cube)

        # map each (cube, edge-slot) to its dual vertex id
        vd_idx_map = np.zeros((idx_map.shape[0] * 12,), dtype=np.int64)
        vd_idx_map[e2cube * 12 + edge_group] = e2vd

        # quads: surface edges shared by exactly 4 surf cubes (ref :562-573)
        group_mask = (counts == 4) & surf_edges_mask
        group = idx_map.reshape(-1)[group_mask]
        vd_idx = vd_idx_map[group_mask]
        order = np.argsort(group, kind="stable")
        edge_indices = group[order].reshape(-1, 4)[:, 0]
        quad_vd_idx = vd_idx[order].reshape(-1, 4)
        s_first = s[surf_edges[edge_indices, 0]]
        flip_mask = s_first > 0
        quad_vd_idx = np.concatenate([
            quad_vd_idx[flip_mask][:, [0, 1, 3, 2]],
            quad_vd_idx[~flip_mask][:, [2, 3, 1, 0]]])
        quad_s_edge = np.concatenate([edge_indices[flip_mask],
                                      edge_indices[~flip_mask]])

        return _Topology(
            surf_cubes=surf_cubes, case_ids=case_ids, surf_edges=surf_edges,
            idx_map=idx_map, edge_group=edge_group, edge_group_to_vd=e2vd,
            edge_group_to_cube=e2cube, vd_num_edges=vd_num_edges,
            vd_gamma_cube=vd_gamma_cube, total_num_vd=int(total_num_vd),
            quad_vd_idx=quad_vd_idx, quad_cube=None, quad_s_edge=quad_s_edge,
            flip_mask=flip_mask)

    def precompute_tet_topology(self, scalar_field, cube_idx, topology,
                                training=False):
        """Sign-dependent index structure for ``output_tetmesh`` (numpy).
        Ref _tetrahedralize :619-700 (Section 4.5 of the paper).

        Two tet families: (a) per surface quad, a pyramid from the quad to
        the inside endpoint of the grid edge it wraps, split along the quad's
        triangulation; (b) per interior grid edge (both endpoints inside)
        shared by 4 cells, tets formed from the edge and dual/center vertices
        of consecutive adjacent cells via TET_TABLE.

        Divergence from the reference (deliberate bug fix): the reference
        builds faces from the flip-reordered quad list but gathers pyramid
        apexes in pre-reorder (sorted) quad order, pairing most faces with
        the wrong grid edge (apexes land up to several cells away from their
        face). Here the apex list is taken from the SAME reordered per-quad
        edge ids (``quad_s_edge``) the faces are built from, so every pyramid
        is anchored to its own edge.
        """
        t = topology
        s = np.asarray(scalar_field)
        cube_idx_np = np.asarray(cube_idx)
        occ_n = s < 0
        v_base = t.total_num_vd + (t.quad_vd_idx.shape[0] if training else 0)

        inside_grid_idx = np.nonzero(occ_n)[0]
        mapping_inside = np.full((s.shape[0],), -1, dtype=np.int64)
        mapping_inside[occ_n] = np.arange(inside_grid_idx.shape[0]) + v_base

        # (a) surface pyramids: apex = inside endpoint of each quad's edge,
        # in the SAME (post-flip-reorder) order the faces were emitted in
        quad_edge_verts = t.surf_edges[t.quad_s_edge]             # (Q, 2)
        s_q = s[quad_edge_verts]
        apex_grid = np.where(s_q[:, 0] < 0, quad_edge_verts[:, 0],
                             quad_edge_verts[:, 1])
        apex = mapping_inside[apex_grid]
        apex_idx = np.repeat(apex, 4 if training else 2)

        # (b) interior-edge tets
        occ_fx8 = occ_n[cube_idx_np]
        occ_sum = occ_fx8.sum(-1)
        inside_cubes = occ_sum == 8
        both = t.surf_cubes | inside_cubes
        n_both = int(both.sum())
        inside_cube_rows = cube_idx_np[inside_cubes]
        n_inside_c = inside_cube_rows.shape[0]
        center_idx = (np.arange(n_inside_c) + v_base
                      + inside_grid_idx.shape[0])

        sc_l = t.surf_cubes[both]
        ic_l = inside_cubes[both]
        vd_idx_map = np.zeros((t.idx_map.shape[0] * 12,), dtype=np.int64)
        vd_idx_map[t.edge_group_to_cube * 12 + t.edge_group] = \
            t.edge_group_to_vd
        ecv = np.full((n_both, 13), -1, dtype=np.int64)
        ecv[sc_l, :12] = vd_idx_map.reshape(-1, 12)
        ecv[ic_l, 12] = center_idx

        all_edges = cube_idx_np[both][:, _CUBE_EDGES].reshape(-1, 2)
        unique_edges, inv, counts = np.unique(
            all_edges, axis=0, return_inverse=True, return_counts=True)
        interior_edges = occ_n[unique_edges].sum(-1) == 2
        mask = interior_edges[inv]
        counts = counts[inv]
        mapping = np.full((unique_edges.shape[0],), -1, dtype=np.int64)
        mapping[interior_edges] = np.arange(interior_edges.sum())
        idx_map2 = mapping[inv]

        group_mask = (counts == 4) & mask
        group = idx_map2[group_mask]
        # stable sort keeps the 4 cubes of an edge in ascending row order —
        # the canonical ring order _ADJ_PAIRS/_DIR_FACES_TABLE assume
        order = np.argsort(group, kind="stable")
        edge_ids_sorted = group[order]
        edge2cube = np.repeat(np.arange(n_both), 12)[group_mask][order]
        edge_slot = np.tile(np.arange(12), n_both)[group_mask][order]

        cube_idx_4 = edge2cube.reshape(-1, 4)
        edge_dir = _EDGE_DIR_TABLE[edge_slot].reshape(-1, 4)[:, 0]
        shared_faces = _DIR_FACES_TABLE[edge_dir].reshape(-1)
        cube_ring = cube_idx_4[:, _ADJ_PAIRS].reshape(-1)

        case_exp = np.full((n_both,), 255, dtype=np.int64)
        case_exp[sc_l] = t.case_ids
        slot_sel = TET_TABLE[case_exp[cube_ring], shared_faces]
        # slot −1 wraps to column 12 (−1 for surf cubes, center for inside)
        quad_edge = ecv[cube_ring, slot_sel].reshape(-1, 2)
        complete = (quad_edge != -1).all(-1)
        inside_edge = mapping_inside[
            unique_edges[interior_edges][edge_ids_sorted]].reshape(-1, 2)
        tets_inside = np.concatenate([quad_edge, inside_edge], -1)[complete]

        return _TetTopology(inside_grid_idx=inside_grid_idx,
                            inside_cube_rows=inside_cube_rows,
                            apex_idx=apex_idx, tets_inside=tets_inside)

    def _resolve_ambiguities(self, case_ids, surf_cubes, res):
        """C16/C19 ambiguous-face inversion (ref _get_case_id :349)."""
        if not isinstance(res, (list, tuple)):
            res = [res, res, res]
        problem_config = CHECK_TABLE[case_ids]
        to_check = problem_config[:, 0] == 1
        problem_config = problem_config[to_check]
        full = np.zeros(list(res) + [5], dtype=np.int64)
        vol_idx = np.stack(np.nonzero(np.ones(res)), axis=-1)
        vol_idx_problem = vol_idx[surf_cubes][to_check]
        full[tuple(vol_idx_problem.T)] = problem_config
        adj = vol_idx_problem + problem_config[:, 1:4]
        within = np.all((adj >= 0) & (adj < np.array(res)), axis=-1)
        vol_idx_problem = vol_idx_problem[within]
        adj = adj[within]
        problem_config = problem_config[within]
        problem_adj = full[tuple(adj.T)]
        to_invert = problem_adj[:, 0] == 1
        idx = np.arange(case_ids.shape[0])[to_check][within][to_invert]
        case_ids = case_ids.copy()
        case_ids[idx] = problem_config[to_invert][:, -1]
        return case_ids

    # ---------------- geometry (traced) ----------------
    @staticmethod
    def _linear_interp(edges_weight, edges_x):
        """Zero-crossing by linear interpolation; ref :428. edges_weight
        (..., 2, 1), edges_x (..., 2, D)."""
        w = jnp.concatenate([edges_weight[..., 1:2, :],
                             -edges_weight[..., 0:1, :]], axis=-2)
        denom = jnp.sum(w, axis=-2)
        return jnp.sum(edges_x * w, axis=-2) / denom

    def __call__(self, voxelgrid_vertices, scalar_field, cube_idx, resolution,
                 qef_reg_scale=1e-3, weight_scale=0.99, beta=None, alpha=None,
                 gamma_f=None, training=False, output_tetmesh=False,
                 grad_func=None, voxelgrid_features=None, topology=None,
                 tet_topology=None):
        """Extract a mesh; ref :154. Pass ``topology`` (from
        :meth:`precompute_topology`) — and ``tet_topology`` (from
        :meth:`precompute_tet_topology`) when ``output_tetmesh`` — to stay
        fully traceable/jittable."""
        if topology is None:
            topology = self.precompute_topology(scalar_field, cube_idx,
                                                resolution)
        if topology is None:  # empty surface
            empty_f = jnp.zeros((0, 3), dtype=jnp.float32)
            out = (empty_f, jnp.zeros((0, 4 if output_tetmesh else 3),
                                      dtype=jnp.int64),
                   jnp.zeros((0,), dtype=jnp.float32))
            if voxelgrid_features is not None and not output_tetmesh:
                out = out + (jnp.zeros((0, voxelgrid_features.shape[-1])),)
            return out
        if output_tetmesh and tet_topology is None:
            tet_topology = self.precompute_tet_topology(
                scalar_field, cube_idx, topology, training=training)

        t = topology
        cube_idx_np = np.asarray(cube_idx)
        surf_rows = cube_idx_np[t.surf_cubes]  # (Cs, 8)
        n_cubes = cube_idx_np.shape[0]

        # weight normalization (ref :325)
        if beta is not None:
            beta = jnp.tanh(beta) * weight_scale + 1
        else:
            beta = jnp.ones((n_cubes, 12), dtype=jnp.float32)
        if alpha is not None:
            alpha = jnp.tanh(alpha) * weight_scale + 1
        else:
            alpha = jnp.ones((n_cubes, 8), dtype=jnp.float32)
        if gamma_f is not None:
            gamma_f = jax.nn.sigmoid(gamma_f) * weight_scale \
                + (1 - weight_scale) / 2
        else:
            gamma_f = jnp.ones((n_cubes,), dtype=jnp.float32)
        sc = jnp.asarray(np.nonzero(t.surf_cubes)[0])
        beta = beta[sc]
        alpha = alpha[sc]
        gamma_f = gamma_f[sc]

        surf_edges = jnp.asarray(t.surf_edges)
        surf_edges_x = voxelgrid_vertices[surf_edges.reshape(-1)].reshape(-1, 2, 3)
        surf_edges_s = scalar_field[surf_edges.reshape(-1)].reshape(-1, 2, 1)
        zero_crossing = self._linear_interp(surf_edges_s, surf_edges_x)

        if voxelgrid_features is not None:
            nf = voxelgrid_features.shape[-1]
            surf_edges_f = voxelgrid_features[surf_edges.reshape(-1)].reshape(-1, 2, nf)

        alpha_nx12x2 = alpha[:, _CUBE_EDGES].reshape(-1, 12, 2)

        e2cube = jnp.asarray(t.edge_group_to_cube)
        e_grp = jnp.asarray(t.edge_group)
        e2vd = jnp.asarray(t.edge_group_to_vd)
        idx_group = jnp.asarray(
            t.idx_map.reshape(-1))[t.edge_group_to_cube * 12 + t.edge_group]

        x_group = surf_edges_x[idx_group]                # (G, 2, 3)
        s_group = surf_edges_s[idx_group]                # (G, 2, 1)
        zc_group = zero_crossing[idx_group]              # (G, 3)
        alpha_group = alpha_nx12x2.reshape(-1, 2)[
            e2cube * 12 + e_grp].reshape(-1, 2, 1)
        ue_group = self._linear_interp(s_group * alpha_group, x_group)
        beta_group = beta.reshape(-1)[e2cube * 12 + e_grp][:, None]

        total_vd = t.total_num_vd
        vd_features = None
        if grad_func is not None:
            # QEF path (ref :441, :500-530): non-differentiable by design
            normals = grad_func(zero_crossing)
            normals = normals / jnp.clip(
                jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12, None)
            vd = self._solve_qef(t, voxelgrid_vertices, surf_rows,
                                 zero_crossing, normals, qef_reg_scale)
            l_dev = jnp.zeros((1,))
        else:
            beta_sum = jax.ops.segment_sum(beta_group, e2vd,
                                           num_segments=total_vd)
            vd = jax.ops.segment_sum(ue_group * beta_group, e2vd,
                                     num_segments=total_vd) / beta_sum
            # L_dev regularizer (ref :315)
            dist = jnp.linalg.norm(zc_group - vd[e2vd], axis=-1)
            mean_l2 = jax.ops.segment_sum(dist, e2vd, num_segments=total_vd) \
                / jnp.asarray(t.vd_num_edges[:, 0], dtype=dist.dtype)
            l_dev = jnp.abs(dist - mean_l2[e2vd])
            if voxelgrid_features is not None:
                f_group = surf_edges_f[idx_group]
                uf_group = self._linear_interp(s_group * alpha_group, f_group)
                vd_features = jax.ops.segment_sum(
                    uf_group * beta_group, e2vd, num_segments=total_vd) / beta_sum

        # triangulation (ref :557)
        quad_vd_idx = jnp.asarray(t.quad_vd_idx)
        vd_gamma = gamma_f[jnp.asarray(t.vd_gamma_cube)]
        if grad_func is not None:
            normals_vd = grad_func(vd)
            normals_vd = normals_vd / jnp.clip(
                jnp.linalg.norm(normals_vd, axis=-1, keepdims=True), 1e-12, None)
            qg = normals_vd[quad_vd_idx.reshape(-1)].reshape(-1, 4, 3)
            gamma_02 = jnp.sum(qg[:, 0] * qg[:, 2], axis=-1)
            gamma_13 = jnp.sum(qg[:, 1] * qg[:, 3], axis=-1)
        else:
            quad_gamma = vd_gamma[quad_vd_idx.reshape(-1)].reshape(-1, 4)
            gamma_02 = quad_gamma[:, 0] * quad_gamma[:, 2]
            gamma_13 = quad_gamma[:, 1] * quad_gamma[:, 3]

        if not training:
            mask = gamma_02 > gamma_13
            f1 = quad_vd_idx[:, _QUAD_SPLIT_1]
            f2 = quad_vd_idx[:, _QUAD_SPLIT_2]
            faces = jnp.where(mask[:, None], f1, f2).reshape(-1, 3)
            vertices = vd
        else:
            vd_quad = vd[quad_vd_idx.reshape(-1)].reshape(-1, 4, 3)
            vd_02 = (vd_quad[:, 0] + vd_quad[:, 2]) / 2
            vd_13 = (vd_quad[:, 1] + vd_quad[:, 3]) / 2
            weight_sum = gamma_02 + gamma_13 + 1e-8
            vd_center = (vd_02 * gamma_02[:, None]
                         + vd_13 * gamma_13[:, None]) / weight_sum[:, None]
            if vd_features is not None:
                fq = vd_features[quad_vd_idx.reshape(-1)].reshape(
                    -1, 4, vd_features.shape[-1])
                f02 = (fq[:, 0] + fq[:, 2]) / 2
                f13 = (fq[:, 1] + fq[:, 3]) / 2
                f_center = (f02 * gamma_02[:, None]
                            + f13 * gamma_13[:, None]) / weight_sum[:, None]
                vd_features = jnp.concatenate([vd_features, f_center])
            center_idx = jnp.arange(vd_center.shape[0]) + vd.shape[0]
            vertices = jnp.concatenate([vd, vd_center])
            faces = quad_vd_idx[:, _QUAD_SPLIT_TRAIN].reshape(-1, 4, 2)
            faces = jnp.concatenate(
                [faces, jnp.broadcast_to(center_idx[:, None, None],
                                         (faces.shape[0], 4, 1))], axis=-1)
            faces = faces.reshape(-1, 3)

        if output_tetmesh:
            tt = tet_topology
            inside_verts = voxelgrid_vertices[jnp.asarray(tt.inside_grid_idx)]
            if tt.inside_cube_rows.shape[0] > 0:
                centers = jnp.mean(voxelgrid_vertices[
                    jnp.asarray(tt.inside_cube_rows)], axis=1)
            else:
                centers = jnp.zeros((0, 3), dtype=vertices.dtype)
            all_vertices = jnp.concatenate([vertices, inside_verts, centers])
            tets_surface = jnp.concatenate(
                [faces, jnp.asarray(tt.apex_idx)[:, None]], axis=-1)
            tets = jnp.concatenate(
                [tets_surface, jnp.asarray(tt.tets_inside)])
            return all_vertices, tets, l_dev

        if voxelgrid_features is not None:
            return vertices, faces, l_dev, vd_features
        return vertices, faces, l_dev

    # ---------------- fully on-device static-capacity path ----------------
    @staticmethod
    def static_capacities(resolution, cube_factor=8, edge_factor=4,
                          quad_factor=3):
        """Default capacity bounds for :meth:`jit_extract`: a closed surface
        in an R³ grid crosses O(R²) cubes, so caps scale with R² (validated
        by the ``counts`` output; grow on overflow)."""
        if isinstance(resolution, (list, tuple)):
            resolution = max(resolution)
        r2 = resolution * resolution
        return {"cubes": int(cube_factor * r2),
                "quads": int(quad_factor * r2)}

    @staticmethod
    def suggest_capacities(scalar_field, cube_idx, margin=1.5):
        """Capacity suggestion for :meth:`jit_extract` measured from a
        CONCRETE sign field (host-side, one pass): true surface-cube and
        quad counts x ``margin``, rounded up to powers of two so nearby
        topologies reuse the same compilation. Re-check ``aux['counts']``
        against these when the surface moves a lot."""
        s = np.asarray(scalar_field)
        occ = (s < 0)[np.asarray(cube_idx)]
        osum = occ.sum(-1)
        n_surf = int(((osum > 0) & (osum < 8)).sum())
        # quads ≈ surface edges with one inside endpoint shared by 4 cubes;
        # bounded by 3 per surf cube in practice — measure is cheap enough
        pow2 = lambda v: 1 << int(np.ceil(np.log2(max(int(v), 64))))  # noqa: E731
        return {"cubes": pow2(n_surf * margin),
                "quads": pow2(n_surf * margin * 2)}

    def _resolve_ambiguities_device(self, case_full, surf, resolution):
        """On-device C16/C19 ambiguity inversion over the FULL cube grid
        (jnp analog of :meth:`_resolve_ambiguities`)."""
        if not isinstance(resolution, (list, tuple)):
            resolution = (resolution, resolution, resolution)
        rx, ry, rz = resolution
        c = case_full.shape[0]
        cfg = jnp.asarray(CHECK_TABLE)[case_full]            # (C, 5)
        to_check = (cfg[:, 0] == 1) & surf
        cfg = jnp.where(to_check[:, None], cfg, 0)
        # cube linear index → (x, y, z), x-major like construct_voxel_grid
        lin = jnp.arange(c)
        cz = lin % rz
        cy = (lin // rz) % ry
        cx = lin // (rz * ry)
        adj = jnp.stack([cx, cy, cz], -1) + cfg[:, 1:4]
        within = jnp.all((adj >= 0) & (adj < jnp.asarray([rx, ry, rz])), -1)
        adj_lin = jnp.clip((adj[:, 0] * ry + adj[:, 1]) * rz + adj[:, 2],
                           0, c - 1)
        neighbor_flagged = cfg[:, 0][adj_lin] == 1
        invert = to_check & within & neighbor_flagged
        return jnp.where(invert, cfg[:, 4], case_full)

    def jit_extract(self, voxelgrid_vertices, scalar_field, cube_idx,
                    resolution, capacities=None, weight_scale=0.99,
                    beta=None, alpha=None, gamma_f=None, training=False):
        """Capacity-bounded FlexiCubes extraction that runs ENTIRELY on
        device — topology (sign-dependent index structure) AND geometry in
        one traceable computation, so an SDF-optimization iteration is a
        single jit with no host topology refresh (the TPU-native form of the
        reference loop; the reference re-runs its @torch.no_grad topology
        kernels on the GPU every call, ref :154).

        Differences from :meth:`__call__`'s host-topology path:

        * dual vertices live in a uniform ``4`` slots per surface cube
          (``NUM_VD_TABLE`` max) instead of the compacted host layout, so
          outputs have static shapes;
        * returns ``(vertices, faces, l_dev, aux)`` with fixed shapes:
          vertices ``(4*cap_cubes (+cap_quads if training), 3)``, faces
          ``((2 or 4)*cap_quads, 3)``; ``aux['face_mask']`` marks real
          faces, ``aux['vertex_mask']`` marks referenced dual vertices,
          and ``aux['counts']`` carries the true (surf_cubes, quads)
          occupancies next to their capacities — check
          ``counts <= capacity`` to validate sizing (overflow truncates).

        Gradients flow through scalar_field / vertices / beta / alpha /
        gamma_f exactly as in the host path (parity-tested).
        """
        caps = dict(self.static_capacities(resolution))
        if capacities:
            caps.update(capacities)
        cap_c, cap_q = int(caps["cubes"]), int(caps["quads"])
        num_cubes = cube_idx.shape[0]
        cube_idx = jnp.asarray(cube_idx)
        sdf = scalar_field
        dtype = voxelgrid_vertices.dtype

        occ = sdf < 0
        occ8 = occ[cube_idx]                                   # (C, 8)
        osum = jnp.sum(occ8, axis=-1)
        surf = (osum > 0) & (osum < 8)
        case_full = jnp.sum(
            occ8 * jnp.asarray(2 ** np.arange(8)), axis=-1)
        case_full = self._resolve_ambiguities_device(case_full, surf,
                                                     resolution)
        n_surf = jnp.sum(surf.astype(jnp.int32))

        sel = jnp.nonzero(surf, size=cap_c, fill_value=num_cubes)[0]
        cube_ok = sel < num_cubes
        sel_safe = jnp.where(cube_ok, sel, 0).astype(jnp.int32)
        rows = cube_idx[sel_safe]                              # (cap_c, 8)
        case_ids = jnp.where(cube_ok, case_full[sel_safe], 0)

        # normalized weights, gathered at surface cubes (ref :325)
        if beta is not None:
            beta_s = jnp.tanh(beta[sel_safe]) * weight_scale + 1
        else:
            beta_s = jnp.ones((cap_c, 12), dtype=dtype)
        if alpha is not None:
            alpha_s = jnp.tanh(alpha[sel_safe]) * weight_scale + 1
        else:
            alpha_s = jnp.ones((cap_c, 8), dtype=dtype)
        if gamma_f is not None:
            gamma_s = jax.nn.sigmoid(gamma_f[sel_safe]) * weight_scale \
                + (1 - weight_scale) / 2
        else:
            gamma_s = jnp.ones((cap_c,), dtype=dtype)

        # per-(cube, edge-slot) endpoints. _CUBE_EDGES orients each edge
        # axis-consistently (x/z edges low→high, y edges high→low), so the
        # stored pair identifies a geometric edge globally — matching the
        # host path's np.unique row identity AND its flip test, which reads
        # the sdf at stored endpoint 0 (NOT the min id).
        edge_pairs = rows[:, jnp.asarray(_CUBE_EDGES)].reshape(cap_c, 12, 2)
        ea = edge_pairs[..., 0]
        eb = edge_pairs[..., 1]

        # uniform dual-vertex layout: vd_id = cube_row * 4 + k
        num_vd = jnp.asarray(NUM_VD_TABLE)[case_ids]           # (cap_c,)
        grp = jnp.asarray(DMC_TABLE)[case_ids][:, :4, :]       # (cap_c,4,7)
        kk = jnp.arange(4)[None, :, None]
        entry_ok = ((grp != -1) & (kk < num_vd[:, None, None])
                    & cube_ok[:, None, None])                  # (cap_c,4,7)
        slot = jnp.where(entry_ok, grp, 0)                     # safe slots
        crow = jnp.arange(cap_c)[:, None, None]
        g_flat = (crow * 12 + slot).reshape(-1)                # (G,)
        e2vd = (crow * 4 + kk + jnp.zeros_like(slot)).reshape(-1)
        gmask = entry_ok.reshape(-1)

        # per-occurrence slot → vd id map (for quads); invalid entries land
        # in a sacrificial padding slot that is sliced off
        total_vd = cap_c * 4
        vd_of_slot = jnp.zeros((cap_c * 12 + 1,), jnp.int32).at[
            jnp.where(gmask, g_flat, cap_c * 12)].set(
            e2vd.astype(jnp.int32))[:cap_c * 12]

        # geometry group entries
        va = ea.reshape(-1)[g_flat]
        vb = eb.reshape(-1)[g_flat]
        x_group = jnp.stack([voxelgrid_vertices[va],
                             voxelgrid_vertices[vb]], axis=1)   # (G, 2, 3)
        s_group = jnp.stack([sdf[va], sdf[vb]], axis=1)[..., None]
        zc_group = self._linear_interp(s_group, x_group)
        alpha_12x2 = alpha_s[:, jnp.asarray(_CUBE_EDGES)].reshape(cap_c, 24)
        a_pair = alpha_12x2.reshape(cap_c * 12, 2)[g_flat][..., None]
        ue_group = self._linear_interp(s_group * a_pair, x_group)
        beta_group = beta_s.reshape(-1)[g_flat][:, None]
        beta_group = jnp.where(gmask[:, None], beta_group, 0.0)

        beta_sum = jax.ops.segment_sum(beta_group, e2vd,
                                       num_segments=total_vd)
        vd = jax.ops.segment_sum(ue_group * beta_group, e2vd,
                                 num_segments=total_vd) \
            / jnp.clip(beta_sum, 1e-12, None)
        vd_valid = (jax.ops.segment_sum(gmask.astype(jnp.int32), e2vd,
                                        num_segments=total_vd) > 0)
        # L_dev (ref :315), masked
        dist = jnp.linalg.norm(zc_group - vd[e2vd], axis=-1) * gmask
        vd_cnt = jax.ops.segment_sum(gmask.astype(dist.dtype), e2vd,
                                     num_segments=total_vd)
        mean_l2 = jax.ops.segment_sum(dist, e2vd, num_segments=total_vd) \
            / jnp.clip(vd_cnt, 1.0, None)
        l_dev = jnp.abs(dist - mean_l2[e2vd]) * gmask

        # ---- quads: group the 4 occurrences of each shared surface edge ----
        occ_ok = jnp.broadcast_to(cube_ok[:, None], (cap_c, 12)).reshape(-1)
        big = jnp.iinfo(jnp.int32).max
        ka = jnp.where(occ_ok, ea.reshape(-1), big)
        kb = jnp.where(occ_ok, eb.reshape(-1), big)
        order = jnp.lexsort((jnp.arange(cap_c * 12), kb, ka))
        sa, sb = ka[order], kb[order]
        newflag = jnp.concatenate([
            jnp.ones((1,), bool),
            (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])])
        run_id = jnp.cumsum(newflag) - 1
        run_len = jax.ops.segment_sum(jnp.ones_like(run_id), run_id,
                                      num_segments=cap_c * 12)[run_id]
        # surf edge: exactly one inside endpoint (guard the `big` padding)
        pa = jnp.clip(sa, 0, occ.shape[0] - 1)
        pb = jnp.clip(sb, 0, occ.shape[0] - 1)
        is_surf_edge = (occ[pa].astype(jnp.int32)
                        + occ[pb].astype(jnp.int32)) == 1
        quad_start = (newflag & (run_len == 4) & is_surf_edge
                      & (sa < big))
        n_quads = jnp.sum(quad_start.astype(jnp.int32))
        qsel = jnp.nonzero(quad_start, size=cap_q,
                           fill_value=cap_c * 12 - 4)[0]
        # nonzero returns real hits first, so validity is positional
        quad_ok = jnp.arange(cap_q) < jnp.minimum(n_quads, cap_q)
        qidx = qsel[:, None] + jnp.arange(4)[None, :]          # (cap_q, 4)
        vd_sorted = vd_of_slot[order]
        quad_vd = vd_sorted[qidx]                              # (cap_q, 4)
        # orientation: sdf at the min-id endpoint (host: surf_edges[e, 0])
        s_first = sdf[pa[qsel]]
        flip = s_first > 0
        quad_vd = jnp.where(flip[:, None], quad_vd[:, jnp.asarray([0, 1, 3, 2])],
                            quad_vd[:, jnp.asarray([2, 3, 1, 0])])

        # gamma split (ref :557)
        quad_gamma = gamma_s[quad_vd // 4]
        gamma_02 = quad_gamma[:, 0] * quad_gamma[:, 2]
        gamma_13 = quad_gamma[:, 1] * quad_gamma[:, 3]

        if not training:
            msk = gamma_02 > gamma_13
            f1 = quad_vd[:, jnp.asarray(_QUAD_SPLIT_1)]
            f2 = quad_vd[:, jnp.asarray(_QUAD_SPLIT_2)]
            faces = jnp.where(msk[:, None], f1, f2).reshape(-1, 3)
            vertices = vd
            face_mask = jnp.repeat(quad_ok, 2)
        else:
            vd_quad = vd[quad_vd.reshape(-1)].reshape(-1, 4, 3)
            vd_02 = (vd_quad[:, 0] + vd_quad[:, 2]) / 2
            vd_13 = (vd_quad[:, 1] + vd_quad[:, 3]) / 2
            wsum = gamma_02 + gamma_13 + 1e-8
            vd_center = (vd_02 * gamma_02[:, None]
                         + vd_13 * gamma_13[:, None]) / wsum[:, None]
            center_idx = jnp.arange(cap_q) + total_vd
            vertices = jnp.concatenate([vd, vd_center])
            faces = quad_vd[:, jnp.asarray(_QUAD_SPLIT_TRAIN)].reshape(-1, 4, 2)
            faces = jnp.concatenate(
                [faces, jnp.broadcast_to(center_idx[:, None, None],
                                         (cap_q, 4, 1))], axis=-1)
            faces = faces.reshape(-1, 3)
            face_mask = jnp.repeat(quad_ok, 4)
            vd_valid = jnp.concatenate([vd_valid, quad_ok])

        aux = {
            "face_mask": face_mask,
            "vertex_mask": vd_valid,
            "counts": {"surf_cubes": n_surf, "quads": n_quads},
            "capacities": {"surf_cubes": cap_c, "quads": cap_q},
        }
        return vertices, faces, l_dev, aux

    def _solve_qef(self, t, voxelgrid_vertices, surf_rows, zero_crossing,
                   normals, qef_reg_scale):
        """Per-dual-vertex QEF solve in masked fixed 7-slot layout
        (ref _solve_vd_QEF :441)."""
        total_vd = t.total_num_vd
        # scatter group entries into (V, 7) slots
        slot = np.zeros(t.edge_group.shape[0], dtype=np.int64)
        counts = np.zeros(total_vd, dtype=np.int64)
        for i, v in enumerate(t.edge_group_to_vd):
            slot[i] = counts[v]
            counts[v] += 1
        idx_group = np.asarray(
            t.idx_map.reshape(-1))[t.edge_group_to_cube * 12 + t.edge_group]
        p_mask = np.zeros((total_vd, 7), dtype=bool)
        p_idx = np.zeros((total_vd, 7), dtype=np.int64)
        p_mask[t.edge_group_to_vd, slot] = True
        p_idx[t.edge_group_to_vd, slot] = idx_group
        v0_cube = np.zeros(total_vd, dtype=np.int64)
        v0_cube[t.edge_group_to_vd] = t.edge_group_to_cube

        p = zero_crossing[jnp.asarray(p_idx)]          # (V, 7, 3)
        nrm = normals[jnp.asarray(p_idx)]
        msk = jnp.asarray(p_mask)[..., None]
        v0 = voxelgrid_vertices[jnp.asarray(surf_rows[v0_cube][:, 0])]  # (V, 3)
        centroid = jnp.sum(p * msk, axis=1) / jnp.clip(
            jnp.sum(msk, axis=1), 1, None)
        A = jnp.concatenate(
            [nrm * msk,
             jnp.broadcast_to(jnp.eye(3) * qef_reg_scale,
                              (total_vd, 3, 3))], axis=1)
        b = jnp.concatenate(
            [jnp.sum((p - v0[:, None]) * nrm, axis=-1, keepdims=True) * msk,
             (qef_reg_scale * (centroid - v0))[..., None]], axis=1)
        sol = jnp.linalg.lstsq(A, b)[0][..., 0]
        return sol + v0
