"""Depth tests for voxelgrid conversions, mirroring the reference's
voxelgrid coverage (reference tests/python/kaolin/ops/conversions/
test_voxelgrid.py): marching-cubes topology/manifoldness across iso values
and batch entries, cubic quad/tri meshes with exposed-face counting, empty
and full grids, and mesh→voxel→mesh round trips.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from kaolin_tpu.ops.conversions import (
    pointclouds_to_voxelgrids,
    trianglemeshes_to_voxelgrids,
    voxelgrids_to_cubic_meshes,
    voxelgrids_to_trianglemeshes,
)


def _euler_characteristic(verts, faces):
    faces = np.asarray(faces)
    v = np.asarray(verts).shape[0]
    f = faces.shape[0]
    edges = set()
    for tri in faces:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            edges.add(tuple(sorted((int(tri[a]), int(tri[b])))))
    return v - len(edges) + f


def _edge_use_counts(faces):
    from collections import Counter
    c = Counter()
    for tri in np.asarray(faces):
        for a, b in ((0, 1), (1, 2), (2, 0)):
            c[tuple(sorted((int(tri[a]), int(tri[b]))))] += 1
    return c


class TestMarchingCubes:
    def test_single_voxel_is_sphere_topology(self):
        vg = np.zeros((1, 3, 3, 3), np.float32)
        vg[0, 1, 1, 1] = 1.0
        verts, faces = voxelgrids_to_trianglemeshes(jnp.asarray(vg))
        v, f = verts[0], faces[0]
        assert f.shape[0] > 0
        # closed 2-manifold: every edge shared by exactly 2 faces, Euler = 2
        counts = _edge_use_counts(f)
        assert set(counts.values()) == {2}
        assert _euler_characteristic(v, f) == 2

    def test_two_disjoint_voxels(self):
        vg = np.zeros((1, 7, 3, 3), np.float32)
        vg[0, 1, 1, 1] = 1.0
        vg[0, 5, 1, 1] = 1.0
        verts, faces = voxelgrids_to_trianglemeshes(jnp.asarray(vg))
        # two sphere-topology components: Euler characteristic 4
        assert _euler_characteristic(verts[0], faces[0]) == 4
        assert set(_edge_use_counts(faces[0]).values()) == {2}

    def test_solid_block_stays_closed(self):
        vg = np.zeros((1, 6, 6, 6), np.float32)
        vg[0, 1:5, 1:5, 1:5] = 1.0
        verts, faces = voxelgrids_to_trianglemeshes(jnp.asarray(vg))
        assert set(_edge_use_counts(faces[0]).values()) == {2}
        assert _euler_characteristic(verts[0], faces[0]) == 2

    def test_iso_value_grows_surface(self):
        # a radial scalar field: lower iso → larger enclosed volume
        n = 12
        g = np.zeros((1, n, n, n), np.float32)
        c = (n - 1) / 2.0
        for i in range(n):
            for j in range(n):
                for k in range(n):
                    r = np.linalg.norm(np.asarray([i, j, k]) - c)
                    g[0, i, j, k] = max(0.0, 1.0 - r / c)
        v_lo, f_lo = voxelgrids_to_trianglemeshes(jnp.asarray(g),
                                                  iso_value=0.2)
        v_hi, f_hi = voxelgrids_to_trianglemeshes(jnp.asarray(g),
                                                  iso_value=0.8)
        ext_lo = np.asarray(v_lo[0]).max(0) - np.asarray(v_lo[0]).min(0)
        ext_hi = np.asarray(v_hi[0]).max(0) - np.asarray(v_hi[0]).min(0)
        assert np.all(ext_lo > ext_hi)

    def test_empty_and_batch(self):
        vg = np.zeros((2, 4, 4, 4), np.float32)
        vg[1, 1:3, 1:3, 1:3] = 1.0
        verts, faces = voxelgrids_to_trianglemeshes(jnp.asarray(vg))
        assert len(verts) == 2 and len(faces) == 2
        assert faces[0].shape[0] == 0
        assert faces[1].shape[0] > 0

    def test_vertices_on_interpolated_crossings(self):
        # iso 0.5 between 0 and 1 values: crossing vertices sit halfway
        # between voxel centers → all coordinates are multiples of 0.5
        vg = np.zeros((1, 3, 3, 3), np.float32)
        vg[0, 1, 1, 1] = 1.0
        verts, _ = voxelgrids_to_trianglemeshes(jnp.asarray(vg))
        v = np.asarray(verts[0])
        np.testing.assert_allclose(v * 2, np.round(v * 2), atol=1e-5)


class TestCubicMeshes:
    def test_single_voxel_cube_counts(self):
        vg = jnp.asarray(np.ones((1, 1, 1, 1), np.float32))
        verts, faces = voxelgrids_to_cubic_meshes(vg, is_trimesh=False)
        assert np.asarray(verts[0]).shape == (8, 3)
        assert np.asarray(faces[0]).shape == (6, 4)
        verts_t, faces_t = voxelgrids_to_cubic_meshes(vg, is_trimesh=True)
        assert np.asarray(faces_t[0]).shape == (12, 3)

    def test_hidden_faces_culled(self):
        # 2x1x1 bar: 2 cubes share one internal face → 10 quads, 12 verts
        vg = jnp.asarray(np.ones((1, 2, 1, 1), np.float32))
        verts, faces = voxelgrids_to_cubic_meshes(vg, is_trimesh=False)
        assert np.asarray(faces[0]).shape == (10, 4)
        assert np.asarray(verts[0]).shape == (12, 3)

    def test_quads_face_outward(self):
        vg = jnp.asarray(np.ones((1, 1, 1, 1), np.float32))
        verts, faces = voxelgrids_to_cubic_meshes(vg, is_trimesh=False)
        v = np.asarray(verts[0])
        center = v.mean(0)
        for quad in np.asarray(faces[0]):
            a, b, c = v[quad[0]], v[quad[1]], v[quad[2]]
            n = np.cross(b - a, c - a)
            outward = a + 0.25 * (b - a) + 0.25 * (c - a) - center
            assert n @ outward > 0  # consistent outward winding

    def test_solid_block_surface_area(self):
        # 3³ block: only the 54 boundary faces survive
        vg = jnp.asarray(np.ones((1, 3, 3, 3), np.float32))
        _, faces = voxelgrids_to_cubic_meshes(vg, is_trimesh=False)
        assert np.asarray(faces[0]).shape[0] == 6 * 9

    def test_empty_grid(self):
        vg = jnp.asarray(np.zeros((1, 3, 3, 3), np.float32))
        verts, faces = voxelgrids_to_cubic_meshes(vg)
        assert np.asarray(verts[0]).shape[0] == 0
        assert np.asarray(faces[0]).shape[0] == 0


class TestRoundTrips:
    def test_mesh_to_voxel_to_mesh(self):
        # voxelize a big cube mesh and march it back: the result stays a
        # closed surface of roughly the same extent
        verts = jnp.asarray([[0.1, 0.1, 0.1], [0.9, 0.1, 0.1],
                             [0.9, 0.9, 0.1], [0.1, 0.9, 0.1],
                             [0.1, 0.1, 0.9], [0.9, 0.1, 0.9],
                             [0.9, 0.9, 0.9], [0.1, 0.9, 0.9]])[None]
        faces = jnp.asarray([
            [0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7],
            [0, 1, 5], [0, 5, 4], [2, 3, 7], [2, 7, 6],
            [1, 2, 6], [1, 6, 5], [0, 4, 7], [0, 7, 3]], dtype=jnp.int32)
        res = 16
        vg = trianglemeshes_to_voxelgrids(verts, faces, res)
        assert float(jnp.sum(vg)) > 0
        mverts, mfaces = voxelgrids_to_trianglemeshes(vg)
        assert mfaces[0].shape[0] > 0
        ext = (np.asarray(mverts[0]).max(0)
               - np.asarray(mverts[0]).min(0)) / res
        np.testing.assert_allclose(ext, 0.8, atol=0.2)

    def test_pointcloud_voxelization_counts(self):
        pts = jnp.asarray([[[0.05, 0.05, 0.05], [0.95, 0.95, 0.95],
                            [0.93, 0.95, 0.95]]])
        vg = np.asarray(pointclouds_to_voxelgrids(pts, 4))
        assert vg.shape == (1, 4, 4, 4)
        assert vg[0, 0, 0, 0] == 1
        assert vg[0, 3, 3, 3] == 1
        assert vg.sum() == 2  # two points share the last voxel
