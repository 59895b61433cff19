"""Heterogeneous-mesh handler tests, ported from reference
``tests/python/kaolin/io/test_utils.py::TestUtils::
test_mesh_handler_naive_triangulate`` (adapted to this repo's flat
per-face-vertex feature convention — callers reshape to (T, 3))."""

import numpy as np
import pytest

from kaolin_tpu.io import utils


@pytest.mark.parametrize("handler", [
    utils.heterogeneous_mesh_handler_naive_homogenize,
    utils.mesh_handler_naive_triangulate,
])
@pytest.mark.parametrize("face_assignment_mode", [0, 1, 2])
def test_mesh_handler_naive_triangulate(handler, face_assignment_mode):
    n = 15
    vertices = np.random.RandomState(0).rand(n, 3).astype(np.float32)
    face_vertex_counts = np.asarray([3, 4, 5, 3, 6])
    faces = np.asarray(
        [0, 1, 2,                  # Face 0 -> 1 tri  [0]
         2, 1, 3, 4,               # Face 1 -> 2 tris [1, 2]
         4, 5, 6, 7, 8,            # Face 2 -> 3 tris [3, 4, 5]
         3, 4, 6,                  # Face 3 -> 1 tri  [6]
         8, 9, 10, 11, 12, 13])    # Face 4 -> 4 tris [7..10]
    expected_faces = np.asarray(
        [[0, 1, 2],
         [2, 1, 3], [2, 3, 4],
         [4, 5, 6], [4, 6, 7], [4, 7, 8],
         [3, 4, 6],
         [8, 9, 10], [8, 10, 11], [8, 11, 12], [8, 12, 13]])
    face_uvs_idx = np.asarray(
        [0, 1, 2,
         10, 11, 12, 13,
         20, 21, 22, 23, 24,
         30, 31, 32,
         40, 41, 42, 43, 44, 45])
    expected_face_uvs_idx = np.asarray(
        [[0, 1, 2],
         [10, 11, 12], [10, 12, 13],
         [20, 21, 22], [20, 22, 23], [20, 23, 24],
         [30, 31, 32],
         [40, 41, 42], [40, 42, 43], [40, 43, 44], [40, 44, 45]])

    face_assignments = expected_assignments = None
    if face_assignment_mode == 1:   # 1D id lists → expanded new ids
        face_assignments = {"1": np.asarray([0, 2]),
                            "2": np.asarray([1, 3, 4])}
        expected_assignments = {"1": np.asarray([0, 3, 4, 5]),
                                "2": np.asarray([1, 2, 6, 7, 8, 9, 10])}
    elif face_assignment_mode == 2:  # 2D (start, end) rows → remapped
        face_assignments = {"cat": np.asarray([[0, 2], [3, 4], [2, 5]]),
                            "dog": np.asarray([[1, 3]])}
        expected_assignments = {"cat": np.asarray([[0, 3], [6, 7], [3, 11]]),
                                "dog": np.asarray([[1, 6]])}

    res = handler(vertices, face_vertex_counts, faces, face_uvs_idx,
                  face_assignments=face_assignments)
    assert len(res) == (5 if face_assignments is not None else 4)
    new_vertices, new_counts, new_faces, new_uvs_idx = res[:4]

    np.testing.assert_allclose(new_vertices, vertices)
    np.testing.assert_array_equal(new_counts, np.full(11, 3))
    np.testing.assert_array_equal(np.asarray(new_faces).reshape(-1, 3),
                                  expected_faces)
    np.testing.assert_array_equal(np.asarray(new_uvs_idx).reshape(-1, 3),
                                  expected_face_uvs_idx)
    if face_assignments is not None:
        got = res[4]
        assert set(got) == set(expected_assignments)
        for k in got:
            np.testing.assert_array_equal(got[k], expected_assignments[k])


def test_skip_handler_returns_none():
    assert utils.heterogeneous_mesh_handler_skip(1, 2, 3) is None


def test_obj_heterogeneous_two_face_material_not_misread_as_range(tmp_path):
    """A material assigned exactly 2 polygon faces must expand per-face (the
    old code misread 1D length-2 lists as (start, end) ranges)."""
    obj = tmp_path / "het.obj"
    obj.write_text("""
mtllib het.mtl
v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nv 0 0 1\nv 1 0 1
usemtl red
f 1 2 3 4
f 1 2 5
usemtl blue
f 2 3 6
""")
    (tmp_path / "het.mtl").write_text(
        "newmtl red\nKd 1 0 0\nnewmtl blue\nKd 0 0 1\n")
    from kaolin_tpu.io.obj import import_mesh
    mesh = import_mesh(str(obj), with_materials=True, triangulate=True,
                       raw_materials=False)
    # quad → 2 tris; "red" covers tris {0,1,2}, "blue" covers {3}
    assign = np.asarray(mesh.material_assignments)
    names = [m.material_name for m in mesh.materials]
    red = names.index("red")
    blue = names.index("blue")
    np.testing.assert_array_equal(assign, [red, red, red, blue])
