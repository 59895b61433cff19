"""Dash3D streaming helper + wire format (ref experimental/dash3d/util.py).

The live tornado server was verified end-to-end separately (websocket
protocol: dirinfo, snap-to-time, dedup, malformed requests); these tests
cover the wire format and the request dispatch headlessly.
"""

import struct

import numpy as np

from kaolin_tpu.experimental.dash3d import (
    StreamingGeometryHelper,
    meshes_to_binary,
    point_clouds_to_binary,
)
from kaolin_tpu.visualize.timelapse import Timelapse


def _sphere(r=1.0, n_lat=6, n_lon=8):
    lat = np.linspace(0.1, np.pi - 0.1, n_lat)
    lon = np.linspace(0, 2 * np.pi, n_lon, endpoint=False)
    th, ph = np.meshgrid(lat, lon, indexing="ij")
    v = r * np.stack([np.sin(th) * np.cos(ph), np.cos(th),
                      np.sin(th) * np.sin(ph)], -1).reshape(-1, 3)
    faces = []
    for i in range(n_lat - 1):
        for j in range(n_lon):
            a = i * n_lon + j
            b = i * n_lon + (j + 1) % n_lon
            c = (i + 1) * n_lon + j
            d = (i + 1) * n_lon + (j + 1) % n_lon
            faces.append([a, b, c])
            faces.append([b, d, c])
    return v.astype(np.float32), np.asarray(faces, np.int32)


def test_binary_wire_format():
    v, f = _sphere()
    blob = meshes_to_binary([v], [f])
    nmeshes, tex, _, _ = struct.unpack("<4i", blob[:16])
    assert nmeshes == 1 and tex == 0
    nv, nf = struct.unpack("<2i", blob[16:24])
    assert nv == v.shape[0] and nf == f.shape[0]
    verts = np.frombuffer(blob[24:24 + nv * 12], "<f4").reshape(nv, 3)
    np.testing.assert_allclose(verts, v)
    faces = np.frombuffer(blob[24 + nv * 12:24 + nv * 12 + nf * 12],
                          "<i4").reshape(nf, 3)
    np.testing.assert_array_equal(faces, f)

    pts = np.random.RandomState(0).randn(37, 3).astype(np.float32)
    blob = point_clouds_to_binary([pts])
    ncl = struct.unpack("<i", blob[:4])[0]
    assert ncl == 1
    npts = struct.unpack("<i", blob[16:20])[0]
    assert npts == 37
    bbox = np.frombuffer(blob[24:48], "<f4")
    np.testing.assert_allclose(bbox[:3], pts.min(0), rtol=1e-6)
    np.testing.assert_allclose(bbox[3:], pts.max(0), rtol=1e-6)


def test_streaming_helper_snap_and_dedup(tmp_path):
    logdir = str(tmp_path)
    tl = Timelapse(logdir)
    for it, r in [(0, 1.0), (50, 1.25), (100, 1.5)]:
        v, f = _sphere(r=r)
        tl.add_mesh_batch(iteration=it, category="opt",
                          vertices_list=[v], faces_list=[f])
        tl.add_pointcloud_batch(iteration=it, category="pc",
                                pointcloud_list=[v])

    helper = StreamingGeometryHelper(logdir)
    info = helper.get_directory_info()
    assert '"opt"' in info and '"pc"' in info

    # snap to latest
    msg = helper.get_requested_geometry(
        {"type": "mesh", "category": "opt", "id": 0, "time": 1e9,
         "view_id": 3})
    type_id, view_id, snap, _ = struct.unpack("<4i", msg[:16])
    assert (type_id, view_id, snap) == (0, 3, 100)
    nv, nf = struct.unpack("<2i", msg[32:40])
    verts = np.frombuffer(msg[40:40 + nv * 12], "<f4").reshape(nv, 3)
    np.testing.assert_allclose(np.linalg.norm(verts, axis=1).mean(), 1.5,
                               atol=1e-3)

    # snap to nearest checkpoint
    msg = helper.get_requested_geometry(
        {"type": "mesh", "category": "opt", "id": 0, "time": 49,
         "view_id": 0})
    assert struct.unpack("<4i", msg[:16])[2] == 50

    # dedup: current_time == snap_time → None
    assert helper.get_requested_geometry(
        {"type": "mesh", "category": "opt", "id": 0, "time": 100,
         "view_id": 0, "current_time": 100}) is None

    # pointcloud path
    msg = helper.get_requested_geometry(
        {"type": "pointcloud", "category": "pc", "id": 0, "time": 0,
         "view_id": 1})
    assert struct.unpack("<4i", msg[:16])[0] == 1

    # missing / malformed → None, no crash
    assert helper.get_requested_geometry(
        {"type": "mesh", "category": "nope", "id": 9, "time": 0,
         "view_id": 0}) is None
    assert helper.get_requested_geometry({"type": "mesh"}) is None
