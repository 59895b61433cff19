"""Dash3D streaming helper + wire format (ref experimental/dash3d/util.py).

The live tornado server was verified end-to-end separately (websocket
protocol: dirinfo, snap-to-time, dedup, malformed requests); these tests
cover the wire format and the request dispatch headlessly.
"""

import os
import re
import struct

import numpy as np
import pytest

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


# ---------------------------------------------------------------------------
# frontend contract tests (the image ships no browser/node, so the JS wire
# parser's byte-offset contract is pinned from Python — the same idea as the
# reference's tests/integration/experimental/dash3d/test_binary_parse.js)
# ---------------------------------------------------------------------------

_STATIC = os.path.join(os.path.dirname(__file__), "..", "..", "kaolin_tpu",
                       "experimental", "dash3d", "static")


def _js_parse_meshes(blob, off):
    """Python mirror of geometry.js parseMeshes — byte-for-byte the same
    offset walk the browser performs."""
    nmeshes = struct.unpack_from("<i", blob, off)[0]
    off += 16
    meshes = []
    for _ in range(nmeshes):
        nv, nf = struct.unpack_from("<2i", blob, off)
        off += 8
        verts = np.frombuffer(blob, "<f4", nv * 3, off).reshape(-1, 3)
        off += nv * 12
        faces = np.frombuffer(blob, "<i4", nf * 3, off).reshape(-1, 3)
        off += nf * 12
        meshes.append((verts, faces))
    return meshes, off


def _js_parse_clouds(blob, off):
    """Python mirror of geometry.js parseClouds."""
    nclouds = struct.unpack_from("<i", blob, off)[0]
    off += 16
    clouds = []
    for _ in range(nclouds):
        npts = struct.unpack_from("<i", blob, off)[0]
        off += 8
        bbox_min = np.frombuffer(blob, "<f4", 3, off)
        bbox_max = np.frombuffer(blob, "<f4", 3, off + 12)
        off += 24
        pts = np.frombuffer(blob, "<f4", npts * 3, off).reshape(-1, 3)
        off += npts * 12
        clouds.append((pts, bbox_min, bbox_max))
    return clouds, off


def test_js_mesh_parse_contract():
    """The geometry.js offset walk must decode meshes_to_binary exactly and
    consume every byte (two meshes, unequal sizes)."""
    v1, f1 = _sphere(1.0, 5, 7)
    v2, f2 = _sphere(0.5, 8, 6)
    blob = meshes_to_binary([v1, v2], [f1, f2])
    meshes, end = _js_parse_meshes(blob, 0)
    assert end == len(blob)
    np.testing.assert_array_equal(meshes[0][0], v1)
    np.testing.assert_array_equal(meshes[0][1], f1)
    np.testing.assert_array_equal(meshes[1][0], v2)
    np.testing.assert_array_equal(meshes[1][1], f2)


def test_js_cloud_parse_contract():
    v1, _ = _sphere(1.0, 5, 7)
    v2, _ = _sphere(2.0, 4, 5)
    blob = point_clouds_to_binary([v1, v2])
    clouds, end = _js_parse_clouds(blob, 0)
    assert end == len(blob)
    np.testing.assert_array_equal(clouds[0][0], v1)
    np.testing.assert_array_equal(clouds[1][0], v2)
    np.testing.assert_array_equal(clouds[1][1], v2.min(0))
    np.testing.assert_array_equal(clouds[1][2], v2.max(0))


def test_static_assets_wellformed():
    """Gross-syntax check of the shipped JS (no JS engine in the image):
    balanced brackets outside strings/comments, required symbols present."""
    for fname, symbols in (
            ("geometry.js", ["parseMeshes", "parseClouds", "parseHeader",
                             "computeVertexNormals", "Dash3DGeometry",
                             "perspective", "orbitView"]),
            ("dash3d.js", ["webgl", "uProj", "drawElements", "gl.POINTS",
                           "Dash3DGeometry", "WebSocket"])):
        with open(os.path.join(_STATIC, fname)) as f:
            src = f.read()
        for sym in symbols:
            assert sym in src, (fname, sym)
        # strip strings/comments, then require balanced delimiters
        stripped = re.sub(r"//[^\n]*|/\*.*?\*/|`[^`]*`|\"[^\"]*\"|'[^']*'",
                          "", src, flags=re.S)
        for op, cl in ("{}", "()", "[]"):
            assert stripped.count(op) == stripped.count(cl), (fname, op)


def test_server_serves_frontend(tmp_path):
    """Tornado integration: index + both static assets respond 200 and the
    template includes the shared geometry module before the renderer."""
    tornado = pytest.importorskip("tornado")
    import asyncio
    from tornado.httpclient import AsyncHTTPClient
    from kaolin_tpu.experimental.dash3d.run import create_server

    v, f = _sphere()
    tl = Timelapse(str(tmp_path))
    tl.add_mesh_batch(iteration=0, category="opt", vertices_list=[v],
                      faces_list=[f])

    async def drive():
        app = create_server(str(tmp_path))
        server = app.listen(0)
        port = next(iter(server._sockets.values())).getsockname()[1]
        client = AsyncHTTPClient()
        index = await client.fetch(f"http://127.0.0.1:{port}/")
        geom = await client.fetch(
            f"http://127.0.0.1:{port}/static/geometry.js")
        main = await client.fetch(
            f"http://127.0.0.1:{port}/static/dash3d.js")
        server.stop()
        return index.body.decode(), geom.body.decode(), main.body.decode()

    index, geom, main = asyncio.new_event_loop().run_until_complete(drive())
    assert index.index("/static/geometry.js") < index.index(
        "/static/dash3d.js")
    assert "Dash3DGeometry" in geom
    assert "webgl" in main
