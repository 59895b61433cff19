"""Native (C++) host-side components, loaded via ctypes.

TPU-native analog of the reference's CPU C++ pieces (TriangleHash
``csrc/ops/mesh/triangle_hash.cpp``, ``points_to_octree``
``csrc/ops/spc/spc.cpp``): the XLA programs handle device compute; these
accelerate host-side preprocessing. The library builds on first use
(``g++`` one-liner, see :mod:`kaolin_tpu.native.build`); every consumer
falls back to the pure numpy implementation when unavailable.
"""

import ctypes
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)

__all__ = ["is_available", "check_sign_cpu", "points_to_octree",
           "points_to_sorted_morton", "lz4_decompress_block"]

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    from kaolin_tpu.native.build import build, library_path
    path = library_path()
    try:
        if not os.path.exists(path) or (
                os.path.getmtime(path) < os.path.getmtime(
                    os.path.join(os.path.dirname(__file__), "csrc",
                                 "kaolin_native.cpp"))):
            build(verbose=False)
        lib = ctypes.CDLL(path)
    except Exception as e:  # no toolchain / load failure → numpy fallbacks
        logger.warning("kaolin_tpu native library unavailable (%s); "
                       "falling back to numpy host paths", e)
        return None

    lib.check_sign_cpu.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
    lib.check_sign_cpu.restype = None
    lib.points_to_octree.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.points_to_octree.restype = ctypes.c_int64
    lib.points_to_sorted_morton.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint64)]
    lib.points_to_sorted_morton.restype = ctypes.c_int64
    lib.lz4_decompress_block.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
    lib.lz4_decompress_block.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def is_available():
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def check_sign_cpu(verts, faces, points, resolution=128):
    """TriangleHash-accelerated +z ray-parity inside test → (N,) bool, or
    None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    verts = np.ascontiguousarray(np.asarray(verts, dtype=np.float32))
    faces = np.ascontiguousarray(np.asarray(faces, dtype=np.int32))
    points = np.ascontiguousarray(np.asarray(points, dtype=np.float32))
    out = np.zeros((points.shape[0],), dtype=np.uint8)
    lib.check_sign_cpu(_ptr(verts, ctypes.c_float), verts.shape[0],
                       _ptr(faces, ctypes.c_int32), faces.shape[0],
                       _ptr(points, ctypes.c_float), points.shape[0],
                       int(resolution), _ptr(out, ctypes.c_uint8))
    return out.astype(bool)


def points_to_octree(points, level):
    """Quantized int points → BFS octree bytes (numpy uint8), or None."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(np.asarray(points, dtype=np.int32))
    cap = points.shape[0] * max(int(level), 1) + 8
    out = np.zeros((cap,), dtype=np.uint8)
    n = lib.points_to_octree(_ptr(points, ctypes.c_int32), points.shape[0],
                             int(level), _ptr(out, ctypes.c_uint8), cap)
    if n < 0:
        return None
    return out[:n].copy()


def points_to_sorted_morton(points):
    """int points → sorted unique uint64 morton codes (numpy), or None."""
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(np.asarray(points, dtype=np.int32))
    out = np.zeros((points.shape[0],), dtype=np.uint64)
    n = lib.points_to_sorted_morton(_ptr(points, ctypes.c_int32),
                                    points.shape[0],
                                    _ptr(out, ctypes.c_uint64))
    return out[:n].copy()


def lz4_decompress_block(data, decompressed_size):
    """LZ4 block decode → numpy uint8 of ``decompressed_size``. Falls back
    to a pure-Python decoder when the native library is unavailable."""
    data = np.frombuffer(bytes(data), dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.zeros((int(decompressed_size),), dtype=np.uint8)
        n = lib.lz4_decompress_block(_ptr(data, ctypes.c_uint8),
                                     data.shape[0],
                                     _ptr(out, ctypes.c_uint8), out.shape[0])
        if n < 0:
            raise ValueError("malformed LZ4 block")
        return out[:n]
    return _lz4_decompress_py(bytes(data), int(decompressed_size))


def _lz4_decompress_py(src, dst_cap):
    """Pure-Python LZ4 block decoder (slow path)."""
    out = bytearray()
    i, n = 0, len(src)
    while i < n:
        token = src[i]; i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]; i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i >= n:
            break
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        mlen = (token & 0xF)
        if mlen == 15:
            while True:
                b = src[i]; i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        start = len(out) - offset
        if offset == 0 or start < 0:
            raise ValueError("malformed LZ4 block")
        for k in range(mlen):
            out.append(out[start + k])
    if len(out) > dst_cap:
        raise ValueError("LZ4 output exceeds expected size")
    return np.frombuffer(bytes(out), dtype=np.uint8)
