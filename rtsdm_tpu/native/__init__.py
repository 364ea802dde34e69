"""Native (C++) helpers, loaded via ctypes. Built on demand with g++; every
entry point has a pure-python fallback in its caller, so a missing toolchain
degrades gracefully."""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("rtsdm")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "_scenekit.so")
_SRC = os.path.join(_DIR, "scenekit.cpp")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                            _SRC, "-o", _SO], check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.scenekit_parse_obj.restype = ctypes.c_void_p
        lib.scenekit_parse_obj.argtypes = [ctypes.c_char_p]
        lib.scenekit_num_tris.restype = ctypes.c_int64
        lib.scenekit_num_tris.argtypes = [ctypes.c_void_p]
        lib.scenekit_has_extras.restype = ctypes.c_int
        lib.scenekit_has_extras.argtypes = [ctypes.c_void_p]
        lib.scenekit_positions.restype = ctypes.POINTER(ctypes.c_float)
        lib.scenekit_positions.argtypes = [ctypes.c_void_p]
        lib.scenekit_material_ids.restype = ctypes.POINTER(ctypes.c_int32)
        lib.scenekit_material_ids.argtypes = [ctypes.c_void_p]
        lib.scenekit_material_names.restype = ctypes.c_char_p
        lib.scenekit_material_names.argtypes = [ctypes.c_void_p]
        lib.scenekit_free.argtypes = [ctypes.c_void_p]
        lib.scenekit_morton_codes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint32)]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        log.warning("scenekit native build unavailable (%s); python fallbacks in use", e)
        _lib = False
    return _lib


class scenekit:
    @staticmethod
    def parse_obj(path):
        """Returns (positions [T,3,3], normals=None, texcoords=None,
        material_id [T], materials list) or None when the file needs the
        python parser (normals/uvs present) or the lib is unavailable."""
        lib = _load()
        if not lib:
            return None
        h = lib.scenekit_parse_obj(path.encode())
        if not h:
            return None
        try:
            if lib.scenekit_has_extras(h):
                return None  # python parser handles vn/vt
            n = lib.scenekit_num_tris(h)
            if n == 0:
                return None
            pos = np.ctypeslib.as_array(lib.scenekit_positions(h),
                                        shape=(n, 3, 3)).copy()
            mid = np.ctypeslib.as_array(lib.scenekit_material_ids(h),
                                        shape=(n,)).copy()
            names = lib.scenekit_material_names(h).decode().split("\n")
            names = [x for x in names if x]
            mats = [dict(base_color=(0.8, 0.8, 0.8)) for _ in (names or ["d"])]
            return pos, None, None, mid, mats
        finally:
            lib.scenekit_free(h)

    @staticmethod
    def morton_codes(centroids, bmin, bmax):
        lib = _load()
        c = np.ascontiguousarray(centroids, np.float32)
        n = c.shape[0]
        if not lib:
            # python fallback
            def expand(v):
                v = (v * 0x00010001) & 0xFF0000FF
                v = (v * 0x00000101) & 0x0F00F00F
                v = (v * 0x00000011) & 0xC30C30C3
                v = (v * 0x00000005) & 0x49249249
                return v
            ext = np.maximum(np.asarray(bmax) - np.asarray(bmin), 1e-9)
            q = np.clip((c - bmin) / ext, 0, 1)
            q = (q * 1023).astype(np.uint64)
            return (expand(q[:, 0]) << 2 | expand(q[:, 1]) << 1
                    | expand(q[:, 2])).astype(np.uint32)
        out = np.empty((n,), np.uint32)
        bmin_a = np.ascontiguousarray(bmin, np.float32)
        bmax_a = np.ascontiguousarray(bmax, np.float32)
        lib.scenekit_morton_codes(
            c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
            bmin_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            bmax_a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
        return out
