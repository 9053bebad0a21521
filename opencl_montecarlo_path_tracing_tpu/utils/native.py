"""ctypes bindings for the native runtime (native/pamscene.cpp).

Builds lazily with make on first use if the shared library is missing;
falls back to None when no toolchain is available (callers keep the pure-
Python path).  See native/pamscene.cpp for the C ABI.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpamscene.so")

_lib = None
_tried = False


def load(build: bool = True):
    """Returns the loaded library or None."""
    global _lib, _tried
    if _lib is not None or (_tried and not build):
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.pam_write.restype = ctypes.c_int
    lib.pam_write.argtypes = [ctypes.c_char_p] + [ctypes.c_uint32] * 5 + [
        ctypes.c_void_p]
    lib.pam_read.restype = ctypes.c_int
    lib.pam_read.argtypes = [ctypes.c_char_p] + [
        ctypes.POINTER(ctypes.c_uint32)] * 4 + [ctypes.c_void_p,
                                                ctypes.c_uint64]
    lib.scene_parse_bitmap.restype = ctypes.c_int
    lib.scene_parse_bitmap.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64)]
    lib.scene_parse_triangles.restype = ctypes.c_int
    lib.scene_parse_triangles.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_float),
                                          ctypes.c_int]
    lib.scene_parse_lights.restype = ctypes.c_int
    lib.scene_parse_lights.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int]
    _lib = lib
    return _lib


def pam_write(path: str, width: int, height: int, channels: int,
              maxval: int, depth: int, data: np.ndarray) -> bool:
    lib = load()
    if lib is None:
        return False
    data = np.ascontiguousarray(data)
    rc = lib.pam_write(path.encode(), width, height, channels, maxval,
                       depth, data.ctypes.data_as(ctypes.c_void_p))
    return rc == 0


def pam_read(path: str):
    """Returns (width, height, channels, maxval, samples ndarray) or None."""
    lib = load()
    if lib is None:
        return None
    w = ctypes.c_uint32()
    h = ctypes.c_uint32()
    ch = ctypes.c_uint32()
    mv = ctypes.c_uint32()
    if lib.pam_read(path.encode(), w, h, ch, mv, None, 0) != 0:
        return None
    depth = 16 if mv.value > 255 else 8
    mem_ch = ch.value + (1 if ch.value == 3 else 0)
    dtype = np.uint16 if depth == 16 else np.uint8
    buf = np.empty(w.value * h.value * mem_ch, dtype)
    rc = lib.pam_read(path.encode(), w, h, ch, mv,
                      buf.ctypes.data_as(ctypes.c_void_p), buf.nbytes)
    if rc != 0:
        return None
    return w.value, h.value, ch.value, mv.value, buf


def parse_bitmap(path: str):
    lib = load()
    if lib is None:
        return None
    out = (ctypes.c_int64 * 9)()
    if lib.scene_parse_bitmap(path.encode(), out) != 0:
        return None
    return np.array(out[:], np.int64)


def parse_triangles(path: str, max_triangles: int):
    lib = load()
    if lib is None:
        return None
    buf = np.zeros(max_triangles * 9, np.float32)
    n = lib.scene_parse_triangles(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_triangles)
    if n < 0:
        return None
    return buf[:n * 9].reshape(n, 3, 3)


def parse_lights(path: str, max_lights: int):
    lib = load()
    if lib is None:
        return None
    buf = np.zeros(max_lights * 4, np.float32)
    n = lib.scene_parse_lights(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_lights)
    if n < 0:
        return None
    return buf[:n * 4].reshape(n, 4)
