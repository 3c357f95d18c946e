"""ctypes binding for the native (C++) host runtime.

Builds rayzen_native.cpp into a shared library on first use (g++ -O3; no
pybind11/pip dependency) and exposes drop-in replacements for the Python BVH
builders and OBJ parser. Falls back to the numpy implementations when a compiler
is unavailable (set RAYZEN_NATIVE=0 to force the fallback).

The native and Python builders produce identical arrays (asserted in
tests/test_native.py), so caches and golden images are builder-agnostic.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from .. import logging_util as log
from .builder import BLAS, build_blas as _py_build_blas, build_tlas as _py_build_tlas

_SRC = os.path.join(os.path.dirname(__file__), "..", "native", "rayzen_native.cpp")
_LIB_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "build")
_LIB = os.path.join(_LIB_DIR, "librayzen_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _compile_library() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        os.path.abspath(_SRC), "-o", os.path.abspath(_LIB),
    ]
    try:
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        log.error(f"native build failed to run: {e}")
        return False
    if res.returncode != 0:
        log.error(f"native build failed:\n{res.stderr[:2000]}")
        return False
    return True


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("RAYZEN_NATIVE", "1") == "0":
            return None
        src_mtime = os.path.getmtime(_SRC)
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < src_mtime:
            if not _compile_library():
                return None
        try:
            lib = ctypes.CDLL(os.path.abspath(_LIB))
        except OSError as e:
            log.error(f"native library load failed: {e}")
            return None
        lib.rz_build_blas.restype = ctypes.c_void_p
        lib.rz_build_blas.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.rz_build_tlas.restype = ctypes.c_void_p
        lib.rz_build_tlas.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
        ]
        lib.rz_bvh_num_nodes.restype = ctypes.c_int64
        lib.rz_bvh_num_nodes.argtypes = [ctypes.c_void_p]
        lib.rz_bvh_num_prims.restype = ctypes.c_int64
        lib.rz_bvh_num_prims.argtypes = [ctypes.c_void_p]
        lib.rz_bvh_copy.restype = None
        lib.rz_bvh_copy.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.rz_bvh_free.restype = None
        lib.rz_bvh_free.argtypes = [ctypes.c_void_p]
        lib.rz_obj_parse.restype = ctypes.c_void_p
        lib.rz_obj_parse.argtypes = [ctypes.c_char_p]
        lib.rz_obj_num_triangles.restype = ctypes.c_int64
        lib.rz_obj_num_triangles.argtypes = [ctypes.c_void_p]
        lib.rz_obj_copy.restype = None
        lib.rz_obj_copy.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.rz_obj_free.restype = None
        lib.rz_obj_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        log.debug("native runtime loaded")
        return _lib


def available() -> bool:
    return _load() is not None


def _unpack(lib, handle) -> BLAS:
    try:
        n_nodes = lib.rz_bvh_num_nodes(handle)
        n_prims = lib.rz_bvh_num_prims(handle)
        bounds = np.empty((n_nodes, 6), dtype=np.float32)
        meta = np.empty((n_nodes, 3), dtype=np.int32)
        order = np.empty((n_prims,), dtype=np.int64)
        lib.rz_bvh_copy(
            handle,
            bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            order.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    finally:
        lib.rz_bvh_free(handle)
    return BLAS(
        bounds_min=np.ascontiguousarray(bounds[:, :3]),
        bounds_max=np.ascontiguousarray(bounds[:, 3:]),
        left_first=np.ascontiguousarray(meta[:, 0]),
        count=np.ascontiguousarray(meta[:, 1]),
        miss=np.ascontiguousarray(meta[:, 2]),
        order=order,
    )


def build_blas(tri_verts: np.ndarray, leaf_size: int = 4, split_method: str = "sah") -> BLAS:
    """Native BLAS build; transparently falls back to the numpy builder."""
    lib = _load()
    if lib is None:
        return _py_build_blas(tri_verts, leaf_size, split_method)
    verts = np.ascontiguousarray(tri_verts, dtype=np.float32).reshape(-1, 9)
    handle = lib.rz_build_blas(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        verts.shape[0],
        leaf_size,
        1 if split_method == "sah" else 0,
    )
    return _unpack(lib, handle)


def build_tlas(inst_bmin: np.ndarray, inst_bmax: np.ndarray) -> BLAS:
    lib = _load()
    if lib is None:
        return _py_build_tlas(inst_bmin, inst_bmax)
    bmin = np.ascontiguousarray(inst_bmin, dtype=np.float32).reshape(-1, 3)
    bmax = np.ascontiguousarray(inst_bmax, dtype=np.float32).reshape(-1, 3)
    handle = lib.rz_build_tlas(
        bmin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bmax.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        bmin.shape[0],
    )
    return _unpack(lib, handle)


def parse_obj_file(path: str):
    """Native OBJ parse; returns (T, 3, 3) float32 vertices or None on failure
    (missing file or native runtime unavailable — callers fall back)."""
    lib = _load()
    if lib is None:
        return None
    handle = lib.rz_obj_parse(path.encode())
    if not handle:
        return None
    try:
        n = lib.rz_obj_num_triangles(handle)
        verts = np.empty((n, 9), dtype=np.float32)
        if n:
            lib.rz_obj_copy(handle, verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    finally:
        lib.rz_obj_free(handle)
    return verts.reshape(-1, 3, 3)
