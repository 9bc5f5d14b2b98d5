"""ctypes bindings + on-demand build of the native host runtime.

Compiles raytpu/native/src/native.cpp with g++ -O3 into a cached shared
library on first use.  Every entry point has a pure-Python fallback elsewhere
in the package, so the framework works (slower) without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_SRC = Path(__file__).resolve().parent / "src" / "native.cpp"
_BUILD_DIR = Path(__file__).resolve().parent / "_build"
_LIB_PATH = _BUILD_DIR / "libraytpu_native.so"

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as e:
        import sys

        print(f"raytpu.native: build failed ({e}); using Python fallbacks", file=sys.stderr)
        return False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.rt_monotonic.restype = ctypes.c_double
        lib.rt_parse_obj.restype = ctypes.c_int
        lib.rt_parse_obj.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)), ctypes.POINTER(ctypes.c_int),
        ]
        lib.rt_morton_order.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rt_build_bvh.restype = ctypes.c_int
        lib.rt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.rt_bvh_closest_hit.restype = ctypes.c_int
        lib.rt_bvh_closest_hit.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rt_write_bmp.restype = ctypes.c_int
        lib.rt_write_bmp.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def monotonic() -> float:
    return _load().rt_monotonic()


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def parse_obj(path: str):
    """Native OBJ parse -> (positions (V,3) f32, normals (F,3) f32, indices (3F,) i32)."""
    lib = _load()
    pos_p = ctypes.POINTER(ctypes.c_float)()
    nrm_p = ctypes.POINTER(ctypes.c_float)()
    idx_p = ctypes.POINTER(ctypes.c_int32)()
    n_pos = ctypes.c_int()
    n_faces = ctypes.c_int()
    rc = lib.rt_parse_obj(path.encode(), ctypes.byref(pos_p), ctypes.byref(n_pos),
                          ctypes.byref(nrm_p), ctypes.byref(idx_p), ctypes.byref(n_faces))
    if rc != 0:
        raise FileNotFoundError(path)
    V, F = n_pos.value, n_faces.value
    positions = np.ctypeslib.as_array(pos_p, (V, 3)).copy()
    normals = np.ctypeslib.as_array(nrm_p, (F, 3)).copy()
    indices = np.ctypeslib.as_array(idx_p, (F * 3,)).copy()
    return positions, normals, indices


def morton_order(tri_verts: np.ndarray) -> np.ndarray:
    """Spatial (Morton) permutation of a (T, 3, 3) / (T, 9) triangle soup."""
    tv = np.ascontiguousarray(tri_verts.reshape(-1, 9), np.float32)
    T = tv.shape[0]
    perm = np.empty(T, np.int32)
    _load().rt_morton_order(_fptr(tv), T, _iptr(perm))
    return perm


def build_bvh(tri_verts: np.ndarray, leaf_size: int = 8, bins: int = 8):
    """Binned-SAH BVH (the reference builder's algorithm class,
    reference: source/DataTypes.h:294-483, with triangles as first-class prims).

    Returns (node_bounds (N,6) f32, node_meta (N,3) i32 [first,count,left],
    prim_order (T,) i32)."""
    tv = np.ascontiguousarray(tri_verts.reshape(-1, 9), np.float32)
    T = tv.shape[0]
    nb = np.empty((2 * max(T, 1), 6), np.float32)
    nm = np.empty((2 * max(T, 1), 3), np.int32)
    order = np.empty(T, np.int32)
    n = _load().rt_build_bvh(_fptr(tv), T, leaf_size, bins, _fptr(nb), _iptr(nm), _iptr(order))
    if n < 0:
        raise RuntimeError("BVH build failed")
    return nb[:n].copy(), nm[:n].copy(), order


def bvh_closest_hit(tri_verts, node_bounds, node_meta, prim_order, ro, rd, tmin=1e-4):
    """CPU BVH traversal (validation oracle).  Returns (tri_id or -1, t)."""
    tv = np.ascontiguousarray(tri_verts.reshape(-1, 9), np.float32)
    nb = np.ascontiguousarray(node_bounds, np.float32)
    nm = np.ascontiguousarray(node_meta, np.int32)
    po = np.ascontiguousarray(prim_order, np.int32)
    ro = np.ascontiguousarray(ro, np.float32)
    rd = np.ascontiguousarray(rd, np.float32)
    t_out = ctypes.c_float()
    tid = _load().rt_bvh_closest_hit(
        _fptr(tv), _fptr(nb), _iptr(nm), _iptr(po), nm.shape[0],
        _fptr(ro), _fptr(rd), tmin, ctypes.byref(t_out),
    )
    return tid, t_out.value


def write_bmp(path: str, image: np.ndarray) -> None:
    img = np.ascontiguousarray(image, np.uint8)
    h, w, _ = img.shape
    rc = _load().rt_write_bmp(path.encode(), w, h, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if rc != 0:
        raise OSError(f"cannot write {path}")
