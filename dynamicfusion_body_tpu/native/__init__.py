"""ctypes bindings for the native IO runtime (dfio.cc).

Builds the shared library with g++ on first use; the binary is cached
beside the source, keyed on a hash of the source (never committed, never
trusted stale). Every entry point has a pure-Python fallback in io/, so
the package works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dfio.cc")
_LIB = os.path.join(_HERE, "libdfio.so")
_STAMP = _LIB + ".srchash"

_lib = None


def _src_hash():
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _build(srchash):
    cmd = [
        "g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    with open(_STAMP, "w") as f:
        f.write(srchash)


def get_lib():
    """Load (building if needed) the native library; None on failure."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        srchash = _src_hash()
        stamp = None
        if os.path.exists(_STAMP):
            with open(_STAMP) as f:
                stamp = f.read().strip()
        if (not os.path.exists(_LIB)) or stamp != srchash:
            _build(srchash)
        lib = ctypes.CDLL(_LIB)
    except Exception:
        return None

    lib.dfio_write_obj.restype = ctypes.c_int
    lib.dfio_write_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.dfio_read_obj_counts.restype = ctypes.c_int
    lib.dfio_read_obj_counts.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.dfio_read_obj.restype = ctypes.c_int
    lib.dfio_read_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ]
    lib.dfio_read_dist_header.restype = ctypes.c_int
    lib.dfio_read_dist_header.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
    ]
    lib.dfio_read_dist.restype = ctypes.c_int
    lib.dfio_read_dist.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def write_obj(path, verts, faces, normals=None, ind=None):
    """Native OBJ writer; returns False if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    verts = np.ascontiguousarray(verts, dtype=np.float32)
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    nptr = None
    if normals is not None:
        normals = np.ascontiguousarray(normals, dtype=np.float32)
        nptr = _fptr(normals)
    iptr = None
    if ind is not None:
        ind = np.ascontiguousarray(ind, dtype=np.float64)
        iptr = ind.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    rc = lib.dfio_write_obj(
        path.encode(), _fptr(verts), len(verts), nptr, _iptr(faces),
        len(faces), iptr,
    )
    return rc == 0


def read_obj(path):
    """Native OBJ reader → (verts f32 (V,3), faces i32 (F,3)) or None."""
    lib = get_lib()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    if lib.dfio_read_obj_counts(path.encode(), ctypes.byref(nv), ctypes.byref(nf)):
        return None
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((nf.value, 3), np.int32)
    if lib.dfio_read_obj(path.encode(), _fptr(verts), nv.value, _iptr(faces), nf.value):
        return None
    return verts, faces


def read_dist(path):
    """Native .dist loader → (b_min, b_max, volume x-major) or None."""
    lib = get_lib()
    if lib is None:
        return None
    res = (ctypes.c_int32 * 3)()
    bmin = (ctypes.c_double * 3)()
    bmax = (ctypes.c_double * 3)()
    if lib.dfio_read_dist_header(path.encode(), res, bmin, bmax):
        return None
    rx, ry, rz = res[0], res[1], res[2]
    vol = np.empty((rx + 1, ry + 1, rz + 1), np.float32)
    if lib.dfio_read_dist(path.encode(), _fptr(vol), rx, ry, rz):
        return None
    return np.array(bmin), np.array(bmax), vol
