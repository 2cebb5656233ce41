"""ctypes loader + on-demand g++ compilation for native components."""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

from lucille_tpu.base.log import LOG_INFO, LOG_WARN, log, log_once

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "bvh_builder.cpp"

_lib = None
_lib_tried = False


def _cache_dir() -> Path:
    d = Path(
        os.environ.get("LUCILLE_NATIVE_CACHE", tempfile.gettempdir())
    ) / "lucille_tpu_native"
    d.mkdir(parents=True, exist_ok=True)
    return d


def get_bvh_lib():
    """Compile (once) and load the native BVH builder; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not _SRC.exists():
        return None
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = _cache_dir() / f"libbvh_{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(so), str(_SRC),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            log(LOG_INFO, "compiled native BVH builder -> %s", so)
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired) as e:
            log_once(LOG_WARN, "native BVH builder unavailable (%s); using NumPy",
                     type(e).__name__)
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        return None
    lib.lucille_build_bvh.restype = ctypes.c_int
    lib.lucille_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # v0
        ctypes.POINTER(ctypes.c_float),  # v1
        ctypes.POINTER(ctypes.c_float),  # v2
        ctypes.c_int64,  # n_tris
        ctypes.c_int,  # leaf_size
        ctypes.POINTER(ctypes.c_float),  # bbmin
        ctypes.POINTER(ctypes.c_float),  # bbmax
        ctypes.POINTER(ctypes.c_int32),  # skip
        ctypes.POINTER(ctypes.c_int32),  # first
        ctypes.POINTER(ctypes.c_int32),  # count
        ctypes.POINTER(ctypes.c_int64),  # order
    ]
    _lib = lib
    return _lib


def native_build_bvh(v0, v1, v2, leaf_size: int = 8):
    """Build a BVH with the C++ builder; returns the same tuple layout as
    accel.bvh.BVH or None when the native path is unavailable."""
    lib = get_bvh_lib()
    if lib is None:
        return None
    n = len(v0)
    v0 = np.ascontiguousarray(v0, dtype=np.float32)
    v1 = np.ascontiguousarray(v1, dtype=np.float32)
    v2 = np.ascontiguousarray(v2, dtype=np.float32)
    max_nodes = max(2 * n, 1)
    bbmin = np.empty((max_nodes, 3), dtype=np.float32)
    bbmax = np.empty((max_nodes, 3), dtype=np.float32)
    skip = np.empty(max_nodes, dtype=np.int32)
    first = np.empty(max_nodes, dtype=np.int32)
    count = np.empty(max_nodes, dtype=np.int32)
    order = np.empty(n, dtype=np.int64)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    i32ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    i64ptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    m = lib.lucille_build_bvh(
        fptr(v0), fptr(v1), fptr(v2),
        ctypes.c_int64(n), ctypes.c_int(leaf_size),
        fptr(bbmin), fptr(bbmax), i32ptr(skip), i32ptr(first),
        i32ptr(count), i64ptr(order),
    )
    if m <= 0:
        return None
    return (
        bbmin[:m].copy(),
        bbmax[:m].copy(),
        skip[:m].copy(),
        first[:m].copy(),
        count[:m].copy(),
        order,
    )
