"""ctypes bindings for the native meshops library, with numpy fallbacks.

Build happens lazily on first import (g++ -O3 -shared, cached next to the
source); if the toolchain is unavailable every entry point falls back to
the pure-numpy implementations in :mod:`graph_physics_tpu.core.mesh` /
:mod:`graph_physics_tpu.dataset.partition`, so the framework never hard-
depends on the compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "meshops.cc")
_LIB = os.path.join(_HERE, "libmeshops.so")

_lib = None


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-pthread", "-shared", "-fPIC",
             _SRC, "-o", _LIB],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return _LIB
    except Exception:
        return None


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    path = _build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.faces_to_edges.restype = ctypes.c_int64
    lib.faces_to_edges.argtypes = [
        i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int64, i32p, i32p, ctypes.c_int64,
    ]
    lib.k_hop.restype = ctypes.c_int64
    lib.k_hop.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, i32p, i32p, ctypes.c_int64,
    ]
    lib.radius_pairs.restype = ctypes.c_int64
    lib.radius_pairs.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_float, i32p, i32p, ctypes.c_int64,
    ]
    lib.rcb_partition.restype = None
    lib.rcb_partition.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, i32p,
    ]
    try:  # added round 5 — tolerate stale libs
        lib.radius_cross_pairs.restype = ctypes.c_int64
        lib.radius_cross_pairs.argtypes = [
            f32p, ctypes.c_int64, f32p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_float, i32p, i32p, ctypes.c_int64,
        ]
    except AttributeError:
        pass
    try:  # added after the first release of the .so — tolerate stale libs
        lib.pack_rows.restype = None
        lib.pack_rows.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.repeat_rows.restype = None
        lib.repeat_rows.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.pack_block.restype = None
        lib.pack_block.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32,
        ]
    except AttributeError:
        pass
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


# ----------------------------------------------------------------------
# wrappers (numpy in / numpy out), with retry-on-budget semantics
# ----------------------------------------------------------------------

def faces_to_edges(faces: np.ndarray, num_nodes: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    faces = np.ascontiguousarray(faces, dtype=np.int32)
    nv = faces.shape[1]
    budget = faces.shape[0] * (6 if nv == 3 else 12) + 8
    s = np.empty(budget, np.int32)
    r = np.empty(budget, np.int32)
    e = lib.faces_to_edges(faces, faces.shape[0], nv, num_nodes, s, r, budget)
    if e < 0:
        return None
    return np.stack([s[:e], r[:e]])


def k_hop(edge_index: np.ndarray, num_nodes: int, k: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    s = np.ascontiguousarray(edge_index[0], np.int32)
    r = np.ascontiguousarray(edge_index[1], np.int32)
    budget = max(edge_index.shape[1] * (4 ** min(k, 4)), 1024)
    for _ in range(4):
        os_ = np.empty(budget, np.int32)
        or_ = np.empty(budget, np.int32)
        e = lib.k_hop(s, r, edge_index.shape[1], num_nodes, k, os_, or_, budget)
        if e >= 0:
            return np.stack([os_[:e], or_[:e]])
        budget = -e
    return None


def radius_pairs(pos: np.ndarray, radius: float) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    n, dim = pos.shape
    budget = max(n * 32, 1024)
    for _ in range(4):
        a = np.empty(budget, np.int32)
        b = np.empty(budget, np.int32)
        c = lib.radius_pairs(pos, n, dim, radius, a, b, budget)
        if c >= 0:
            return np.stack([a[:c], b[:c]], axis=1)
        budget = -c
    return None


def radius_cross_pairs(
    pos_a: np.ndarray, pos_b: np.ndarray, radius: float
) -> Optional[np.ndarray]:
    """All (i, j) with |pos_a[i] - pos_b[j]| <= radius, as an [M, 2]
    array of (A-local, B-local) indices. None when the native lib is
    unavailable (callers fall back to the full-mesh search)."""
    lib = load()
    if lib is None or not hasattr(lib, "radius_cross_pairs"):
        return None
    pos_a = np.ascontiguousarray(pos_a, np.float32)
    pos_b = np.ascontiguousarray(pos_b, np.float32)
    na, dim = pos_a.shape
    nb = pos_b.shape[0]
    budget = max((na + nb) * 16, 1024)
    for _ in range(4):
        a = np.empty(budget, np.int32)
        b = np.empty(budget, np.int32)
        c = lib.radius_cross_pairs(pos_a, na, pos_b, nb, dim, radius, a, b, budget)
        if c >= 0:
            return np.stack([a[:c], b[:c]], axis=1)
        budget = -c
    return None


def rcb_labels(pos: np.ndarray, num_parts: int) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    pos = np.ascontiguousarray(pos, np.float32)
    labels = np.empty(pos.shape[0], np.int32)
    lib.rcb_partition(pos, pos.shape[0], pos.shape[1], num_parts, labels)
    return labels


# number of copy threads for the packed-batch assembly: memory-bandwidth
# bound, so a handful of threads saturates; leave cores for the
# FrameBuilder worker pool that overlaps with this call (GIL released)
_PACK_THREADS = max(1, min(8, (os.cpu_count() or 2) - 1))
#: below this output size threading overhead beats the copy win
_PACK_MIN_BYTES = 1 << 20


def pack_rows(vals, out=None) -> Optional[np.ndarray]:
    """[B x (N, F...)] frame leaves -> one [N, B, F...] packed array.

    Threaded native interleave (training/packed.pack_frames hot path);
    returns None when the native lib is unavailable or the inputs don't
    qualify (callers fall back to the numpy stack+transpose path). All
    ``vals`` must share shape and dtype; non-contiguous inputs are
    compacted first (same cost the numpy path would pay).
    """
    lib = load()
    if lib is None or not hasattr(lib, "pack_rows"):
        return None
    v0 = vals[0]
    if any(v.shape != v0.shape or v.dtype != v0.dtype for v in vals[1:]):
        return None
    vals = [np.ascontiguousarray(v) for v in vals]
    num_b = len(vals)
    num_n = v0.shape[0]
    row_bytes = int(np.prod(v0.shape[1:], dtype=np.int64)) * v0.itemsize
    if out is None:
        out = np.empty((num_n, num_b) + v0.shape[1:], v0.dtype)
    ptrs = (ctypes.c_void_p * num_b)(
        *[v.ctypes.data for v in vals]
    )
    nt = _PACK_THREADS if out.nbytes >= _PACK_MIN_BYTES else 1
    lib.pack_rows(ptrs, num_b, num_n, row_bytes, out.ctypes.data, nt)
    return out


def repeat_rows(val: np.ndarray, num_b: int, out=None) -> Optional[np.ndarray]:
    """One shared (N, F...) leaf -> [N, B, F...] (B identical copies).

    Only worth it for the THREADED copy: single-threaded, np.repeat's
    flat memcpy loop is as fast (measured) — return None there so
    callers keep the numpy path.
    """
    lib = load()
    if lib is None or not hasattr(lib, "repeat_rows") or _PACK_THREADS <= 1:
        return None
    val = np.ascontiguousarray(val)
    num_n = val.shape[0]
    row_bytes = int(np.prod(val.shape[1:], dtype=np.int64)) * val.itemsize
    if out is None:
        out = np.empty((num_n, num_b) + val.shape[1:], val.dtype)
    nt = _PACK_THREADS if out.nbytes >= _PACK_MIN_BYTES else 1
    lib.repeat_rows(val.ctypes.data, num_b, num_n, row_bytes,
                    out.ctypes.data, nt)
    return out


def pack_block(src: np.ndarray, out: np.ndarray, col: int) -> bool:
    """Interleave one contiguous [B, N, w] block into
    ``out[:N, :, col:col+w]`` of the [N, B, F] batch (the vectorized
    loader lane's per-field write). Returns False when the native lib is
    unavailable or dtypes/layout don't qualify — callers fall back to the
    numpy transposed assignment.
    """
    lib = load()
    if lib is None or not hasattr(lib, "pack_block"):
        return False
    if (
        src.dtype != out.dtype
        or not src.flags["C_CONTIGUOUS"]
        or not out.flags["C_CONTIGUOUS"]
        or src.ndim != 3
        or out.ndim != 3
    ):
        return False
    num_b, num_n, w = src.shape
    if out.shape[1] != num_b or out.shape[0] < num_n:
        return False
    it = src.itemsize
    row_bytes = w * it
    nt = _PACK_THREADS if src.nbytes >= _PACK_MIN_BYTES else 1
    lib.pack_block(
        src.ctypes.data, num_b, num_n, row_bytes,
        num_n * row_bytes,          # src frame (b) stride
        row_bytes,                  # src node (n) stride
        out.ctypes.data + col * it, # dst base at the column window
        out.strides[0],             # dst node stride
        out.strides[1],             # dst frame stride
        nt,
    )
    return True
