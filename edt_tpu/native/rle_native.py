"""ctypes bindings for the native RLE kit (_edt_rle.so).

API mirrors the semantics of the reference C++ helpers
(/root/reference/src/edt_voxel_graph.hpp:238-310); see rle.cpp.
Importing this module raises if the shared library has not been built
(edt_tpu.rle treats that as "use the NumPy fallback").
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_edt_rle.so")

if not os.path.exists(_SO):
    raise ImportError(
        "native RLE kit not built; run `python -m edt_tpu.native.build`"
    )

_lib = ctypes.CDLL(_SO)

_I64P = ctypes.POINTER(ctypes.c_int64)

for _suffix in ("u8", "u16", "u32", "u64", "f32", "f64"):
    fn = getattr(_lib, f"edt_run_starts_{_suffix}")
    fn.restype = ctypes.c_int64
    fn.argtypes = [ctypes.c_void_p, ctypes.c_int64, _I64P]

_lib.edt_fill_runs.restype = ctypes.c_int
_lib.edt_fill_runs.argtypes = [
    ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    _I64P, _I64P, ctypes.c_int64,
]
_lib.edt_copy_runs.restype = ctypes.c_int
_lib.edt_copy_runs.argtypes = [
    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
    _I64P, _I64P, ctypes.c_int64,
]

_STARTS_FN = {
    np.dtype(np.uint8): _lib.edt_run_starts_u8,
    np.dtype(np.int8): _lib.edt_run_starts_u8,
    np.dtype(np.bool_): _lib.edt_run_starts_u8,
    np.dtype(np.uint16): _lib.edt_run_starts_u16,
    np.dtype(np.int16): _lib.edt_run_starts_u16,
    np.dtype(np.uint32): _lib.edt_run_starts_u32,
    np.dtype(np.int32): _lib.edt_run_starts_u32,
    np.dtype(np.uint64): _lib.edt_run_starts_u64,
    np.dtype(np.int64): _lib.edt_run_starts_u64,
    np.dtype(np.float32): _lib.edt_run_starts_f32,
    np.dtype(np.float64): _lib.edt_run_starts_f64,
}

SUPPORTED_DTYPES = set(_STARTS_FN.keys())


def _ptr(a, typ=ctypes.c_void_p):
    return a.ctypes.data_as(typ)


def extract_runs(flat: np.ndarray):
    """label -> list[(start, end)] over a 1-D contiguous array."""
    flat = np.ascontiguousarray(flat)
    n = flat.size
    out: dict = {}
    if n == 0:
        return out
    starts = np.empty(n, dtype=np.int64)
    fn = _STARTS_FN[flat.dtype]
    count = fn(_ptr(flat), n, _ptr(starts, _I64P))
    starts = starts[:count]
    ends = np.concatenate([starts[1:], [n]])
    keys = flat[starts]
    from edt_tpu.rle import _group_runs

    return _group_runs(keys, starts, ends)


def _runs_arrays(runs_):
    starts = np.asarray([r[0] for r in runs_], dtype=np.int64)
    ends = np.asarray([r[1] for r in runs_], dtype=np.int64)
    return starts, ends


def set_run_voxels(value, runs_, flat: np.ndarray):
    starts, ends = _runs_arrays(runs_)
    val = np.asarray(value, dtype=flat.dtype)
    rc = _lib.edt_fill_runs(
        _ptr(flat), flat.size, flat.itemsize, _ptr(val),
        _ptr(starts, _I64P), _ptr(ends, _I64P), starts.size,
    )
    if rc != 0:
        raise RuntimeError("Invalid run.")


def transfer_run_voxels(runs_, src: np.ndarray, dest: np.ndarray):
    starts, ends = _runs_arrays(runs_)
    rc = _lib.edt_copy_runs(
        _ptr(src), _ptr(dest), dest.size, dest.itemsize,
        _ptr(starts, _I64P), _ptr(ends, _I64P), starts.size,
    )
    if rc != 0:
        raise RuntimeError("Invalid run.")
