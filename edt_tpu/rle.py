"""Run-length label extraction kit: runs / draw / erase / transfer / each.

API- and semantics-compatible with the reference
(/root/reference/src/edt.pyx:847-994 and src/edt_voxel_graph.hpp:238-310).
Runs are computed over the *memory-order* flattening of the array (the
reference flattens with stride tricks, edt.pyx:851-879), as (start, end)
half-open intervals.

Two backends: a vectorized NumPy implementation (always available) and a
native C++ kernel (edt_tpu.native) used automatically when built — the
reference's equivalent components are C++ for the same reason (serial
O(N) bookkeeping belongs on the host, not the TPU).
"""

from __future__ import annotations

import operator
from functools import reduce

import numpy as np

try:  # optional native backend
    from edt_tpu.native import rle_native as _native
except Exception:  # pragma: no cover - absence is a supported configuration
    _native = None


def reshape(arr, shape, order=None):
    """View ``arr`` with a new shape without copying when contiguous.

    Mirrors reference edt.pyx:851-879 (stride-trick reshape).
    """
    if order is None:
        if arr.flags["F_CONTIGUOUS"]:
            order = "F"
        elif arr.flags["C_CONTIGUOUS"]:
            order = "C"
        else:
            return arr.reshape(shape)

    nbytes = np.dtype(arr.dtype).itemsize

    if order == "C":
        strides = [
            reduce(operator.mul, shape[i:]) * nbytes for i in range(1, len(shape))
        ]
        strides += [nbytes]
    else:
        strides = [
            reduce(operator.mul, shape[:i]) * nbytes for i in range(1, len(shape))
        ]
        strides = [nbytes] + strides
    return np.lib.stride_tricks.as_strided(arr, shape=shape, strides=strides)


def _flat_memory_order(arr):
    return reshape(arr, (arr.size,))


def runs(labels):
    """Map label -> list of (start, end) runs over the flattened volume.

    Mirrors reference extract_runs (edt_voxel_graph.hpp:238-268) via
    edt.pyx:882-894.
    """
    flat = _flat_memory_order(np.asarray(labels))
    if _use_native(flat):
        return _native.extract_runs(flat)
    return _runs_numpy(flat)


def _use_native(flat, *more):
    if _native is None:
        return False
    arrs = (flat,) + more
    return all(
        a.dtype in _native.SUPPORTED_DTYPES and a.flags.c_contiguous
        for a in arrs
    )


def _runs_numpy(flat):
    n = flat.size
    if n == 0:
        return {}
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [n]])
    keys = flat[starts]
    return _group_runs(keys, starts, ends)


def _group_runs(keys, starts, ends):
    """Group (start, end) pairs by key, keys ascending (like the reference's
    std::map, edt_voxel_graph.hpp:239), preserving in-key order."""
    order = np.argsort(keys, kind="stable")
    ks = keys[order]
    ss = starts[order].tolist()
    es = ends[order].tolist()
    bounds = np.flatnonzero(ks[1:] != ks[:-1]) + 1
    group_starts = np.concatenate([[0], bounds]).tolist()
    group_ends = np.concatenate([bounds, [ks.size]]).tolist()
    uniq = ks[np.concatenate([[0], bounds])].tolist()
    pairs = list(zip(ss, es))
    return {k: pairs[a:b] for k, a, b in zip(uniq, group_starts, group_ends)}


def _check_runs(rns, voxels):
    for s, e in rns:
        if s < 0 or e > voxels or e < 0 or s >= e:
            raise RuntimeError("Invalid run.")


def draw(label, runs_, image):
    """Write ``label`` into ``image`` under ``runs_``.

    Mirrors reference set_run_voxels (edt_voxel_graph.hpp:270-289) via
    edt.pyx:897-915.
    """
    flat = _flat_memory_order(np.asarray(image))
    _check_runs(runs_, flat.size)
    if runs_ and _use_native(flat):
        _native.set_run_voxels(label, runs_, flat)
        return image
    for s, e in runs_:
        flat[s:e] = label
    return image


def erase(runs_, image):
    """Zero ``image`` under ``runs_`` (reference edt.pyx:938-948)."""
    return draw(0, runs_, image)


def transfer(runs_, src, dest):
    """Copy ``src`` values to ``dest`` under ``runs_``.

    Mirrors reference transfer_run_voxels (edt_voxel_graph.hpp:291-310) via
    edt.pyx:917-936.
    """
    src_flat = _flat_memory_order(np.asarray(src))
    dest_flat = _flat_memory_order(np.asarray(dest))
    assert src_flat.size == dest_flat.size
    _check_runs(runs_, dest_flat.size)
    if runs_ and src_flat.dtype == dest_flat.dtype and _use_native(
        src_flat, dest_flat
    ):
        _native.transfer_run_voxels(runs_, src_flat, dest_flat)
        return dest
    for s, e in runs_:
        dest_flat[s:e] = src_flat[s:e]
    return dest


def each(labels, dt, in_place=False):
    """Iterator of (label, image) where image holds only that label's dt.

    Mirrors reference edt.each (edt.pyx:950-994), including the
    read-only-yield semantics of in_place=True.
    """
    all_runs = runs(labels)
    order = "F" if labels.flags.f_contiguous else "C"
    dtype = np.float32

    class ImageIterator:
        def __len__(self):
            return len(all_runs) - int(0 in all_runs)

        def __iter__(self):
            for key, rns in all_runs.items():
                if key == 0:
                    continue
                img = np.zeros(labels.shape, dtype=dtype, order=order)
                transfer(rns, dt, img)
                yield (key, img)

    class InPlaceImageIterator(ImageIterator):
        def __iter__(self):
            img = np.zeros(labels.shape, dtype=dtype, order=order)
            for key, rns in all_runs.items():
                if key == 0:
                    continue
                transfer(rns, dt, img)
                img.setflags(write=0)
                yield (key, img)
                img.setflags(write=1)
                erase(rns, img)

    if in_place:
        return InPlaceImageIterator()
    return ImageIterator()
