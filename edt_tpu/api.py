"""NumPy-facing API — drop-in for the reference package ``edt``.

Reproduces the normalization and dispatch semantics of the reference Cython
layer (/root/reference/src/edt.pyx:204-310): list inputs, empty arrays,
contiguity, C/F order handling, dtype acceptance ((u)int8-64, float32/64,
bool), default anisotropy, the defunct ``order=`` kwarg, and the
``parallel`` kwarg (accepted for compatibility; on TPU parallelism is
automatic, so it is a no-op).

The actual compute runs on the default JAX device via the jitted
composition in edt_tpu.ops.compose; pathologically long axes fall back to
the exact host implementation.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from edt_tpu.ops import compose
from edt_tpu.utils import host_reference

# Axes longer than this use the host fallback. The Pallas kernels stream
# rows through VMEM with radius-pruned candidate windows, so long axes are
# fine on TPU; the ceiling is the per-grid-block VMEM footprint at
# block_rows=32 against the ~16 MB budget:
#   binary/walls path: f (n + 2*HALO) + out (n) f32 blocks
#     -> 32 * 4 * (2n + 256) B  => n ~ 60k
#   masked multi-label path: + seg_start/seg_end int32 blocks
#     -> 32 * 4 * (4n + 256) B  => n ~ 30k (28k with headroom)
# The jnp min-plus used elsewhere is O(n^2/row); on non-TPU backends the
# vectorized host banded path beats it well before that, so off-TPU the
# device ceiling is the jnp comfort zone (~256).
_DEVICE_MAX_AXIS_TPU_JNP = 8192
_DEVICE_MAX_AXIS_OFF_TPU = 128
_DEVICE_MAX_AXIS_PALLAS_BINARY = 60000
_DEVICE_MAX_AXIS_PALLAS_MASKED = 28000


def _device_max_axis(masked: bool = True) -> int:
    if _use_pallas():
        return (_DEVICE_MAX_AXIS_PALLAS_MASKED if masked
                else _DEVICE_MAX_AXIS_PALLAS_BINARY)
    if jax.default_backend() == "tpu":
        return _DEVICE_MAX_AXIS_TPU_JNP
    return _DEVICE_MAX_AXIS_OFF_TPU


def _shard_min_voxels() -> int:
    """Volumes at least this big auto-shard over all devices (when > 1).

    Default sits between the 512^3 single-chip sweet spot and the ~768^3
    single-chip HBM ceiling; override with EDT_TPU_SHARD_MIN_VOXELS.
    """
    import os

    return int(os.environ.get("EDT_TPU_SHARD_MIN_VOXELS", str(600 ** 3)))


def _use_pallas():
    return compose.use_pallas_default()


def _all_devices_addressable() -> bool:
    """True when auto-sharding from the NumPy API can span every device.

    In a multi-process JAX setting len(jax.devices()) counts global
    devices, but device_put to a NamedSharding spanning non-addressable
    devices raises — multi-process volumes go through
    edt_tpu.parallel.edtsq_sharded explicitly instead.
    """
    n = len(jax.devices())
    return n > 1 and n == jax.local_device_count()


def _order_of(data: np.ndarray) -> str:
    return "F" if data.flags.f_contiguous and not data.flags.c_contiguous else "C"


def _as_device_labels(data: np.ndarray) -> np.ndarray:
    """Map any supported dtype onto a JAX-transportable label array.

    Only label *equality* and *zeroness* matter downstream, so any
    equality-preserving, zero-preserving remap is legal (the reference
    similarly reinterprets signed as unsigned, edt.pyx:328-397).
    """
    dt = data.dtype
    if dt == np.bool_:
        return data.view(np.uint8)
    if dt in (np.uint8, np.uint16, np.uint32, np.float32):
        return data
    if dt == np.int8:
        return data.astype(np.uint8)  # bijective wrap, like reference edt.pyx:328-337
    if dt == np.int16:
        return data.astype(np.uint16)
    if dt == np.int32:
        return data.astype(np.uint32)
    if dt in (np.uint64, np.int64, np.float64):
        # 64-bit label spaces: try a lossless narrowing first; otherwise
        # factorize to compact int32 ids (equality- and zero-preserving).
        if dt == np.float64:
            as32 = data.astype(np.float32)
            if np.array_equal(as32.astype(np.float64), data):
                return as32
        else:
            info = np.iinfo(np.int32)
            lo = data.min() if data.size else 0
            hi = data.max() if data.size else 0
            if lo >= (0 if dt == np.uint64 else info.min) and hi <= info.max:
                # range fits in 2^32 values: mod-2^32 wrap is bijective and
                # preserves both equality and zeroness
                return data.astype(np.uint32)
        uniq, inv = np.unique(data, return_inverse=True)
        ids = np.arange(1, uniq.size + 1, dtype=np.uint32)
        zero_idx = np.searchsorted(uniq, 0)
        if zero_idx < uniq.size and uniq[zero_idx] == 0:
            ids[zero_idx] = 0
        return ids[inv].reshape(data.shape)
    raise TypeError(f"Unsupported data type: {dt}")


@functools.partial(
    jax.jit,
    static_argnames=("black_border", "use_pallas", "binary", "axis_order"),
)
def _edtsq_device(labels, anisotropy, black_border, use_pallas=False,
                  binary=False, axis_order=None):
    return compose.edtsq(
        labels, anisotropy, black_border,
        minplus_fn=compose.default_minplus_fn(use_pallas),
        parabolic_fn=compose.default_parabolic_fn(use_pallas),
        binary=binary,
        axis_order=axis_order,
    )


def _sorted_axis_order(anisotropy):
    """Static pass order: ascending pitch, default (nd-1 .. 0) on ties."""
    nd = anisotropy.size
    return tuple(sorted(range(nd), key=lambda a: (float(anisotropy[a]), -a)))


def _normalize_anisotropy(anisotropy, dims):
    if anisotropy is None:
        anisotropy = (1.0,) * dims
    anisotropy = np.asarray(anisotropy, dtype=np.float32).reshape(-1)
    if anisotropy.size == 1 and dims > 1:
        anisotropy = np.repeat(anisotropy, dims)
    if anisotropy.size != dims:
        raise ValueError(
            f"anisotropy must have {dims} components, got {anisotropy.size}"
        )
    return anisotropy


def edtsq(
    data,
    anisotropy=None,
    black_border=False,
    parallel=1,
    voxel_graph=None,
    order=None,
    *,
    binary=False,
):
    """Squared anisotropic multi-label EDT of a 1/2/3-D array.

    Mirrors reference edt.edtsq (edt.pyx:244-310). ``parallel`` and
    ``order`` are accepted for API compatibility; parallelism on TPU is
    automatic. ``binary=True`` forces the binary fast path (treats any
    nonzero voxel as one foreground label, like the reference C++
    edt::binary_edtsq, edt.hpp:924-951); bool inputs take it automatically.
    """
    if isinstance(data, list):
        data = np.array(data)
    data = np.asarray(data)

    dims = data.ndim
    if data.size == 0:
        return np.zeros(shape=data.shape, dtype=np.float32)

    arr_order = _order_of(data)
    if not data.flags.c_contiguous and not data.flags.f_contiguous:
        data = np.ascontiguousarray(data)

    if voxel_graph is not None and dims not in (2, 3):
        raise TypeError(
            "Voxel connectivity graph is only supported for 2D and 3D. "
            f"Got {dims}."
        )
    if dims not in (1, 2, 3):
        raise TypeError(
            f"Multi-Label EDT library only supports up to 3 dimensions got {dims}."
        )

    anisotropy = _normalize_anisotropy(anisotropy, dims)

    # binary reduction happens before dispatch so every branch (device,
    # host fallback) sees the same foreground mask — EXCEPT voxel_graph,
    # whose foreground test differs for floats (negative labels are
    # background there, reference edt_voxel_graph.hpp:145); the voxel-graph
    # path applies its own reduction so the two always agree
    take_binary = bool(data.dtype == np.bool_) or binary
    if binary and data.dtype != np.bool_ and voxel_graph is None:
        data = data != 0

    from edt_tpu.utils.profiling import counters

    counters.transforms += 1
    counters.voxels += int(data.size)

    if voxel_graph is not None:
        from edt_tpu.ops import voxel_graph as vg

        counters.voxel_graph_calls += 1
        result = vg.edtsq_voxel_graph(
            data, voxel_graph, anisotropy, bool(black_border), arr_order
        )
    elif max(data.shape) > _device_max_axis(masked=not take_binary):
        counters.host_fallbacks += 1
        result = host_reference.edtsq_host(data, anisotropy, bool(black_border))
    else:
        # bool volumes take the binary fast path, like the reference's
        # bool* overload (edt.hpp:580-587, ~1.3-1.6x there, ~1.8x here);
        # binary=True reduced the input to its foreground mask above
        # (reference binary_edt declares multi-label input unsupported,
        # edt.hpp:5-9 — we define it as nonzero == foreground).
        labels = _as_device_labels(data)
        if (labels.ndim == 3 and labels.size >= _shard_min_voxels()
                and _all_devices_addressable()):
            # volumes beyond the single-chip ceiling shard over all devices
            # (slab decomposition + all_to_all axis rotation); any shape is
            # accepted — reference parity with edt.pyx:300-310, which is
            # bounded only by RAM
            from edt_tpu.parallel import sharded

            counters.sharded_dispatches += 1
            out = sharded.edtsq_sharded_auto(
                jnp.asarray(labels), anisotropy, bool(black_border),
                binary=take_binary,
            )
        else:
            out = _edtsq_device(
                jnp.asarray(labels),
                jnp.asarray(anisotropy),
                bool(black_border),
                use_pallas=_use_pallas(),
                binary=take_binary,
                axis_order=_sorted_axis_order(anisotropy),
            )
        # writable host copy; order="C" matters: this environment's device
        # transport can hand back a non-contiguous ndarray view, and
        # downstream RLE extraction (each/runs) needs contiguity to use the
        # native kit instead of per-run Python slicing
        result = np.array(out, order="C")

    if arr_order == "F":
        result = np.asfortranarray(result)
    return result


def edt(
    data,
    anisotropy=None,
    black_border=False,
    parallel=1,
    voxel_graph=None,
    order=None,
):
    """Anisotropic multi-label EDT (reference edt.pyx:204-242)."""
    dt = edtsq(data, anisotropy, black_border, parallel, voxel_graph)
    return np.sqrt(dt, dt)


def sdf(data, anisotropy=None, black_border=False, parallel=1,
        voxel_graph=None, order=None):
    """Signed distance field: edt(x) - edt(x == 0) (reference edt.pyx:120-158)."""
    def fn(labels):
        return edt(
            labels,
            anisotropy=anisotropy,
            black_border=black_border,
            parallel=parallel,
            voxel_graph=voxel_graph,
        )

    dt = fn(data)
    dt -= fn(np.asarray(data) == 0)
    return dt


def sdfsq(data, anisotropy=None, black_border=False, parallel=1,
          voxel_graph=None, order=None):
    """Squared signed distance field (reference edt.pyx:160-202)."""
    def fn(labels):
        return edtsq(
            labels,
            anisotropy=anisotropy,
            black_border=black_border,
            parallel=parallel,
            voxel_graph=voxel_graph,
        )

    return fn(data) - fn(np.asarray(data) == 0)


def binary_edtsq(data, anisotropy=None, black_border=False, parallel=1,
                 order=None):
    """Binary fast-path squared EDT: any nonzero voxel is foreground.

    Parity with the reference's C++-only edt::binary_edtsq
    (edt.hpp:924-951); the reference Python package exposes this path only
    implicitly via bool inputs.
    """
    return edtsq(data, anisotropy, black_border, parallel, binary=True)


def binary_edt(data, anisotropy=None, black_border=False, parallel=1,
               order=None):
    """Binary fast-path EDT (reference edt::binary_edt, edt.hpp:846-882)."""
    dt = binary_edtsq(data, anisotropy, black_border, parallel)
    return np.sqrt(dt, dt)


# --- fixed-dimension conveniences (reference edt.pyx:312-734) ---

def edt1dsq(data, anisotropy=1.0, black_border=False):
    return edtsq(np.asarray(data), anisotropy, black_border)


def edt1d(data, anisotropy=1.0, black_border=False):
    result = edt1dsq(data, anisotropy, black_border)
    return np.sqrt(result, result)


def edt2dsq(data, anisotropy=(1.0, 1.0), black_border=False, parallel=1,
            voxel_graph=None):
    return edtsq(np.asarray(data), anisotropy, black_border, parallel, voxel_graph)


def edt2d(data, anisotropy=(1.0, 1.0), black_border=False, parallel=1,
          voxel_graph=None):
    result = edt2dsq(data, anisotropy, black_border, parallel, voxel_graph)
    return np.sqrt(result, result)


def edt3dsq(data, anisotropy=(1.0, 1.0, 1.0), black_border=False, parallel=1,
            voxel_graph=None):
    return edtsq(np.asarray(data), anisotropy, black_border, parallel, voxel_graph)


def edt3d(data, anisotropy=(1.0, 1.0, 1.0), black_border=False, parallel=1,
          voxel_graph=None):
    result = edt3dsq(data, anisotropy, black_border, parallel, voxel_graph)
    return np.sqrt(result, result)
