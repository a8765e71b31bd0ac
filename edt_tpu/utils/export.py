"""AOT export for serving: serialize jitted transforms to portable
StableHLO artifacts (jax.export) and call them back without retracing.

The reference is a pip-installed CPU library; "deployment" there means
installing Python + Cython. A TPU serving stack instead ships compiled
artifacts: export once (fixed shapes/dtypes — the same staticness XLA
compilation requires anyway), store the bytes, and any process with a
compatible backend runs them via ``load()`` with zero Python tracing or
edt_tpu import on the serving side. Pallas kernels export as Mosaic
custom calls inside the StableHLO payload.

    data = serialize_transform((512, 512, 512), np.uint32,
                               anisotropy=(6, 6, 30), black_border=True)
    run = load(data)            # serving side
    dt = run(labels)

Exports target the platform(s) of the exporting process by default; pass
``platforms=("tpu",)`` to cross-export when the lowering supports it.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as _jx


def export_fn(fn, *arg_specs, platforms=None):
    """Export any jittable fn for the given ShapeDtypeStruct specs."""
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return _jx.export(jax.jit(fn), **kw)(*arg_specs)


def export_transform(shape, dtype=np.uint32, anisotropy=None,
                     black_border=False, binary=False, sqrt=False,
                     platforms=None):
    """Exported EDT of a fixed-shape volume: labels -> (squared) distances.

    binary: use the unmasked fast path (callers promise two-valued
    labels); sqrt: return euclidean instead of squared distances.
    Returns a jax.export.Exported — ``.serialize()`` for bytes."""
    from edt_tpu.ops import compose

    nd = len(shape)
    anis = jnp.asarray(
        anisotropy if anisotropy is not None else (1.0,) * nd, jnp.float32)

    def fn(labels):
        d = compose.edtsq(labels, anis, bool(black_border),
                          binary=bool(binary))
        return jnp.sqrt(d) if sqrt else d

    return export_fn(fn, jax.ShapeDtypeStruct(tuple(shape), dtype),
                     platforms=platforms)


def serialize_transform(shape, dtype=np.uint32, **kw) -> bytes:
    return export_transform(shape, dtype, **kw).serialize()


def load(data):
    """bytes (or an Exported) -> callable running the compiled artifact."""
    exp = _jx.deserialize(data) if isinstance(data, (bytes, bytearray)) \
        else data
    return exp.call
