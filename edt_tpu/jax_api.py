"""Device-native API: jittable, jnp-in/jnp-out, composable with jax
transforms (jit/grad/vmap/shard_map).

    import edt_tpu.jax_api as edtj
    d2 = edtj.edtsq(labels, (1.0, 1.0, 1.0), black_border=True)

For the NumPy drop-in API use the top-level edt_tpu module instead.
"""

from edt_tpu.ops.compose import (
    edt,
    edtsq,
    sdf,
    sdfsq,
    default_minplus_fn,
    default_parabolic_fn,
)
from edt_tpu.ops.voxel_graph import edtsq_voxel_graph_jnp
from edt_tpu.models.soft import (
    edtsq_from_heights,
    multilabel_edtsq,
    wall_counts_for,
    soft_edtsq,
    soft_sdfsq,
    default_barrier,
)
from edt_tpu.parallel.sharded import (
    default_mesh,
    edtsq_sharded,
    edtsq_sharded_auto,
    edt_sharded,
    sdf_sharded,
    edtsq_voxel_graph_sharded,
)


# ---- device-side per-label extraction -------------------------------------

import functools as _functools

import numpy as _np

import jax as _jax
import jax.numpy as _jnp


@_functools.partial(_jax.jit, donate_argnums=())
def extract_label(labels, dt, label):
    """dt masked to one label, on device: dt * (labels == label).

    The reference's own masking fallback (/root/reference/README.md:347-348)
    — as a single fused device op. Composable with jit/vmap; use
    extract_labels(labels, dt, ids) to batch many labels into ONE dispatch.
    """
    return _jnp.where(labels == label, dt, _jnp.asarray(0, dt.dtype))


@_jax.jit
def _extract_labels_jit(labels, dt, ids):
    return _jax.vmap(extract_label, in_axes=(None, None, 0))(labels, dt, ids)


def extract_labels(labels, dt, ids):
    """Batched extract_label: ONE jitted dispatch for all of ``ids``.

    Returns a (len(ids), *labels.shape) stack where slab k is
    dt * (labels == ids[k]) — the vmapped form of extract_label, so an
    SNEMI3D-style 300-label extraction costs one kernel launch instead of
    one dispatch per label (each_device). Batches that exceed device
    memory should be chunked by the caller (the stack is N full volumes).
    Reference semantics: /root/reference/README.md:347-348's masking
    fallback, batched.
    """
    labels = _jnp.asarray(labels)
    ids = _jnp.asarray(ids, labels.dtype)
    return _extract_labels_jit(labels, _jnp.asarray(dt), ids)


def each_device(labels, dt, ids=None):
    """Device-side analog of edt_tpu.each: yields (label, masked dt) with
    every masked volume computed AND LEFT on device.

    For device-resident pipelines this avoids each()'s host round trip of
    the full dt volume plus per-label host buffers (the host RLE kit
    remains faster when the results are consumed on the host — see
    benchmarks/run.py --sections each for the crossover).

    ids: iterable of labels to yield; defaults to the unique nonzero
    labels (one device reduction + a small transfer of the id list).
    """
    labels = _jnp.asarray(labels)
    dt = _jnp.asarray(dt)
    if ids is None:
        ids = [u for u in _np.asarray(_jnp.unique(labels)).tolist() if u != 0]
    for k in ids:
        yield k, extract_label(labels, dt, _jnp.asarray(k, labels.dtype))


__all__ = [
    "edt", "edtsq", "sdf", "sdfsq",
    "default_minplus_fn", "default_parabolic_fn",
    "edtsq_voxel_graph_jnp",
    "edtsq_from_heights", "multilabel_edtsq", "wall_counts_for",
    "soft_edtsq", "soft_sdfsq",
    "default_barrier",
    "default_mesh", "edtsq_sharded", "edtsq_sharded_auto", "edt_sharded",
    "sdf_sharded", "edtsq_voxel_graph_sharded",
    "extract_label", "extract_labels", "each_device",
]
