"""Sharded multi-chip EDT: slab decomposition with axis rotation over ICI.

The reference scales with a shared-memory thread pool fanning independent
rows across cores (/root/reference/src/edt.hpp:411-484, threadpool.h). The
TPU-native scaling story is different in kind: the volume is sharded into
slabs along axis 0 of a 1-D device mesh, and each 1-D pass runs on rows
that are *entirely local* to a shard:

  pass x (axis 2) and pass y (axis 1): rows lie inside a slab -> no comms.
  pass z (axis 0): rows cross shards  -> one all_to_all "rotates" the
  sharded axis (shard axis 2, gather axis 0), the pass runs locally, and a
  second all_to_all rotates back. This is the FFT-style transpose
  decomposition; the collectives ride ICI and replace the reference's
  inter-pass pool.join() barriers (edt.hpp:442-463).

Labels travel through the same all_to_all so segment bounds are computed
on complete rows. Everything is shard_map'd, so the whole transform jits
into one XLA program with fused collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edt_tpu.ops import core


def _local_passes(labels, f, anisotropy, black_border, axes, minplus_fn=None,
                  parabolic_fn=None):
    """Run parabolic passes along the given (local) axes."""
    for ax in axes:
        f = jnp.moveaxis(
            core.parabolic_pass_sq(
                jnp.moveaxis(f, ax, -1),
                jnp.moveaxis(labels, ax, -1),
                anisotropy[ax],
                black_border,
                minplus_fn=minplus_fn,
                parabolic_fn=parabolic_fn,
            ),
            -1,
            ax,
        )
    return f


def edtsq_sharded(
    labels: jax.Array,
    anisotropy,
    black_border: bool = False,
    *,
    mesh: Mesh,
    axis_name: str = "sp",
    minplus_fn=None,
    parabolic_fn=None,
) -> jax.Array:
    """Squared multi-label EDT of a 3-D volume sharded along axis 0.

    labels: (s0, s1, s2), logically global; will be (re)sharded as
    P(axis_name, None, None). s0 and s2 must be divisible by the mesh size
    (pad at the API layer if needed).
    """
    nd = labels.ndim
    assert nd == 3, "sharded path is 3-D; lower dims fit on one chip"
    if minplus_fn is None and parabolic_fn is None:
        from edt_tpu.ops import compose

        parabolic_fn = compose.default_parabolic_fn()  # Pallas on TPU
    anisotropy = jnp.asarray(anisotropy, jnp.float32).reshape(nd)
    nshards = mesh.shape[axis_name]
    if labels.shape[0] % nshards or labels.shape[2] % nshards:
        raise ValueError(
            f"shape {labels.shape} axes 0 and 2 must divide mesh size {nshards}"
        )

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P()),
        out_specs=P(axis_name, None, None),
    )
    def run(lab, aniso):
        # Pass 1 (axis 2, local): closed-form Rosenfeld-Pfaltz.
        f = jnp.moveaxis(
            core.rp_pass_sq(jnp.moveaxis(lab, 2, -1), aniso[2], black_border),
            -1,
            2,
        )
        # Pass 2 (axis 1, local).
        f = _local_passes(lab, f, aniso, black_border, (1,), minplus_fn,
                          parabolic_fn)
        # Pass 3 (axis 0): rotate the sharded axis 0 -> 2 over ICI.
        f = lax.all_to_all(f, axis_name, split_axis=2, concat_axis=0, tiled=True)
        lab_r = lax.all_to_all(lab, axis_name, split_axis=2, concat_axis=0,
                               tiled=True)
        f = _local_passes(lab_r, f, aniso, black_border, (0,), minplus_fn,
                          parabolic_fn)
        # Rotate back.
        f = lax.all_to_all(f, axis_name, split_axis=0, concat_axis=2, tiled=True)
        return f

    sharding = NamedSharding(mesh, P(axis_name, None, None))
    labels = jax.device_put(labels, sharding)
    return run(labels, anisotropy)


def edtsq_voxel_graph_sharded(
    labels, graph, anisotropy, black_border=False, *, mesh, axis_name="sp",
    minplus_fn=None,
):
    """Voxel-connectivity-graph EDT, sharded along axis 0.

    The 2x upsampling (reference edt_voxel_graph.hpp:120-214) is performed
    per shard — interleaving a slab along its own axes is globally
    consistent when shard boundaries align with voxel boundaries — so the
    8x-memory doubled volume never exists unsharded. black_border's
    last-plane zeroing along the sharded axis is applied only on the last
    shard. "x" is the last array axis here (C-order convention).
    """
    from edt_tpu.ops.voxel_graph import doubled_3d_jnp

    nd = labels.ndim
    assert nd == 3
    anisotropy = jnp.asarray(anisotropy, jnp.float32).reshape(nd)
    nshards = mesh.shape[axis_name]

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis_name, None, None), P(axis_name, None, None)),
        out_specs=P(axis_name, None, None),
    )
    def build(lab, g):
        if jnp.issubdtype(lab.dtype, jnp.floating):
            fg = (lab > 0).astype(jnp.uint8)  # reference: negative floats = bg
        else:
            fg = (lab != 0).astype(jnp.uint8)
        is_last = lax.axis_index(axis_name) == nshards - 1
        D = doubled_3d_jnp(fg, g.astype(jnp.uint8), False)
        if black_border:
            D = D.at[:, :, -1].set(0)
            D = D.at[:, -1, :].set(0)
            D = jnp.where(
                is_last, D.at[-1, :, :].set(0), D
            )
        return D

    sharding = NamedSharding(mesh, P(axis_name, None, None))
    labels = jax.device_put(labels, sharding)
    graph = jax.device_put(graph, sharding)
    doubled = build(labels, graph)
    d2 = edtsq_sharded(
        doubled, anisotropy / 2.0, black_border, mesh=mesh,
        axis_name=axis_name, minplus_fn=minplus_fn,
    )
    return d2[::2, ::2, ::2]


def edt_sharded(labels, anisotropy, black_border=False, *, mesh,
                axis_name="sp", minplus_fn=None, parabolic_fn=None):
    return jnp.sqrt(
        edtsq_sharded(labels, anisotropy, black_border, mesh=mesh,
                      axis_name=axis_name, minplus_fn=minplus_fn,
                      parabolic_fn=parabolic_fn)
    )


def sdf_sharded(labels, anisotropy, black_border=False, *, mesh,
                axis_name="sp", minplus_fn=None):
    fg = edt_sharded(labels, anisotropy, black_border, mesh=mesh,
                     axis_name=axis_name, minplus_fn=minplus_fn)
    bg = edt_sharded((labels == 0).astype(jnp.uint8), anisotropy, black_border,
                     mesh=mesh, axis_name=axis_name, minplus_fn=minplus_fn)
    return fg - bg
