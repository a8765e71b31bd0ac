"""UNet3D: conv segmentation model trained by distance-field regression.

Second model family of the framework (DistanceFieldNet is a pointwise
MLP). A small 3-D U-Net predicts soft occupancy from voxel features; the
loss compares the differentiable squared EDT of that occupancy against a
target distance field — the "deep distance transform" training pattern
common in connectomics, end-to-end on TPU:

  features (B, X, Y, Z, C) --[3x3x3 convs on the MXU, bf16 option]-->
      occupancy logits --sigmoid--> occupancy
      --[soft_edtsq]--> d --L2 vs target--> loss

TPU mapping:
  * Convs run via lax.conv_general_dilated in NDHWC x DHWIO layout with
    float32 accumulation; ``compute_dtype=jnp.bfloat16`` casts inputs and
    weights so the MXU runs at bf16 rate while params/grads stay f32.
  * Multi-chip: batch is data-parallel over ``dp``; the leading spatial
    axis is slab-sharded over ``sp``. Unlike the pointwise MLP, convs
    have a receptive field, so every 3x3x3 conv under shard_map first
    performs a HALO EXCHANGE: each shard sends its boundary plane to its
    neighbors via lax.ppermute (non-wrapping shifts — edge shards
    receive zeros, which is exactly the 'SAME' zero padding of the
    unsharded conv, so sharded == single-device up to conv round-off).
    This is the ICI pattern the EDT passes never need (their all_to_all
    rotation moves whole axes); the model layer adds it to the
    framework's collective vocabulary alongside all_to_all, psum,
    psum_scatter, all_gather, and the slot-scatter psum gather.

Sharding constraints: every shard's slab of the leading spatial axis
(and the full Y/Z extents) must be a multiple of 2**levels, so stride-2
stages stay aligned and shard-local; the halo exchange handles all
cross-shard reads.

Reference scope note: the reference CPU library has no model layer at
all (SURVEY.md §5) — this module is TPU-native added capability built on
the same differentiable transform as DistanceFieldNet.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from edt_tpu.models import soft

F32 = jnp.float32
_DN = ("NDHWC", "DHWIO", "NDHWC")


def _conv_init(key, k, c_in, c_out):
    scale = 1.0 / np.sqrt(k * k * k * c_in)
    w = jax.random.normal(key, (k, k, k, c_in, c_out), F32) * scale
    return {"w": w, "b": jnp.zeros((c_out,), F32)}


def init_params(key, c_in=4, c0=8, levels=2):
    """U-Net params (a pure float32 pytree — optimizer-ready as is).

    ``levels`` stride-2 encoder stages with mirrored decoder; channel
    widths double per level starting at c0. Keep c0 a multiple of 8 on
    real workloads so the MXU tiles cleanly; defaults stay tiny for
    tests. The level count is recovered from the key structure
    (num_levels), so params carry no non-array leaves.
    """
    params = {}
    keys = jax.random.split(key, 4 * levels + 2)
    ki = iter(keys)
    params["stem"] = _conv_init(next(ki), 3, c_in, c0)
    ch = c0
    for l in range(levels):
        params[f"down{l}"] = _conv_init(next(ki), 3, ch, ch * 2)  # stride 2
        ch *= 2
        params[f"enc{l}"] = _conv_init(next(ki), 3, ch, ch)
    for l in reversed(range(levels)):
        params[f"up{l}"] = _conv_init(next(ki), 3, ch, ch // 2)
        ch //= 2
        # decoder conv consumes [upsampled | skip] concat
        params[f"dec{l}"] = _conv_init(next(ki), 3, 2 * ch, ch)
    params["head"] = _conv_init(next(ki), 1, ch, 1)
    return params


def num_levels(params):
    return sum(1 for k in params if k.startswith("down"))


def _exchange_halo(x, axis_name):
    """Append each neighbor's boundary plane along axis 1 (the sharded
    spatial axis of an NDHWC block): (B, d, ...) -> (B, d + 2, ...).

    Non-wrapping ppermute: the first/last shard receive zeros for the
    missing neighbor — identical to the 'SAME' zero padding the
    unsharded conv applies at the volume edge."""
    n = lax.axis_size(axis_name)
    # my leading plane -> left neighbor's right halo, and vice versa
    right_halo = lax.ppermute(x[:, :1], axis_name,
                              [(i, i - 1) for i in range(1, n)])
    left_halo = lax.ppermute(x[:, -1:], axis_name,
                             [(i, i + 1) for i in range(n - 1)])
    return jnp.concatenate([left_halo, x, right_halo], axis=1)


def _conv(x, p, stride=1, axis_name=None, compute_dtype=None):
    """3-D conv, NDHWC, 'SAME' semantics on the full volume.

    Under shard_map (axis_name set) the sharded leading spatial axis is
    padded by halo exchange instead of zeros; Y/Z keep explicit 'SAME'
    zero pads. Stride-2 'SAME' on an even extent with k = 3 taps input
    positions [2o, 2o + 2] (XLA pads (0, 1)), so the sharded axis drops
    the left halo plane and keeps the right one."""
    w = p["w"]
    k = w.shape[0]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    strides = (stride, stride, stride)
    if axis_name is None or k == 1:
        out = lax.conv_general_dilated(x, w, strides, "SAME",
                                       dimension_numbers=_DN,
                                       preferred_element_type=F32)
    else:
        x = _exchange_halo(x, axis_name)
        if stride == 1:
            # haloed axis is exactly the (1, 1)-padded axis: VALID there
            pad = [(0, 0), (1, 1), (1, 1)]
        else:
            # windows start at even positions: drop the left halo plane,
            # keep the right; even Y/Z extents pad (0, 1)
            x = x[:, 1:]
            pad = [(0, 0), (0, 1), (0, 1)]
        out = lax.conv_general_dilated(x, w, strides, pad,
                                       dimension_numbers=_DN,
                                       preferred_element_type=F32)
    return out.astype(F32) + p["b"]


def apply(params, feats, axis_name=None, compute_dtype=None):
    """Occupancy logits; feats (B, X, Y, Z, C) -> (B, X, Y, Z)."""
    kw = dict(axis_name=axis_name, compute_dtype=compute_dtype)
    levels = num_levels(params)
    x = jax.nn.gelu(_conv(feats.astype(F32), params["stem"], **kw))
    skips = []
    for l in range(levels):
        skips.append(x)
        x = jax.nn.gelu(_conv(x, params[f"down{l}"], stride=2, **kw))
        x = jax.nn.gelu(_conv(x, params[f"enc{l}"], **kw))
    for l in reversed(range(levels)):
        # nearest-neighbor 2x upsample (shard-local: slab sizes are
        # multiples of 2**levels, so every shard upsamples its own voxels)
        b, d, hgt, wdt, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :, None, :],
                             (b, d, 2, hgt, 2, wdt, 2, c)
                             ).reshape(b, 2 * d, 2 * hgt, 2 * wdt, c)
        x = jax.nn.gelu(_conv(x, params[f"up{l}"], **kw))
        x = jnp.concatenate([x, skips[l]], axis=-1)
        x = jax.nn.gelu(_conv(x, params[f"dec{l}"], **kw))
    return _conv(x, params["head"], **kw)[..., 0]


def loss_fn(params, feats, target_dt, anisotropy=(1.0, 1.0, 1.0),
            temperature=0.3, barrier=None, axis_name=None,
            compute_dtype=None, mesh_axes=None):
    """MSE between the soft EDT of predicted occupancy and target_dt.

    Inside shard_map, pass mesh_axes=(dp_axis, sp_axis) so the per-shard
    sum normalizes by the GLOBAL element count (a static number; the
    caller psums the result)."""
    occ = jax.nn.sigmoid(apply(params, feats, axis_name=axis_name,
                               compute_dtype=compute_dtype))
    fn = lambda o: soft.soft_edtsq(o, anisotropy, black_border=True,
                                   barrier=barrier, temperature=temperature,
                                   axis_name=axis_name)
    d = jax.vmap(fn)(occ)
    se = jnp.sum((d - target_dt) ** 2)
    n = 1
    if mesh_axes is not None:
        for ax in mesh_axes:
            n *= lax.axis_size(ax)
    return se / (d.size * n)


def make_train_step(optimizer, **kw):
    @jax.jit
    def step(params, opt_state, feats, target_dt):
        loss, grads = jax.value_and_grad(loss_fn)(params, feats, target_dt,
                                                  **kw)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def make_sharded_train_step(mesh: Mesh, optimizer, anisotropy=(1.0, 1.0, 1.0),
                            temperature=0.3, barrier=None, dp_axis="dp",
                            sp_axis="sp", compute_dtype=None):
    """(dp, sp)-sharded training step: batch over dp, leading spatial axis
    over sp. Convs halo-exchange over sp (ppermute), the EDT rotates its
    sharded axis (all_to_all), gradients psum over the whole mesh —
    three distinct ICI patterns in one jitted step."""
    if barrier is None:
        raise ValueError("sharded training requires an explicit barrier")

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P(), P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
        out_specs=(P(), P(), P()),
        check_vma=True,
    )
    def step(params, opt_state, feats, target_dt):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, target_dt, anisotropy=anisotropy,
            temperature=temperature, barrier=barrier, axis_name=sp_axis,
            compute_dtype=compute_dtype, mesh_axes=(dp_axis, sp_axis))
        grads = lax.psum(grads, (dp_axis, sp_axis))
        loss = lax.psum(loss, (dp_axis, sp_axis))
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)
