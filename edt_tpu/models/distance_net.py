"""DistanceFieldNet: the flagship end-to-end model of the framework.

A per-voxel MLP head predicts soft occupancy from multi-channel voxel
features; the loss compares the *differentiable squared EDT* of that
occupancy against a target distance field. This exercises every layer of
the stack in one training step:

  features (B, X, Y, Z, C) --[MLP: MXU matmuls]--> occupancy logits
      --sigmoid--> occupancy --[soft_edtsq: min-plus passes + custom VJP,
      all_to_all axis rotation when spatially sharded]--> d
      --L2 vs target--> loss --grad--> params

Sharding (multi-chip): 2-D mesh (dp, sp). Batch is data-parallel over
``dp``; each volume's leading spatial axis is sharded over ``sp``
(sequence/spatial parallelism) with the EDT's all_to_all rotation riding
ICI. The head is pointwise, so spatial sharding needs no halo exchange;
gradients are psum'd across the whole mesh and parameters stay replicated.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edt_tpu.models import soft

F32 = jnp.float32


def init_params(key, c_in=8, hidden=32):
    k1, k2, k3 = jax.random.split(key, 3)
    s1 = 1.0 / jnp.sqrt(c_in)
    s2 = 1.0 / jnp.sqrt(hidden)
    return {
        "w1": jax.random.normal(k1, (c_in, hidden), F32) * s1,
        "b1": jnp.zeros((hidden,), F32),
        "w2": jax.random.normal(k2, (hidden, hidden), F32) * s2,
        "b2": jnp.zeros((hidden,), F32),
        "w3": jax.random.normal(k3, (hidden, 1), F32) * s2,
        "b3": jnp.zeros((1,), F32),
    }


def apply(params, feats):
    """Per-voxel occupancy logits; feats (..., C) -> (...)."""
    x = feats.astype(F32)
    x = jax.nn.gelu(
        jnp.einsum("...c,ch->...h", x, params["w1"],
                   preferred_element_type=F32) + params["b1"]
    )
    x = jax.nn.gelu(
        jnp.einsum("...h,hk->...k", x, params["w2"],
                   preferred_element_type=F32) + params["b2"]
    )
    x = jnp.einsum("...k,ko->...o", x, params["w3"],
                   preferred_element_type=F32) + params["b3"]
    return x[..., 0]


def forward(params, feats, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
            barrier=None, axis_name=None):
    """Predicted squared distance field for a batch of feature volumes."""
    occ = jax.nn.sigmoid(apply(params, feats))
    fn = lambda o: soft.soft_edtsq(
        o, anisotropy, black_border=True, barrier=barrier,
        temperature=temperature, axis_name=axis_name,
    )
    return jax.vmap(fn)(occ)


def loss_fn(params, feats, target_dt, anisotropy=(1.0, 1.0, 1.0),
            temperature=0.3, barrier=None, axis_name=None):
    d = forward(params, feats, anisotropy, temperature, barrier, axis_name)
    return jnp.mean((d - target_dt) ** 2)


def make_train_step(optimizer, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
                    barrier=None):
    """Single-device (or auto-partitioned) jitted training step."""

    @jax.jit
    def step(params, opt_state, feats, target_dt):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, feats, target_dt, anisotropy, temperature, barrier
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return step


def _pad_flat(x, n_shards):
    flat = x.reshape(-1)
    pad = (-flat.size) % n_shards
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat


def init_sharded_opt_state(mesh, optimizer, params, dp_axis="dp",
                           sp_axis="sp"):
    """Optimizer state for the reduce-scatter train step (ZeRO-style).

    Moment leaves live on the flattened+padded parameter layout and are
    sharded over ALL mesh devices (each device owns 1/N of every moment
    buffer); scalar leaves (e.g. adam's count) stay replicated. Feed the
    result to make_sharded_train_step(..., grad_reduce_scatter=True).
    """
    n = mesh.shape[dp_axis] * mesh.shape[sp_axis]
    flat_params = jax.tree.map(lambda p: _pad_flat(p, n), params)
    opt_state = optimizer.init(flat_params)
    # sp-MAJOR shard order: device (dp, sp) owns global block sp*n_dp + dp,
    # matching the train step's sp-then-dp psum_scatter and _own_slice —
    # a dp-major spec would silently pair each device's param/grad block
    # with another device's moment block (invisible with zero-init moments,
    # wrong after a checkpoint restore or for param-carrying optimizers)
    shard = NamedSharding(mesh, P((sp_axis, dp_axis)))
    rep = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.device_put(x, shard if jnp.ndim(x) else rep), opt_state
    )


def make_sharded_train_step(mesh: Mesh, optimizer, anisotropy=(1.0, 1.0, 1.0),
                            temperature=0.3, barrier=None,
                            dp_axis="dp", sp_axis="sp",
                            grad_reduce_scatter=False, params_template=None):
    """Training step shard_map'd over a (dp, sp) mesh.

    feats: (B, X, Y, Z, C) sharded P(dp, sp); target: (B, X, Y, Z) P(dp, sp).
    Params stay replicated; the all_to_all inside the EDT rides the sp
    axis.

    grad_reduce_scatter=False: gradients are psum'd over the full mesh and
    the optimizer runs replicated (fine for small heads).

    grad_reduce_scatter=True (the scaling-out comm pattern, SURVEY §5):
    each gradient leaf is reduce-scattered (psum_scatter over sp then dp)
    as its backward value becomes available — XLA schedules the
    per-leaf collectives concurrently with the remaining backward, and a
    reduce_scatter moves 1/N of the bytes a psum does — the optimizer then
    updates only this device's 1/N parameter slice (optimizer state
    sharded over the whole mesh; see init_sharded_opt_state), and the
    updated slices are all_gathered back into replicated params: the psum
    of gradients is replaced by reduce_scatter(grads) + all_gather(params),
    which is the same total traffic but shards the optimizer memory and
    compute N ways. Requires ``params_template`` (shapes only) and an
    opt_state from init_sharded_opt_state.
    """
    if barrier is None:
        raise ValueError(
            "sharded training requires an explicit barrier (the default "
            "would be derived from the local slab shape)"
        )
    n_dp, n_sp = mesh.shape[dp_axis], mesh.shape[sp_axis]
    n = n_dp * n_sp

    def local_loss(params, feats, target_dt):
        # per-shard sum of squared errors; normalized by the global count
        occ = jax.nn.sigmoid(apply(params, feats))
        fn = lambda o: soft.soft_edtsq(
            o, anisotropy, black_border=True, barrier=barrier,
            temperature=temperature, axis_name=sp_axis,
        )
        d = jax.vmap(fn)(occ)
        se = jnp.sum((d - target_dt) ** 2)
        # global element count is static (shards partition the batch/space)
        return se / jnp.asarray(d.size * n, F32)

    if not grad_reduce_scatter:
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
            out_specs=(P(), P(), P()),
            check_vma=True,
        )
        def sharded_step(params, opt_state, feats, target_dt):
            loss, grads = jax.value_and_grad(local_loss)(
                params, feats, target_dt)
            grads = lax.psum(grads, (dp_axis, sp_axis))
            loss = lax.psum(loss, (dp_axis, sp_axis))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        return jax.jit(sharded_step)

    if params_template is None:
        raise ValueError("grad_reduce_scatter=True requires params_template")
    flat_struct = jax.eval_shape(
        lambda ps: jax.tree.map(lambda p: _pad_flat(p, n), ps),
        params_template,
    )
    opt_struct = jax.eval_shape(optimizer.init, flat_struct)
    # moment buffers shard over the whole mesh (sp-major, mirroring
    # _own_slice's idx = sp*n_dp + dp); scalars stay replicated
    opt_specs = jax.tree.map(
        lambda x: P((sp_axis, dp_axis)) if x.ndim else P(), opt_struct
    )

    def _reduce_scatter(gleaf):
        # reduce+scatter over sp first (grads of a dp row agree up to the
        # sp-local batch slices), then over dp; shard order mirrors _gather
        x = lax.psum_scatter(_pad_flat(gleaf, n), sp_axis,
                             scatter_dimension=0, tiled=True)
        return lax.psum_scatter(x, dp_axis, scatter_dimension=0, tiled=True)

    def _gather(shard_leaf, template):
        # all_gather output is vma-VARYING (its transpose is a slice, not a
        # psum), so replicated P() params couldn't leave the shard_map.
        # Scatter each shard into its slot of a zeros buffer and psum: the
        # slots are disjoint so the sum IS the concatenation, and psum's
        # output is invariant. Moves n x the all_gather bytes — negligible
        # for the MLP head this step trains.
        size = shard_leaf.size
        idx = lax.axis_index(sp_axis) * n_dp + lax.axis_index(dp_axis)
        buf = jnp.zeros((size * n,), shard_leaf.dtype)
        buf = lax.dynamic_update_slice(buf, shard_leaf, (idx * size,))
        full = lax.psum(buf, (dp_axis, sp_axis))
        return full[: template.size].reshape(template.shape)

    def _own_slice(p):
        flat = _pad_flat(p, n)
        idx = lax.axis_index(sp_axis) * n_dp + lax.axis_index(dp_axis)
        size = flat.size // n
        return lax.dynamic_slice(flat, (idx * size,), (size,))

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), opt_specs, P(dp_axis, sp_axis), P(dp_axis, sp_axis)),
        out_specs=(P(), opt_specs, P()),
        check_vma=True,
    )
    def scatter_step(params, opt_state, feats, target_dt):
        loss, grads = jax.value_and_grad(local_loss)(params, feats, target_dt)
        loss = lax.psum(loss, (dp_axis, sp_axis))
        gshards = jax.tree.map(_reduce_scatter, grads)
        pshards = jax.tree.map(_own_slice, params)
        updates, opt_state = optimizer.update(gshards, opt_state, pshards)
        new_shards = jax.tree.map(lambda p, u: p + u, pshards, updates)
        params = jax.tree.map(_gather, new_shards, params)
        return params, opt_state, loss

    return jax.jit(scatter_step)


def synthetic_batch(key, batch, shape, c_in=8):
    """A toy task: noisy renderings of random boxes + their true EDT."""
    import numpy as np

    from edt_tpu.ops import compose

    key_geom, key_noise = jax.random.split(key)
    rng = np.random.default_rng(
        int(jax.random.randint(key_geom, (), 0, 2**31 - 1))
    )
    labels = np.zeros((batch, *shape), np.uint8)
    for b in range(batch):
        x0, y0, z0 = rng.integers(0, np.array(shape) // 2, 3)
        x1, y1, z1 = (
            np.array([x0, y0, z0]) + rng.integers(2, np.array(shape) // 2, 3)
        )
        labels[b, x0:x1, y0:y1, z0:z1] = 1
    lab = jnp.asarray(labels)
    target = jax.vmap(
        lambda l: compose.edtsq(l, jnp.ones(3, F32), True)
    )(lab)
    noise = jax.random.normal(key_noise, (batch, *shape, c_in), F32) * 0.1
    feats = lab[..., None].astype(F32) + noise
    return feats, target
