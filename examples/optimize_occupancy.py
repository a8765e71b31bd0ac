"""Occupancy optimization against a FIXED segmentation.

The wall-faithful differentiable transform (`soft.multilabel_edtsq`) in
its natural training configuration: the label volume is a static
segmentation (its boundary walls carry the reference's d = w^2 rule,
/root/reference/src/edt.hpp:99-103), and a continuous per-voxel occupancy
is optimized so the resulting distance field matches a target. Because
the labels never change, the per-axis wall-count analysis is precomputed
once with `soft.wall_counts_for` and reused every step — the per-step
graph then contains only the occupancy-dependent passes.

The task: recover which foreground voxels were hollowed out of a labeled
volume, given only the distance field of the intact volume. Gradients
flow through the argmin-residual VJP to the occupancy holes.

Usage:
  python examples/optimize_occupancy.py [--steps 40] [--size 24]
  (CPU: JAX_PLATFORMS=cpu works; the kernels fall back to jnp paths)
  --sharded: same optimization with the volume slab-sharded over every
  visible device (the wall-count precompute and the transform both run
  inside one shard_map; counts are computed once, in the sharded layout,
  via wall_counts_for(..., axis_name=...)).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from edt_tpu.models import soft


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--size", type=int, default=24)
    ap.add_argument("--temperature", type=float, default=0.5)
    ap.add_argument("--sharded", action="store_true",
                    help="slab-shard the volume over all visible devices")
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force a virtual CPU mesh of N devices (like "
                         "benchmarks/config5.py)")
    args = ap.parse_args()

    if args.cpu_devices:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_devices}"
        )
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    s = args.size
    if args.sharded:
        ndev = len(jax.devices())
        s = -(-s // ndev) * ndev  # rotation axes (0 and 2) must divide
    # blocky segmentation (connectomics-style), labels fixed for the run
    blk = max(2, s // 6)
    base = rng.integers(0, 4, size=(-(-s // blk),) * 3)
    labels = np.kron(base, np.ones((blk,) * 3, np.int64))[:s, :s, :s]
    labels = jnp.asarray(labels.astype(np.uint32))
    aniso = (1.0, 1.0, 2.0)

    if args.sharded:
        import functools

        from jax.sharding import PartitionSpec as P

        mesh = jax.sharding.Mesh(np.asarray(jax.devices()), ("sp",))
        sp = P("sp")

        @functools.partial(jax.shard_map, mesh=mesh, in_specs=sp,
                           out_specs=(sp,) * 3, check_vma=True)
        def counts_fn(lab):
            return soft.wall_counts_for(lab, black_border=True,
                                        axis_name="sp")

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(sp, sp, (sp, sp, sp)),
            out_specs=sp, check_vma=True)
        def dist(lab, occ, counts):
            return soft.multilabel_edtsq(
                lab, occ, aniso, black_border=True,
                temperature=args.temperature, wall_counts=counts,
                axis_name="sp")
    else:
        def counts_fn(lab):
            return soft.wall_counts_for(lab, black_border=True)

        def dist(lab, occ, counts):
            return soft.multilabel_edtsq(
                lab, occ, aniso, black_border=True,
                temperature=args.temperature, wall_counts=counts)

    # labels are static: one-time wall analysis, reused by every step
    # (under --sharded the scans run inside the shard_map, axis-0 in the
    # rotated layout, and the fields stay sharded for every later step)
    counts = counts_fn(labels)

    # target: distance field of the INTACT volume (occupancy = mask)
    mask = (labels != 0).astype(np.float32)
    target = dist(labels, mask, counts)

    # initial occupancy: the mask with random holes punched into it
    holes = (rng.random(mask.shape) < 0.15) & (np.asarray(mask) > 0)
    occ0 = jnp.asarray(np.where(holes, 0.2, mask).astype(np.float32))

    def loss_fn(logits):
        occ = jax.nn.sigmoid(logits)
        d = dist(labels, occ, counts)
        return jnp.mean((d - target) ** 2)

    optimizer = optax.adam(0.5)
    logits = jnp.log(occ0 / (1.0 - occ0 + 1e-6) + 1e-6)
    opt_state = optimizer.init(logits)

    @jax.jit
    def step(logits, opt_state):
        loss, g = jax.value_and_grad(loss_fn)(logits)
        updates, opt_state = optimizer.update(g, opt_state)
        return optax.apply_updates(logits, updates), opt_state, loss

    for i in range(args.steps):
        logits, opt_state, loss = step(logits, opt_state)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}")

    # holes recovered? compare thresholded occupancy to the intact mask
    rec = (jax.nn.sigmoid(logits) > 0.5).astype(np.float32)
    agree = float(jnp.mean((rec == mask).astype(np.float32)))
    print(f"occupancy agreement with intact mask: {agree:.3f}")


if __name__ == "__main__":
    main()
