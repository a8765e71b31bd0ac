"""Scaling benchmark: 1 -> N devices throughput of the sharded transform.

Usage: python benchmarks/scaling.py [--size 256]

On the virtual CPU mesh this validates mechanics, not speed; on a real
multi-chip slice it reports voxels/s and scaling efficiency per device
count (BASELINE.md's >=80% target).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

# this environment's TPU plugin imports jax at interpreter start, so plain
# JAX_PLATFORMS is too late; force via config before first backend use
if os.environ.get("EDT_SCALING_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from edt_tpu.ops import compose
from edt_tpu.parallel import edtsq_sharded


def time_call(fn, iters=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    args = ap.parse_args()
    S = args.size
    devs = jax.devices()
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 5, size=(S, S, S)).astype(np.uint32))
    anis = (1.0, 1.0, 1.0)

    results = {}
    base = None
    counts = [c for c in (1, 2, 4, 8, len(devs)) if c <= len(devs)]
    for c in sorted(set(counts)):
        if S % c:
            continue
        if c == 1:
            fn = jax.jit(lambda l: compose.edtsq(l, jnp.ones(3, jnp.float32), False))
            dt = time_call(lambda: jax.block_until_ready(fn(labels)))
        else:
            mesh = jax.sharding.Mesh(np.asarray(devs[:c]), ("sp",))
            dt = time_call(
                lambda m=mesh: jax.block_until_ready(
                    edtsq_sharded(labels, anis, False, mesh=m)
                )
            )
        vps = S**3 / dt
        if base is None:
            base = vps
        results[c] = {
            "s": dt,
            "Mvox/s": vps / 1e6,
            "efficiency": vps / (base * c),
        }
    print(json.dumps({"size": S, "backend": jax.default_backend(),
                      "devices": len(devs), "results": results}, indent=2))


if __name__ == "__main__":
    main()
