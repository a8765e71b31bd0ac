"""Headline benchmark: 512^3 multi-label anisotropic EDT on one chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "voxels/s", "vs_baseline": N}

Baseline: the reference CPU library does a 512^3 multi-label EDT in ~9 s on
a 4 GHz CPU (README.md:148,204; BASELINE.md) => ~14.9 Mvox/s. vs_baseline
is our voxels/s divided by that.

Methodology: K transforms are chained inside ONE jitted call (each
iteration perturbs the input so nothing collapses), and only a scalar probe
leaves the device — this sidesteps any per-dispatch async/caching quirks of
the device transport and times pure device compute. Reported time is the
steady-state call divided by K.
"""

import functools
import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from edt_tpu.api import _use_pallas
from edt_tpu.ops import compose

SIZE = int(os.environ.get("EDT_BENCH_SIZE", "512"))
K = int(os.environ.get("EDT_BENCH_ITERS", "4"))
BASELINE_VOX_PER_S = (512**3) / 9.0  # reference multi-label 512^3 in 9 s


def main():
    rng = np.random.default_rng(42)
    # multi-label volume: ~170 contiguous label blocks (connectomics-style
    # segment sizes) with sparse background tunnels
    blk = max(1, SIZE // 16)
    base = rng.integers(0, 6, size=(SIZE // blk,) * 3)
    labels = np.kron(base, np.ones((blk,) * 3, dtype=np.uint8)).astype(np.uint32)

    anis = jnp.asarray((6.0, 6.0, 30.0), jnp.float32)
    lab = jnp.asarray(labels)
    pallas = _use_pallas()
    mp = compose.default_minplus_fn(pallas)
    pf = compose.default_parabolic_fn(pallas)

    from edt_tpu.api import _sorted_axis_order
    order = _sorted_axis_order(np.asarray((6.0, 6.0, 30.0)))

    @jax.jit
    def chained(lab, anis):
        def body(i, acc):
            l = lab.at[0, 0, i].set(0)  # perturb so iterations cannot collapse
            d = compose.edtsq(l, anis, False, minplus_fn=mp, parabolic_fn=pf,
                              axis_order=order)
            return acc + d[1, 1, 1] + d[SIZE // 2, SIZE // 2, SIZE // 2]

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    float(chained(lab, anis))  # compile + warm
    t0 = time.perf_counter()
    float(chained(lab, anis))  # forces full execution: scalar leaves device
    dt = (time.perf_counter() - t0) / K

    voxels = SIZE**3
    vps = voxels / dt
    print(
        json.dumps(
            {
                "metric": f"{SIZE}^3 multi-label anisotropic edtsq fwd (1 chip)",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "vs_baseline": round(vps / BASELINE_VOX_PER_S, 3),
            }
        )
    )
    print(
        f"# wall per transform: {dt*1e3:.1f} ms on {jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
