"""Profiling and observability helpers.

The reference ships no tracing at all (SURVEY.md §5); here the TPU-native
equivalents: a jax.profiler trace context and a throughput timer that uses
the chained-execution methodology (transport-proof, see bench.py).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


class Counters:
    """Process-wide library counters (transforms run, voxels processed,
    dispatch decisions). The reference has no observability at all
    (SURVEY.md §5); these are intentionally cheap — plain Python ints
    bumped at the NumPy API layer, zero cost inside jit.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.transforms = 0
        self.voxels = 0
        self.sharded_dispatches = 0
        self.host_fallbacks = 0
        self.voxel_graph_calls = 0

    def snapshot(self) -> dict:
        return {
            "transforms": self.transforms,
            "voxels": self.voxels,
            "sharded_dispatches": self.sharded_dispatches,
            "host_fallbacks": self.host_fallbacks,
            "voxel_graph_calls": self.voxel_graph_calls,
        }


counters = Counters()


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/edt_tpu_trace"):
    """Capture a jax.profiler trace of the enclosed block (view in XProf)."""
    with jax.profiler.trace(log_dir):
        yield
    print(f"[edt_tpu] profiler trace written to {log_dir}")


def throughput(fn, example, iters: int = 3, perturb=None):
    """Voxels/s of `fn(volume) -> array`, robust to async-dispatch quirks.

    Chains `iters` executions inside one jit (perturbing the input each
    iteration so nothing collapses) and fetches a scalar probe.
    """
    if perturb is None:
        def perturb(x, i):
            return x.at[(0,) * x.ndim].set(x.reshape(-1)[0] * 0 + i % 2)

    @jax.jit
    def chained(x):
        def body(i, acc):
            d = fn(perturb(x, i))
            return acc + d.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(example))  # compile + warm
    t0 = time.perf_counter()
    float(chained(example))
    dt = (time.perf_counter() - t0) / iters
    return {
        "seconds_per_call": dt,
        "voxels_per_second": example.size / dt,
    }
