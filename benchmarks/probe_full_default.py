"""One-off probe: FULL edtsq with make_parabolic_fn defaults (band_r=None),
so split mode's default HALO band gets a measured number (breakdown's full
section only sweeps fixed bands)."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import numpy as np, jax, jax.numpy as jnp
from breakdown import timed
from edt_tpu.ops import compose, pallas_kernels as pk

S, K = 512, 4
rng = np.random.default_rng(42)
blk = S // 16
base = rng.integers(0, 6, size=(S // blk,) * 3)
lab = jnp.asarray(np.kron(base, np.ones((blk,) * 3, dtype=np.uint8)).astype(np.uint32))
anis = jnp.asarray((6.0, 6.0, 30.0), jnp.float32)
pf = pk.make_parabolic_fn()  # band_r=None -> split default band
timed("FULL edtsq (parabolic_fn, band default)",
      lambda x, i: compose.edtsq(x, anis, False, parabolic_fn=pf), lab, K)
