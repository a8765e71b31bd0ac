"""BASELINE config 5 demonstration: multi-label volume with voxel_graph
connectivity constraints, sharded over a device mesh.

On real pod hardware this is the 1024^3 config; on the virtual CPU mesh
(default here: 8 devices) it runs the largest size that completes in
reasonable time and verifies sharded == single-device exactly.

Usage:
  python benchmarks/config5.py [--size 96] [--devices 8]
  (CPU mesh is forced unless --tpu is passed and >1 real device exists)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=96)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--no-check", action="store_true",
                    help="skip the single-device comparison (large sizes)")
    args = ap.parse_args()

    if not args.tpu:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    import jax.numpy as jnp

    from edt_tpu.parallel import edtsq_voxel_graph_sharded, default_mesh

    S = args.size
    rng = np.random.default_rng(0)
    blk = max(1, S // 8)
    base = rng.integers(0, 6, size=(-(-S // blk),) * 3)
    labels = np.kron(base, np.ones((blk,) * 3, np.uint8))[:S, :S, :S]
    labels = labels.astype(np.uint32)
    graph = rng.integers(0, 64, size=(S, S, S)).astype(np.uint8)

    mesh = default_mesh()
    n_dev = len(jax.devices())
    t0 = time.perf_counter()
    out = np.array(edtsq_voxel_graph_sharded(
        jnp.asarray(labels), jnp.asarray(graph), (6.0, 6.0, 30.0), True,
        mesh=mesh,
    ))
    dt = time.perf_counter() - t0

    ok = None
    if not args.no_check:
        import edt_tpu as edt

        single = edt.edtsq(labels, anisotropy=(6.0, 6.0, 30.0),
                           black_border=True, voxel_graph=graph)
        ok = bool(np.allclose(out, single))
        assert ok, "sharded voxel-graph result diverges from single-device"

    print(json.dumps({
        "config": "BASELINE config 5 (multi-label + voxel_graph, sharded)",
        "size": S, "devices": n_dev, "backend": jax.default_backend(),
        "wall_s_first_call": dt, "matches_single_device": ok,
    }))


if __name__ == "__main__":
    main()
