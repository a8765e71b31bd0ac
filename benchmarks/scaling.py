"""Scaling benchmark: 1 chip -> 1 host -> N hosts throughput of the
sharded transform.

Single-process (default): meshes over 1..K local devices.
  python benchmarks/scaling.py [--size 256]

Multi-process / multi-host (the jax.distributed path — one process per
host on a real pod slice, or several CPU processes on one machine for
mechanics validation):
  # per host / process (pod runbook):
  python benchmarks/scaling.py --size 1024 \
      --coordinator <host0>:12355 --num-processes N --process-id I
  # local CPU validation (spawns the processes itself; 2 procs x 4
  # virtual devices):
  python benchmarks/scaling.py --launch 1,2 --size 128

In multi-process mode every process must participate in every
computation, so the mesh always spans all global devices; per-count
efficiency comes from launching with different process counts (the
--launch driver does exactly that and aggregates).

On the virtual CPU mesh this validates mechanics, not speed; on a real
multi-chip slice it reports voxels/s and scaling efficiency per device
count (BASELINE.md's >=80% target).
"""

import argparse
import json
import os
import subprocess
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


def time_call(fn, iters=3):
    fn()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def launch(counts, size):
    """Spawn n-process CPU runs for each n in counts; aggregate."""
    here = os.path.abspath(__file__)
    rows = {}
    for n in counts:
        procs = []
        for i in range(n):
            env = os.environ.copy()
            env["EDT_SCALING_PLATFORM"] = "cpu"
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " --xla_force_host_platform_device_count=4")
            cmd = [sys.executable, here, "--size", str(size),
                   "--coordinator", "localhost:12355",
                   "--num-processes", str(n), "--process-id", str(i)]
            procs.append(subprocess.Popen(
                cmd, env=env,
                stdout=subprocess.PIPE if i == 0 else subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            ))
        out0 = procs[0].communicate()[0]
        rcs = [p.wait() for p in procs]
        if any(rcs):
            raise SystemExit(f"launch n={n} failed: rcs={rcs}")
        line = out0.decode().strip().splitlines()[-1]
        rows[n] = json.loads(line)
    base = None
    table = {}
    for n, row in sorted(rows.items()):
        vps = row["Mvox_s"] * 1e6
        dev = row["devices"]
        if base is None:
            base = vps / dev
        table[n] = {
            "processes": n, "devices": dev, "Mvox/s": row["Mvox_s"],
            "efficiency_per_device": vps / (base * dev),
        }
    print(json.dumps({"mode": "multi-process CPU launch", "size": size,
                      "results": table}, indent=2))


def run_distributed(args):
    """One process of a multi-process run (CPU validation or a pod host)."""
    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    from edt_tpu.parallel import edtsq_sharded
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    S = args.size
    devs = jax.devices()  # global
    mesh = Mesh(np.asarray(devs), ("sp",))
    sharding = NamedSharding(mesh, P("sp", None, None))
    rng = np.random.default_rng(0)
    labels_np = rng.integers(0, 5, size=(S, S, S)).astype(np.uint32)
    labels = jax.make_array_from_callback(
        (S, S, S), sharding, lambda idx: labels_np[idx]
    )
    anis = (1.0, 1.0, 1.0)
    dt = time_call(lambda: jax.block_until_ready(
        edtsq_sharded(labels, anis, False, mesh=mesh)))

    # one step of the (dp, sp) ZeRO-style training pattern across
    # processes: differentiable sharded EDT + reduce-scattered grads +
    # mesh-sharded optimizer state + invariant param gather, all under
    # jax.distributed (the pod runbook's actual comm path, not just
    # in-process shard_map)
    import optax

    from jax.sharding import Mesh as _Mesh
    from edt_tpu.models import distance_net, soft as msoft

    ndev = len(devs)
    dp = 2 if (ndev >= 4 and ndev % 2 == 0) else 1
    sp = ndev // dp
    mesh2 = _Mesh(np.asarray(devs).reshape(dp, sp), ("dp", "sp"))
    B, X, Y, Z, C = 2 * dp, 4 * sp, 4, 4 * sp, 4
    key = jax.random.PRNGKey(0)  # same seed every process -> same params
    params = distance_net.init_params(key, c_in=C, hidden=8)
    optimizer = optax.adam(1e-3)
    barrier = float(msoft.default_barrier((X, Y, Z), (1.0, 1.0, 1.0)))
    step = distance_net.make_sharded_train_step(
        mesh2, optimizer, barrier=barrier, grad_reduce_scatter=True,
        params_template=params)
    opt_rs = distance_net.init_sharded_opt_state(mesh2, optimizer, params)
    rngf = np.random.default_rng(1)
    feats_np = rngf.standard_normal((B, X, Y, Z, C)).astype(np.float32)
    target_np = np.zeros((B, X, Y, Z), np.float32)
    sh = NamedSharding(mesh2, P("dp", "sp"))
    feats = jax.make_array_from_callback(feats_np.shape, sh,
                                         lambda idx: feats_np[idx])
    target = jax.make_array_from_callback(target_np.shape, sh,
                                          lambda idx: target_np[idx])
    params = jax.device_put(params, NamedSharding(mesh2, P()))
    _, _, loss = step(params, opt_rs, feats, target)
    loss = float(loss)
    assert np.isfinite(loss), loss

    if args.process_id == 0:
        print(json.dumps({
            "size": S, "backend": jax.default_backend(),
            "processes": args.num_processes, "devices": len(devs),
            "s": dt, "Mvox_s": S ** 3 / dt / 1e6,
            "train_step_loss": loss,
        }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--launch", default=None,
                    help="comma list of process counts to spawn locally")
    ap.add_argument("--coordinator", default=None,
                    help="host:port of process 0 (multi-host mode)")
    ap.add_argument("--num-processes", type=int, default=1)
    ap.add_argument("--process-id", type=int, default=0)
    args = ap.parse_args()
    S = args.size

    if args.launch:
        launch([int(c) for c in args.launch.split(",")], S)
        return
    if args.coordinator:
        run_distributed(args)
        return

    from edt_tpu.ops import compose
    from edt_tpu.parallel import edtsq_sharded

    devs = jax.devices()
    rng = np.random.default_rng(0)
    labels = jnp.asarray(rng.integers(0, 5, size=(S, S, S)).astype(np.uint32))
    anis = (1.0, 1.0, 1.0)

    results = {}
    base = None
    counts = [c for c in (1, 2, 3, 4, 8, len(devs)) if c <= len(devs)]
    for c in sorted(set(counts)):
        # non-divisible device counts work too (pad + crop sharding)
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
