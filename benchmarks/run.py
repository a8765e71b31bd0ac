"""Benchmark harness: reproduces the BASELINE.md table on real hardware.

Usage:  python benchmarks/run.py [--size 512] [--iters 3]

Covers the reference's headline configs (BASELINE.md):
  * binary cube EDT (bool fast path)        [ref: 7 s @ 512^3, 4 GHz CPU]
  * multi-label EDT                         [ref: 9 s]
  * signed distance field (sdf)             [ref: 2x EDT]
  * per-label extraction via each()         [ref: SNEMI3D ~90 s total]
  * voxel-graph constrained EDT             [ref: experimental, 8x memory]
  * soft EDT forward+backward (no reference equivalent)

Timing methodology: transforms are chained inside one jitted call with
perturbed inputs and only a scalar probe leaves the device (see bench.py).
Host-API timings (each) are wall-clock around the NumPy surface.
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def chain_timer(make_step, iters):
    """Time `iters` chained device transforms inside one jit; s/transform."""

    @jax.jit
    def chained(x):
        def body(i, acc):
            return acc + make_step(x, i)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def run(x):
        float(chained(x))  # compile+warm
        t0 = time.perf_counter()
        float(chained(x))
        return (time.perf_counter() - t0) / iters

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sections", default="all",
                    help="comma list: binary,multilabel,mlgrad,sdf,soft,each,vg")
    args = ap.parse_args()
    S = args.size
    vox = S**3
    sections = set(args.sections.split(","))

    def want(name):
        return "all" in sections or name in sections

    from edt_tpu.api import _use_pallas
    from edt_tpu.ops import compose
    from edt_tpu.models import soft
    import edt_tpu as edt

    mp = compose.default_minplus_fn(_use_pallas())
    pf = compose.default_parabolic_fn(_use_pallas())
    rng = np.random.default_rng(0)
    results = {}

    def note(key):
        # progressive flushed line per section: a timeout-killed run keeps
        # everything measured so far (the final JSON repeats it all).
        # stderr so stdout stays one json.loads-able blob for consumers.
        print(f"## {key}: {json.dumps(results[key])}",
              file=sys.stderr, flush=True)

    # ---- binary cube (the reference's headline: all-ones cube, bb) ----
    ones = jnp.asarray(np.ones((S, S, S), np.uint8))
    aniso = jnp.ones(3, jnp.float32)

    def binary_step(x, i):
        l = x.at[0, 0, i].set(0)
        d = compose.edtsq(l, aniso, True, minplus_fn=mp, parabolic_fn=pf,
                          binary=True)
        return d[S // 2, S // 2, S // 2]

    if want("binary"):
        dt = chain_timer(binary_step, args.iters)(ones)
        results["binary_cube_edt"] = {"s": dt, "Mvox/s": vox / dt / 1e6,
                                      "ref_s_512": 7.0}
        note("binary_cube_edt")

        rb = jnp.asarray((rng.random((S, S, S)) > 0.5).astype(np.uint8))
        dt = chain_timer(binary_step, args.iters)(rb)
        results["binary_random_edt"] = {"s": dt, "Mvox/s": vox / dt / 1e6,
                                        "ref_s_512": 7.0}
        note("binary_random_edt")

    # ---- multi-label ----
    blk = max(1, S // 16)
    base = rng.integers(0, 6, size=(S // blk,) * 3)
    labels = np.kron(base, np.ones((blk,) * 3, np.uint8)).astype(np.uint32)
    lab = jnp.asarray(labels)
    anis6 = jnp.asarray((6.0, 6.0, 30.0), jnp.float32)

    def ml_step(x, i):
        l = x.at[0, 0, i].set(0)
        d = compose.edtsq(l, anis6, False, minplus_fn=mp, parabolic_fn=pf,
                          axis_order=(1, 0, 2))
        return d[S // 2, S // 2, S // 2]

    if want("multilabel"):
        dt = chain_timer(ml_step, args.iters)(lab)
        results["multilabel_edt"] = {"s": dt, "Mvox/s": vox / dt / 1e6,
                                     "ref_s_512": 9.0}
        note("multilabel_edt")

    # ---- sdf ----
    def sdf_step(x, i):
        l = x.at[0, 0, i].set(0)
        d = compose.sdfsq(l, aniso, True, minplus_fn=mp, parabolic_fn=pf)
        return d[S // 2, S // 2, S // 2]

    if want("sdf"):
        dt = chain_timer(sdf_step, args.iters)(lab)
        results["sdfsq"] = {"s": dt, "Mvox/s": vox / dt / 1e6}
        note("sdfsq")

    # ---- wall-faithful multi-label fwd+bwd (the bench.py headline) ----
    if want("mlgrad"):
        occ_ml = jnp.asarray((labels != 0).astype(np.float32))
        barrier = float(np.sum((np.asarray(anis6) * S) ** 2))

        def mlgrad_step(lab_occ, i):
            l, x = lab_occ
            o = x.at[0, 0, i].set(0.0)
            g = jax.grad(
                lambda oo: jnp.sum(
                    soft.multilabel_edtsq(l, oo, tuple(np.asarray(anis6)),
                                          black_border=True, barrier=barrier,
                                          binary_occupancy=True)
                )
            )(o)
            return g[1, 1, 1]

        dt = chain_timer(mlgrad_step, args.iters)((lab, occ_ml))
        results["multilabel_fwd_bwd"] = {"s": dt, "Mvox/s": vox / dt / 1e6}
        note("multilabel_fwd_bwd")

        def mlfwd_step(lab_occ, i):
            l, x = lab_occ
            o = x.at[0, 0, i].set(0.0)
            d = soft.multilabel_edtsq(l, o, tuple(np.asarray(anis6)),
                                      black_border=True, barrier=barrier,
                                      binary_occupancy=True)
            return d[S // 2, S // 2, S // 2]

        dt = chain_timer(mlfwd_step, args.iters)((lab, occ_ml))
        results["multilabel_fwd_only_differentiable"] = {
            "s": dt, "Mvox/s": vox / dt / 1e6}
        note("multilabel_fwd_only_differentiable")

    # ---- soft EDT fwd+bwd ----
    Ssoft = min(S, 256)
    occ = jnp.asarray((rng.random((Ssoft,) * 3) > 0.5).astype(np.float32))

    def soft_step(x, i):
        o = x.at[0, 0, i].set(0.0)
        g = jax.grad(
            lambda oo: jnp.sum(
                soft.soft_edtsq(oo, (1.0, 1.0, 1.0), black_border=True,
                                barrier=float(3 * Ssoft**2))
            )
        )(o)
        return g[1, 1, 1]

    if want("soft"):
        dt = chain_timer(soft_step, args.iters)(occ)
        results[f"soft_edtsq_fwd_bwd_{Ssoft}^3"] = {
            "s": dt, "Mvox/s": Ssoft**3 / dt / 1e6}
        note(f"soft_edtsq_fwd_bwd_{Ssoft}^3")

    # ---- softmin (temperature > 0, the smooth training mode) ----
    def softmin_step(x, i):
        o = x.at[0, 0, i].set(0.0)
        g = jax.grad(
            lambda oo: jnp.sum(
                soft.soft_edtsq(oo, (1.0, 1.0, 1.0), black_border=True,
                                barrier=float(3 * Ssoft**2), temperature=0.3)
            )
        )(o)
        return g[1, 1, 1]

    if want("soft"):
        dt = chain_timer(softmin_step, args.iters)(occ)
        results[f"softmin_t0.3_fwd_bwd_{Ssoft}^3"] = {
            "s": dt, "Mvox/s": Ssoft**3 / dt / 1e6}
        note(f"softmin_t0.3_fwd_bwd_{Ssoft}^3")

    # ---- per-label extraction (SNEMI3D-like: 512x512x100, ~300 labels) ----
    if want("each"):
        shape = (min(S, 512), min(S, 512), 100)
        nl = rng.integers(1, 335, size=(shape[0] // 32, shape[1] // 32, shape[2] // 20))
        lab_each = np.kron(nl, np.ones((32, 32, 20), np.int16)).astype(np.uint16)
        edt.edt(lab_each, anisotropy=(6, 6, 30), black_border=True)  # warm/compile
        t0 = time.perf_counter()
        mdt = edt.edt(lab_each, anisotropy=(6, 6, 30), black_border=True)
        t_edt = time.perf_counter() - t0  # wall incl. host<->device transfer
        t0 = time.perf_counter()
        count = 0
        for _label, img in edt.each(lab_each, mdt, in_place=True):
            count += 1
        t_each = time.perf_counter() - t0
        # device-side masked extraction (jax_api.each_device): volumes stay
        # on device — the host-kit comparison point for device pipelines
        import edt_tpu.jax_api as edtj

        lab_d = jnp.asarray(lab_each)
        dt_d = jnp.asarray(mdt)
        ids = [u for u in np.unique(lab_each).tolist() if u != 0]
        for _l, img in edtj.each_device(lab_d, dt_d, ids=ids[:1]):
            img.block_until_ready()  # warm/compile
        t0 = time.perf_counter()
        count_dev = 0
        last = None
        for _l, img in edtj.each_device(lab_d, dt_d, ids=ids):
            last = img
            count_dev += 1
        last.block_until_ready()
        t_dev = time.perf_counter() - t0
        # batched device extraction: ONE vmapped dispatch for all labels
        # (memory = N full volumes — chunk to fit; 32 here)
        chunk = min(32, len(ids))
        edtj.extract_labels(lab_d, dt_d, ids[:chunk]).block_until_ready()
        t0 = time.perf_counter()
        count_batched = 0
        stack = None
        for c0 in range(0, len(ids), chunk):
            ids_c = ids[c0:c0 + chunk]
            # keep the dispatch shape fixed (one compile): pad the tail
            # chunk by repeating its last id — extra slabs aren't counted
            pad = chunk - len(ids_c)
            stack = edtj.extract_labels(lab_d, dt_d,
                                        ids_c + [ids_c[-1]] * pad)
            count_batched += len(ids_c)
        stack.block_until_ready()
        t_batched = time.perf_counter() - t0
        results["each_extraction"] = {
            "edt_s": t_edt, "extract_s": t_each, "labels": count,
            "device_masked_extract_s": t_dev, "labels_device": count_dev,
            "device_batched_extract_s": t_batched,
            "labels_batched": count_batched,
            "ref_s_snemi3d": 90.0}
        note("each_extraction")

    # ---- voxel graph ----
    if want("vg"):
        Sv = min(S, 256)
        labv = np.ones((Sv, Sv, Sv), np.uint8)
        graph = np.full((Sv, Sv, Sv), 0b111111, np.uint8)
        edt.edtsq(labv, voxel_graph=graph, black_border=True)  # warm/compile
        t0 = time.perf_counter()
        edt.edtsq(labv, voxel_graph=graph, black_border=True)
        results[f"voxel_graph_{Sv}^3"] = {
            "s": time.perf_counter() - t0}  # wall incl. transfer of 8x volume
        note(f"voxel_graph_{Sv}^3")

    print(json.dumps({"size": S, "backend": jax.default_backend(),
                      "results": results}, indent=2))


if __name__ == "__main__":
    main()
