"""Per-component timing breakdown of the 512^3 transform on real hardware.

Times each stage in isolation with the chained-execution methodology
(see bench.py) to locate the bottleneck:
  - pass 1 (RP closed form, jnp)
  - segment_bounds (cummax/cummin, jnp)
  - one transpose (moveaxis round trip)
  - min-plus Pallas kernel alone (masked / binary)
  - fused parabolic kernel (masked / binary), block_rows sweep
  - full edtsq: minplus path vs fused-kernel path

Usage: python benchmarks/breakdown.py [--size 512] [--iters 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timed(label, fn, x, iters):
    @jax.jit
    def chained(x):
        def body(i, acc):
            y = fn(x.at[(0,) * x.ndim].set(i % 2), i)
            return acc + y.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(chained(x))
    t0 = time.perf_counter()
    float(chained(x))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:58s} {dt*1e3:9.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--section", default="all",
                    choices=["all", "stages", "kernels", "full", "binary",
                             "roofline", "grad", "rollbench", "sweepblk"])
    args = ap.parse_args()
    S, K = args.size, args.iters
    sec = args.section

    from edt_tpu.ops import compose, core, pallas_kernels as pk

    rng = np.random.default_rng(42)
    blk = max(1, S // 16)
    base = rng.integers(0, 6, size=(S // blk,) * 3)
    labels_np = np.kron(base, np.ones((blk,) * 3, dtype=np.uint8)).astype(np.uint32)
    lab = jnp.asarray(labels_np)
    anis = jnp.asarray((6.0, 6.0, 30.0), jnp.float32)
    w2 = jnp.float32(36.0)

    f0 = jax.jit(lambda l: core.rp_pass_sq(l, jnp.float32(30.0), False))(lab)
    f2d = f0.reshape(-1, S)
    lab2d = lab.reshape(-1, S).astype(jnp.int32)

    print(f"--- breakdown at {S}^3, {K} chained iters ---", flush=True)
    mp = pk.make_minplus_fn()
    if sec in ("all", "stages"):
        timed("pass1 RP (jnp closed form)",
              lambda x, i: core.rp_pass_sq(x, jnp.float32(30.0), False), lab, K)
        timed("segment_bounds (jnp cummax/cummin)",
              lambda x, i: core.segment_bounds(x)[0], lab, K)
        timed("transpose f (moveaxis 0->-1 + back)",
              lambda x, i: jnp.moveaxis(jnp.moveaxis(x, 0, -1) + 1.0, -1, 0),
              f0, K)

    if sec in ("all", "kernels"):
        # everything derived from the single jit argument (closing over big
        # device arrays embeds them as constants -> the remote-compile
        # tunnel rejects the oversized program). x[0] = f, x[1] = labels.
        stacked = jnp.stack([f2d, lab2d.astype(jnp.float32)])
        for band in (0, 32, 64, 96):
            for br in (8, 32):
                def mp_step(x, i, br=br, band=band):
                    lab_i = x[1].astype(jnp.int32)
                    ss, se = core.segment_bounds(lab_i)
                    return pk.minplus_pallas(x[0], ss, se, w2, masked=True,
                                             walls=True, block_rows=br,
                                             band_r=band)
                timed(f"segbounds + minplus+walls (block_rows={br}, "
                      f"band_r={band})", mp_step, stacked, K)

    if sec in ("all", "full"):
        for band in (0, 32, 64, 96):
            pf = pk.make_parabolic_fn(band_r=band)
            timed(f"FULL edtsq (parabolic_fn, band_r={band})",
                  lambda x, i, pf=pf: compose.edtsq(
                      x, anis, False, parabolic_fn=pf), lab, K)

    if sec in ("all", "roofline"):
        # "Speed of light" as numbers, not vibes: each stage's minimum HBM
        # traffic is modeled from its array reads/writes; achieved GB/s vs
        # the chip's HBM roof says how far from bandwidth-bound we run, and
        # the implied VPU ops/voxel quantifies the compute side (the
        # kernels are VPU-bound elementwise work — no MXU use by design).
        # Roofs are overridable for other chips.
        HBM_GBPS = float(os.environ.get("EDT_TPU_HBM_GBPS", "819"))  # v5e
        # v5e VPU: 8x128 lanes x 4 ALUs x ~940 MHz ~ 3.9e12 f32 op/s
        VPU_GOPS = float(os.environ.get("EDT_TPU_VPU_GOPS", "3900"))
        vox = S ** 3
        print(f"--- roofline (HBM roof {HBM_GBPS:.0f} GB/s, VPU roof "
              f"{VPU_GOPS:.0f} Gop/s) ---")

        def roof(label, dt, bytes_per_vox):
            gbps = vox * bytes_per_vox / dt / 1e9
            ns_per_vox = dt / vox * 1e9
            ops = ns_per_vox * VPU_GOPS  # implied VPU ops/voxel at roof
            print(f"{label:44s} {dt*1e3:8.2f} ms  {gbps:7.1f} GB/s "
                  f"({100*gbps/HBM_GBPS:5.1f}% HBM roof)  "
                  f"<= {ops:6.1f} VPU ops/vox")

        dt = timed("pass1 RP (labels u32 -> f32)",
                   lambda x, i: core.rp_pass_sq(x, jnp.float32(30.0), False),
                   lab, K)
        roof("  pass1", dt, 4 + 4)  # read labels, write f
        pf = pk.make_parabolic_fn()
        stacked = jnp.stack([f2d, lab2d.astype(jnp.float32)])

        def pass_step(x, i):
            return pf(x[0], x[1].astype(jnp.int32), w2, False, False)

        dt = timed("one fused parabolic pass (f+labels -> d)", pass_step,
                   stacked, K)
        roof("  parabolic pass", dt, 4 + 4 + 4 + 8)  # f, labels, d, bounds
        dt = timed("FULL edtsq 3 passes", lambda x, i: compose.edtsq(
            x, anis, False, parabolic_fn=pf), lab, K)
        # RP(8) + 2 transposed parabolic passes (~20 each incl. transpose
        # round trips) — the minimum-traffic model for the whole transform
        roof("  full edtsq", dt, 48)

        # --- achieved VPU utilization of the banded sweep (static model) --
        # The offset-major row sweep's work is statically knowable per
        # offset step: one incremental lane-roll of the (rows, width)
        # window — Mosaic lowers a roll-by-1 to ~ROLL_OPS vector ops per
        # element, measured ~"3 registers each" (CLAUDE.md) — plus the
        # per-tile update (add the quadratic, min-select), ~UPDATE_OPS
        # ops/element. The roll runs over the padded width (n + 2*HALO),
        # hence the width/n scale factor. On a controlled workload with
        # sources every `spacing` voxels the per-row pruning radius is
        # exactly spacing/2, so total static ops/voxel =
        # (2r+1) * (ROLL_OPS * width/n + UPDATE_OPS); achieved VPU
        # utilization = static_ops / (measured ns/vox * VPU roof).
        ROLL_OPS, UPDATE_OPS = 5.0, 2.0
        spacing = 32
        r_known = spacing // 2
        i_idx = np.arange(S)
        frow = np.where(i_idx % spacing == 0, 0.0, 1e6).astype(np.float32)
        f_sync = jnp.asarray(np.broadcast_to(frow, (S * S, S)).copy())
        mp_bin = pk.make_minplus_fn()

        def sweep_step(x, i):
            return mp_bin(x, x, x, jnp.float32(1.0), masked=False)

        dts = timed(f"banded sweep, known radius r={r_known}", sweep_step,
                    f_sync, K)
        width_scale = (S + 2 * pk.HALO) / S
        static_ops = (2 * r_known + 1) * (ROLL_OPS * width_scale + UPDATE_OPS)
        ns_vox = dts / vox * 1e9
        achieved_gops = static_ops / ns_vox
        print(f"  banded-sweep static model: {static_ops:.0f} VPU ops/vox "
              f"((2*{r_known}+1) * ({ROLL_OPS}*{width_scale:.2f} + "
              f"{UPDATE_OPS}))")
        print(f"  achieved: {achieved_gops:.0f} Gop/s = "
              f"{100 * achieved_gops / VPU_GOPS:.1f}% of VPU roof "
              f"({VPU_GOPS:.0f} Gop/s)")

    if sec == "grad":
        # fwd / bwd split of the wall-faithful headline (bench.py workload).
        # Deliberately NOT part of --section all: it adds two extra
        # full-volume jit compiles (minutes over the remote-compile tunnel);
        # run it explicitly. All big arrays ride the jit ARGUMENT (stacked
        # as f32 — label values 0..5 and int16 wall counts survive the f32
        # round trip exactly): closing over them embeds constants and the
        # tunnel rejects the oversized program (HTTP 413).
        from edt_tpu.models import soft

        aniso = (6.0, 6.0, 30.0)
        barrier = float(np.sum((np.asarray(aniso) * S) ** 2))
        occ_np = (labels_np != 0).astype(np.float32)
        kw = dict(anisotropy=aniso, black_border=True, barrier=barrier,
                  binary_occupancy=True)
        stacked_lo = jnp.stack([jnp.asarray(labels_np.astype(np.float32)),
                                jnp.asarray(occ_np)])

        def fwd_step(x, i):
            l = x[0].astype(jnp.uint32)
            return soft.multilabel_edtsq(l, x[1].at[0, 0, i].set(0.0), **kw)

        t_f = timed("multilabel_edtsq fwd (residual-emitting)", fwd_step,
                    stacked_lo, K)

        def fb_step(x, i):
            l = x[0].astype(jnp.uint32)
            return jax.grad(lambda o: jnp.sum(
                soft.multilabel_edtsq(l, o, **kw)))(x[1].at[0, 0, i].set(0.0))

        t_fb = timed("multilabel_edtsq fwd+bwd", fb_step, stacked_lo, K)
        print(f"  bwd = {1e3*(t_fb - t_f):.1f} ms ({t_fb/t_f:.2f}x fwd; "
              f"target <= 1.40x)")
        if jax.default_backend() != "tpu":
            return  # per-kernel isolation below is TPU-only (Mosaic)
        # one walled argmin pass vs its grad gather, in isolation
        cnt = jax.jit(lambda l: jnp.moveaxis(
            soft._wall_counts(l, 0, True), 0, -1).reshape(-1, S))(lab)
        fw = jnp.moveaxis(f0, 0, -1).reshape(-1, S)
        cnt_dt = cnt.dtype
        stacked_fc = jnp.stack([fw, cnt.astype(jnp.float32)])

        def argmin_step(x, i):
            d, o = pk.minplus_argmin_pallas(x[0], w2,
                                            walls=x[1].astype(cnt_dt),
                                            emit_offsets=True)
            return d + o.astype(jnp.float32)

        timed("one walled argmin pass (emit_offsets)", argmin_step,
              stacked_fc, K)
        d0, o0 = jax.jit(lambda x: pk.minplus_argmin_pallas(
            x[0], w2, walls=x[1].astype(cnt_dt),
            emit_offsets=True))(stacked_fc)
        sent = int(jnp.iinfo(o0.dtype).min)
        stacked_g = jnp.stack([fw, o0.astype(jnp.float32)])

        def grad_step(x, i):
            return pk.minplus_grad_pallas(x[0], offsets=x[1].astype(o0.dtype),
                                          off_sent=sent)

        timed("one grad gather pass (offsets mode)", grad_step, stacked_g, K)

    if sec == "sweepblk":
        # production banded sweep (the roofline section's r=16 stage) at a
        # chosen block_rows — one process per value (MLIR cache KeyError
        # otherwise). The rollbench overhead model says grid-step count,
        # not vector work, may dominate: taller blocks = fewer grid steps.
        blk = int(os.environ.get("EDT_TPU_MP_BLOCK_ROWS", "32"))
        rs = os.environ.get("EDT_TPU_MP_ROW_SWEEP", "1") != "0"
        spacing = 32
        i_idx = np.arange(S)
        frow = np.where(i_idx % spacing == 0, 0.0, 1e6).astype(np.float32)
        f_sync = jnp.asarray(np.broadcast_to(frow, (S * S, S)).copy())

        def sweep_step(x, i):
            return pk.minplus_pallas(x, x, x, jnp.float32(1.0), masked=False,
                                     block_rows=blk, row_sweep=rs)

        if os.environ.get("EDT_TPU_SWEEPBLK_SKIP_FULL", "0") == "0":
            timed(f"banded sweep r={spacing//2}, block_rows={blk}, "
                  f"row_sweep={rs}", sweep_step, f_sync, K)

        if os.environ.get("EDT_TPU_SWEEPBLK_PHASE2", "0") != "0":
            # phase 2 in isolation: fixed rmax, no radius calc / init /
            # epilogue — same padded layout and per-offset body as
            # _minplus_rowsweep_kernel. Locates where the gap between
            # the full kernel and the rollbench floor lives.
            from jax import lax
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu

            H, T128 = pk.HALO, pk.TILE
            n = S
            n_tiles = n // T128
            width = n + 2 * H
            rmax = spacing // 2
            lvl = os.environ["EDT_TPU_SWEEPBLK_PHASE2"]

            def p2_kernel(f_ref, out_ref, rad_ref=None):
                if lvl >= "2":
                    # phase 1: per-tile radius reductions, as in the
                    # production kernel
                    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)

                    def calc_radius(it, rm):
                        f_i = f_ref[:, pl.ds(H + it * T128, T128)]
                        bound = jnp.max(f_i, axis=1, keepdims=True)
                        radius = pk._radius_from_gap(
                            pk._radius_gap(bound, minf_row),
                            jnp.float32(1.0), n)
                        rad_ref[it] = radius
                        return jnp.maximum(
                            rm, jnp.where(radius <= rmax, radius, -1))

                    lax.fori_loop(0, n_tiles, calc_radius, jnp.int32(-1))

                def body(k, wk):
                    kk = (k - rmax).astype(jnp.float32)
                    q = kk * kk
                    for it in range(n_tiles):
                        sl = pl.ds(it * T128, T128)
                        cand = wk[:, it * T128:(it + 1) * T128]
                        out_ref[:, sl] = jnp.minimum(out_ref[:, sl],
                                                     cand + q)
                    return pltpu.roll(wk, width - 1, axis=1)

                w0 = f_ref[:, :]
                wk = pltpu.roll(w0, rmax + (width - H), axis=1)
                for it in range(n_tiles):
                    out_ref[:, pl.ds(it * T128, T128)] = jnp.full(
                        (blk, T128), jnp.inf, jnp.float32)
                lax.fori_loop(0, 2 * rmax + 1, body, wk)

                if lvl >= "3":
                    # phase 3 clone (masked=False, walls=False): per-tile
                    # cond between the banded no-op and the tile-pair scan
                    ii = lax.broadcasted_iota(jnp.int32, (T128, T128), 0)
                    jj = lax.broadcasted_iota(jnp.int32, (T128, T128), 1)
                    dmat = (jj - ii).astype(jnp.float32)

                    def per_target_tile(it, _):
                        i0 = it * T128
                        radius = rad_ref[it]

                        def per_cand(jt, acc):
                            j0 = jt * T128
                            f_j = f_ref[:, pl.ds(H + j0, T128)]
                            d = dmat + (i0 - j0).astype(jnp.float32)
                            quad = d * d
                            cost = f_j[:, :, None] + quad[None, :, :]
                            return jnp.minimum(acc, jnp.min(cost, axis=1))

                        def tiled(_):
                            j_lo = jnp.maximum(0, i0 - radius)
                            j_hi = jnp.minimum(n, i0 + T128 + radius)
                            jt_lo = jnp.maximum(j_lo // T128, 0)
                            jt_hi = jnp.minimum((j_hi + T128 - 1) // T128,
                                                n_tiles)

                            return lax.fori_loop(
                                jt_lo, jt_hi, per_cand,
                                jnp.full((blk, T128), jnp.inf, jnp.float32))

                        if lvl == "4":
                            # no cond: unconditional banded write-back
                            acc = out_ref[:, pl.ds(i0, T128)]
                        elif lvl in ("5", "6", "7"):
                            # zero-trip tiled loop + select, no cond
                            banded = radius <= rmax
                            r_eff = jnp.where(banded,
                                              jnp.int32(-2 * T128), radius)
                            j_lo = jnp.maximum(0, i0 - r_eff)
                            j_hi = jnp.minimum(n, i0 + T128 + r_eff)
                            jt_lo = jnp.maximum(j_lo // T128, 0)
                            jt_hi = jnp.minimum(
                                (j_hi + T128 - 1) // T128, n_tiles)

                            if lvl == "6":
                                # small 2-D body instead of the 3-D
                                # tile-pair work
                                def per_cand6(jt, acc):
                                    j0 = jt * T128
                                    f_j = f_ref[:, pl.ds(H + j0, T128)]
                                    return jnp.minimum(
                                        acc, f_j + (i0 - j0) * 1.0)

                                tacc = lax.fori_loop(
                                    jt_lo, jt_hi, per_cand6,
                                    jnp.full((blk, T128), jnp.inf,
                                             jnp.float32))
                            elif lvl == "7":
                                # 3-D work chunked to (blk, 8, 128) in a
                                # dynamic inner loop: small live footprint
                                ilan = lax.broadcasted_iota(
                                    jnp.int32, (8, T128), 1)
                                jsub = lax.broadcasted_iota(
                                    jnp.int32, (8, T128), 0)

                                def per_cand7(jt, acc):
                                    j0 = jt * T128

                                    def chunk(g, acc):
                                        js = j0 + g * 8
                                        f_jg = f_ref[:, pl.ds(H + js, 8)]
                                        d = (ilan + i0
                                             - (jsub + js)).astype(
                                                 jnp.float32)
                                        quad = d * d
                                        cost = (f_jg[:, :, None]
                                                + quad[None, :, :])
                                        return jnp.minimum(
                                            acc, jnp.min(cost, axis=1))

                                    return lax.fori_loop(0, T128 // 8,
                                                         chunk, acc)

                                tacc = lax.fori_loop(
                                    jt_lo, jt_hi, per_cand7,
                                    jnp.full((blk, T128), jnp.inf,
                                             jnp.float32))
                            else:
                                tacc = lax.fori_loop(
                                    jt_lo, jt_hi, per_cand,
                                    jnp.full((blk, T128), jnp.inf,
                                             jnp.float32))
                            acc = jnp.where(banded,
                                            out_ref[:, pl.ds(i0, T128)],
                                            tacc)
                        else:
                            acc = lax.cond(
                                radius <= rmax,
                                lambda _: out_ref[:, pl.ds(i0, T128)],
                                tiled, 0)
                        out_ref[:, pl.ds(i0, T128)] = acc
                        return 0

                    lax.fori_loop(0, n_tiles, per_target_tile, 0)

            fpad = jnp.pad(f_sync, ((0, 0), (H, H)),
                           constant_values=np.inf)

            def p2_step(x, i):
                return pl.pallas_call(
                    p2_kernel,
                    grid=(x.shape[0] // blk,),
                    in_specs=[pl.BlockSpec((blk, width), lambda r: (r, 0))],
                    out_specs=pl.BlockSpec((blk, n), lambda r: (r, 0)),
                    out_shape=jax.ShapeDtypeStruct((x.shape[0], n),
                                                   jnp.float32),
                    scratch_shapes=(
                        [pltpu.SMEM((n_tiles,), jnp.int32)]
                        if lvl >= "2" else []),
                )(x)

            timed(f"phase-2+{lvl} only "
                  f"(fixed rmax={rmax}, block_rows={blk})",
                  p2_step, fpad, K)

    if sec == "rollbench":
        # Lane-roll vs sublane-roll microbenchmark (explicit-only). The
        # measured roofline (round 5) shows the offset-major banded sweep
        # at ~3% of the VPU roof, bound by the per-offset whole-row
        # pltpu.roll along the LANE axis (the 128-lane crossbar). The
        # candidate redesign sweeps along the SUBLANE axis instead
        # (sublane rotates are vreg-select shuffles, no crossbar) at the
        # cost of one tile transpose per pass. This isolates that choice:
        # identical footprint and step count, only the rolled axis
        # differs. A large sublane win here justifies the kernel rewrite;
        # parity kills it without touching product code.
        from jax import lax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        if jax.default_backend() != "tpu":
            print("rollbench is a Mosaic timing probe; run it on the TPU")
            return

        T = int(os.environ.get("EDT_TPU_ROLLBENCH_T", "33"))
        # default: steps == a (2r+1) sweep at r=16
        ROWS = int(os.environ.get("EDT_TPU_ROLLBENCH_ROWS", "4096"))
        WIDTH = S
        xroll = jnp.asarray(
            rng.standard_normal((ROWS, WIDTH)).astype(np.float32))

        def mk_bench(mode, blk_r, axis=1):
            # mode selects the step body; identical step count and
            # min-accumulate so only the shift mechanism differs:
            #   static   acc = min(acc, roll(x, k))      independent rotates
            #   incr     w = roll(w, 1); acc = min(acc, w)  the real sweep
            #   dyn      fori_loop k: roll(x, k) dynamic amount, one temp
            #   noroll   acc = min(acc, x + c_k)         traffic-only control
            def kern(x_ref, o_ref):
                x = x_ref[...]
                acc = x
                if mode == "static":
                    for k in range(1, T):
                        acc = jnp.minimum(acc, pltpu.roll(x, k, axis=axis))
                elif mode == "incr":
                    w = x
                    for k in range(1, T):
                        w = pltpu.roll(w, 1, axis=axis)
                        acc = jnp.minimum(acc, w)
                elif mode == "dyn":
                    def body(k, acc):
                        return jnp.minimum(acc,
                                           pltpu.roll(x, k, axis=axis))
                    acc = lax.fori_loop(1, T, body, acc)
                elif mode == "forincr":
                    # phase-2 candidate structure: dynamic-trip fori_loop
                    # carrying (rolled row, accumulator) as VALUES — the
                    # production sweep instead writes out_ref per step
                    def body(k, c):
                        w, acc = c
                        w = pltpu.roll(w, 1, axis=axis)
                        return w, jnp.minimum(acc, w)
                    _, acc = lax.fori_loop(1, T, body, (x, acc))
                elif mode == "revincr":
                    # the production sweep's actual roll: leftward shift
                    # by 1 via roll-right-by-(width-1) — Mosaic may pay
                    # ~log2(amount) crossbar stages for large amounts
                    w = x
                    n_lanes = x.shape[1]
                    for k in range(1, T):
                        w = pltpu.roll(w, n_lanes - 1, axis=axis)
                        acc = jnp.minimum(acc, w)
                elif mode == "dynub":
                    # refincr with a DATA-DEPENDENT trip count (the
                    # production sweep's 2*rmax+1): Mosaic cannot unroll
                    # or software-pipeline across iterations
                    o_ref[...] = acc
                    tdyn = jnp.int32(T) + (x[0, 0] - x[0, 0]).astype(
                        jnp.int32)
                    def body(k, w):
                        w = pltpu.roll(w, 1, axis=axis)
                        o_ref[...] = jnp.minimum(o_ref[...], w)
                        return w
                    lax.fori_loop(1, tdyn, body, x)
                    return
                elif mode == "refincr":
                    # the production sweep's actual structure: accumulate
                    # through the output REF (VMEM) each step
                    o_ref[...] = acc
                    def body(k, w):
                        w = pltpu.roll(w, 1, axis=axis)
                        o_ref[...] = jnp.minimum(o_ref[...], w)
                        return w
                    lax.fori_loop(1, T, body, x)
                    return
                elif mode == "noroll":
                    for k in range(1, T):
                        acc = jnp.minimum(acc, x + jnp.float32(k))
                elif mode.startswith("acc"):
                    # A-way independent accumulators: same op count as
                    # noroll but the serial min-chain dependency is A x
                    # shorter — isolates latency- vs issue-bound
                    A = int(mode[3:])
                    accs = [x + jnp.float32(a) for a in range(A)]
                    for k in range(A, T):
                        accs[k % A] = jnp.minimum(accs[k % A],
                                                  x + jnp.float32(k))
                    for a in range(1, A):
                        accs[0] = jnp.minimum(accs[0], accs[a])
                    acc = accs[0]
                elif mode.startswith("rollacc"):
                    # the real sweep's shape with A accumulators: roll-by-1
                    # chain feeding round-robin mins
                    A = int(mode[7:])
                    w = x
                    accs = [x] * A
                    for k in range(1, T):
                        w = pltpu.roll(w, 1, axis=axis)
                        accs[k % A] = jnp.minimum(accs[k % A], w)
                    for a in range(1, A):
                        accs[0] = jnp.minimum(accs[0], accs[a])
                    acc = accs[0]
                o_ref[...] = acc

            def run(x, i):
                return pl.pallas_call(
                    kern,
                    grid=(ROWS // blk_r,),
                    in_specs=[pl.BlockSpec((blk_r, WIDTH),
                                           lambda r: (r, 0))],
                    out_specs=pl.BlockSpec((blk_r, WIDTH), lambda r: (r, 0)),
                    out_shape=jax.ShapeDtypeStruct((ROWS, WIDTH),
                                                   jnp.float32),
                )(x)

            return run

        print(f"--- roll axis bench: {T-1} rolled min-steps over "
              f"({ROWS}, {WIDTH}) f32 ---")
        # Mosaic allocates each unrolled roll temp on the scoped-vmem
        # stack (no slot reuse): blk_r * WIDTH * 4 B * T must stay under
        # the 16 MB scoped limit, hence small row blocks
        # each variant compiles a separate chained program over the
        # remote-compile tunnel (~1-2 min each): EDT_TPU_ROLLBENCH picks
        # a comma-separated subset so runs fit the 600 s shell cap
        blk_r = int(os.environ.get("EDT_TPU_ROLLBENCH_BLK", "128"))
        modes = os.environ.get("EDT_TPU_ROLLBENCH",
                               "static,incr,noroll").split(",")
        ts = {}
        label = {"static": "independent static-amount rolls",
                 "sublane": "sublane-axis static rolls",
                 "incr": "incremental roll-by-1 chain",
                 "dyn": "fori_loop dynamic-amount rolls",
                 "noroll": "no-roll control, min+add only",
                 "forincr": "fori_loop value-carried (row, acc)",
                 "revincr": "roll-by-(width-1) chain (production shift)",
                 "refincr": "fori_loop out_ref-accumulated (production)",
                 "dynub": "refincr with data-dependent trip count",
                 "acc2": "no-roll, 2 accumulators",
                 "acc4": "no-roll, 4 accumulators",
                 "rollacc2": "roll-by-1 chain, 2 accumulators",
                 "rollacc4": "roll-by-1 chain, 4 accumulators"}
        for m in modes:
            axis = 0 if m == "sublane" else 1
            mm = "static" if m == "sublane" else m
            ts[m] = timed(f"{label[m]} (block_rows={blk_r})",
                          mk_bench(mm, blk_r, axis=axis), xroll, K)
        if "noroll" in ts:
            for m in ts:
                if m != "noroll":
                    print(f"  {m} overhead vs traffic-only control: "
                          f"{ts[m] / ts['noroll']:.2f}x")

    if sec in ("all", "binary"):
        # binary all-ones cube with black border (reference headline config)
        ones = jnp.ones((S, S, S), jnp.uint8)
        timed("FULL binary edtsq all-ones bb (minplus path)",
              lambda x, i: compose.edtsq(x, jnp.ones(3, jnp.float32), True,
                                         minplus_fn=mp, binary=True), ones, K)
        for br in (8, 32):
            pf = pk.make_parabolic_fn(block_rows=br)
            timed(f"FULL binary edtsq all-ones bb (fused, block_rows={br})",
                  lambda x, i, pf=pf: compose.edtsq(
                      x, jnp.ones(3, jnp.float32), True, parabolic_fn=pf,
                      binary=True), ones, K)


if __name__ == "__main__":
    main()
