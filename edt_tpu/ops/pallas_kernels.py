"""Pallas TPU kernels for the min-plus (FH parabolic) pass.

This is the hot op of the whole framework: the Felzenszwalb–Huttenlocher
lower-envelope pass (reference /root/reference/src/edt.hpp:168-313) recast
as a tropical (min,+) evaluation

    d[r, i] = min_j { f[r, j] + w^2 (i - j)^2 }   (then min'd with the
    per-segment wall parabolas, which provably subsume every
    foreign-segment candidate — see _minplus_kernel)

Each 128-target tile bounds its winning offset by
radius^2 <= min(max f, max wall) (j = i is always a candidate, so
d[i] <= f[i]; the walls bound d[i] as well) and dispatches on it:

  * small radius -> BANDED: rolling-window scan of the 2*radius + 1
    diagonal offsets, O(radius)/voxel — the regime of realistic volumes,
    where the reference's binary fast path skips distant rows
    (edt.hpp:528-545);
  * large radius -> TILED: brute-force (rows, j, i) tile pairs over
    [seg_lo, seg_hi) ∩ [i0 - radius, i0 + TILE + radius), perfectly
    vectorized with zero data-dependent vector control flow.

Rows ride the 8-sublane axis, scan positions the 128-lane axis; each grid
program owns a (block_rows, n) slab of rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

BLOCK_ROWS = 8
# the min-plus kernel prefers taller row blocks (amortizes per-tile scalar
# work and the (TILE, TILE) quad construction); measured optimum on v5e
MP_BLOCK_ROWS = 32
TILE = 128
_INF = float("inf")


def _radius_gap(bound_row, minf_row):
    """Scalar radius bound: max over rows of (bound - minf), sanitized.

    All-INF rows (padding / fully-open rows) contribute 0 — any radius is
    correct for them since every candidate is INF; rows with an infinite
    bound over finite candidates force a full scan.
    """
    gap = bound_row - minf_row
    gap = jnp.where(
        jnp.isfinite(gap),
        jnp.maximum(gap, 0.0),
        jnp.where(minf_row == _INF, 0.0, _INF),
    )
    return jnp.max(gap)


def _radius_from_gap(gap, w2, n):
    """Largest integer offset k with w2 * k^2 <= gap, guarded for f32
    division/sqrt rounding (a couple of ulps) by a tiny multiplicative +
    additive slack instead of a full +1 — workloads whose true radius sits
    exactly on a band threshold (e.g. 32-wide blocks -> radius 16) would
    otherwise tip into the expensive branch for no reason."""
    r = jnp.sqrt(gap / w2) * (1.0 + 1e-5) + 0.01
    return jnp.minimum(r, jnp.float32(n)).astype(I32)


HALO = TILE  # INF halo around the scan axis enabling unaligned banded loads
BAND_MAX_R = 16  # banded branch chosen when the pruning radius <= this
# wall-count sentinels ("open side", -> INF): single-sourced leaf module
# shared with edt_tpu.models.soft
from edt_tpu.ops.wall_sentinels import WALL_SENT16, WALL_SENT32  # noqa: E402
# (measured v5e crossover: the rolling-window band beats a 128-candidate
# tile pair only for small radii; per-tile dispatch lets smooth regions of
# the same volume take the band while feature-dense tiles stay tiled)


def _minplus_kernel(w2_ref, nreal_ref, f_ref, ss_ref, se_ref, out_ref, *,
                    n_tiles, masked, block_rows=MP_BLOCK_ROWS, walls=False,
                    black_border=False, band_r=BAND_MAX_R):
    """Unmasked min-plus; ``masked=True`` only adds segment-extent pruning.

    Foreign-segment candidates need no cost mask: a j outside target i's
    segment has |i - j| >= (i's distance to its segment edge) + 1, so with
    f[j] >= 0 its cost always >= the wall parabola (applied in-kernel with
    walls=True, else by core.border_envelopes_sq) — the result is
    bit-identical to the reference's per-segment restarts (edt.hpp:344-377)
    at half the inner-loop VPU ops. Background voxels need no explicit
    zeroing either: they carry f == 0, so candidate j == i already pins
    them to 0.

    Each 128-target tile dispatches on its pruning radius
    (radius^2 = max_i d_i <= min(max f, max wall), the latter when
    walls=True):

      * radius <= band_r: BANDED evaluation — d(i) = min_k f(i+k) + w^2 k^2
        over k in [-radius, radius] with shifted full-tile loads (the f
        buffer carries an INF halo). Work is O(radius) per voxel — the
        brute-force tile pair would pay >= 128 candidates per voxel no
        matter how small the radius (the dominant regime for realistic
        volumes, where features are tens of voxels).
      * radius > band_r: TILED evaluation over candidate 128-tiles in
        [seg_lo, seg_hi) ∩ [i0 - radius, i0 + TILE + radius), cost laid out
        as (rows, j, i) with targets i on lanes so the candidate min
        reduces elementwise down the sublane axis.

    walls=True fuses the epilogue: masked -> per-segment wall parabolas
    w^2 (i - ss + 1)^2 / w^2 (se - i)^2 gated by black_border at open row
    ends (reference edt.hpp:231-243, 359-375); unmasked (binary) ->
    whole-row border parabolas when black_border.
    """
    # unmasked: ss/se are not kernel inputs at all (no wasted DMA)
    if ss_ref is None:
        ss_ref = se_ref = f_ref  # unused placeholders
    w2 = w2_ref[0]
    n_real = nreal_ref[0]
    n = n_tiles * TILE
    lanes = lax.broadcasted_iota(I32, (1, TILE), 1)

    # (TILE, TILE) offset matrix for a tile pair, [j, i] = i - j.
    # (iota must be integer-typed on TPU; subtract in i32 then convert.)
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (jj - ii).astype(F32)

    # Per-row floor of f (the INF halo/padding cannot lower it): within a
    # row, every winner j* has f[j*] >= minf_row, so w2 (i - j*)^2 =
    # d_i - f[j*] <= bound_row - minf_row — far tighter than bound/w2
    # whenever rows carry a large additive floor. The large-distance
    # regime (e.g. an all-ones cube, where later passes see near-constant
    # rows) collapses from a full tiled scan to radius ~1. Kept per-row
    # (not per-block) because a block's 32 rows can span very different
    # floors; only the final max is a scalar.
    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)  # (block_rows, 1)

    def per_target_tile(it, _):
        i0 = it * TILE
        f_i = f_ref[:, pl.ds(HALO + i0, TILE)]
        gi = lanes + i0

        # --- pruning bound on the winning offset (per-row, then scalar) ---
        lwall = rwall = None
        if masked:
            # seg bounds may stream as int16 (half the HBM; positions fit)
            ss_i = ss_ref[:, pl.ds(i0, TILE)].astype(I32)
            se_i = se_ref[:, pl.ds(i0, TILE)].astype(I32)
            seg_lo = jnp.min(ss_i)
            seg_hi = jnp.max(se_i)
        else:
            seg_lo = jnp.int32(0)
            seg_hi = jnp.int32(n)
        bound = jnp.max(f_i, axis=1, keepdims=True)
        if walls and masked:
            li = (gi - ss_i + 1).astype(F32)
            ri = (se_i - gi).astype(F32)
            lwall = w2 * (li * li)
            rwall = w2 * (ri * ri)
            if not black_border:
                lwall = jnp.where(ss_i > 0, lwall, _INF)
                rwall = jnp.where(se_i < n_real, rwall, _INF)
            # d_i <= min(f_i, wall_i), so the radius may use the tighter
            # max_i min(f_i, wall_i) — this also keeps the radius finite
            # when f still carries INF from open borders.
            bound = jnp.max(jnp.minimum(f_i, jnp.minimum(lwall, rwall)),
                            axis=1, keepdims=True)
        elif walls and black_border:
            # binary + black border: the whole-row border parabolas bound
            # d_i too, so border tiles get small radii (banded branch)
            bli = (gi + 1).astype(F32)
            bri = (n_real - gi).astype(F32)
            bwall = w2 * jnp.minimum(bli * bli, bri * bri)
            bound = jnp.max(jnp.minimum(f_i, bwall), axis=1, keepdims=True)
        gap = _radius_gap(bound, minf_row)
        radius = _radius_from_gap(gap, w2, n)

        acc0 = jnp.full((block_rows, TILE), _INF, F32)

        # branches write out_ref instead of returning the tile (NB: this
        # does NOT dodge the round-5 dispatch tax — Mosaic charges the
        # (rows, TILE, TILE) body's footprint per construct instance for
        # scalar side-effecting conds too, measured 319 ms either way on
        # the all-banded probe; the real escape is the split dispatch,
        # which compiles the tile-pair body into a separate compacted
        # kernel — see minplus_pallas)
        def banded(_):
            # Rolling window: Mosaic vector loads must be 128-lane aligned,
            # so assemble the 3 aligned tiles covering
            # [i0 - TILE, i0 + 2*TILE), rotate once (dynamic) so the first
            # candidate window [i0 - radius, ...) sits at lane 0, then
            # advance with a static roll-by-1 per candidate offset.
            w0 = f_ref[:, pl.ds(HALO + i0 - TILE, TILE)]
            w2t = f_ref[:, pl.ds(HALO + i0 + TILE, TILE)]
            wide = jnp.concatenate([w0, f_i, w2t], axis=1)  # (BR, 3*TILE)
            # left-rotate by TILE - radius == right-rotate by 2*TILE + radius
            wide = pltpu.roll(wide, 2 * TILE + radius, axis=1)

            # Unrolled x4 to amortize loop overhead; the <= 3 offsets past
            # +radius that the ceil admits are genuine in-row candidates
            # (or INF halo), so scanning them never changes the min.
            unroll = 4

            def body(t, carry):
                acc, win = carry
                base = unroll * t - radius
                for u in range(unroll):
                    kk = (base + u).astype(F32)
                    acc = jnp.minimum(acc, win[:, :TILE] + w2 * (kk * kk))
                    win = pltpu.roll(win, 3 * TILE - 1, axis=1)  # left by 1
                return acc, win

            trips = (2 * radius + 1 + unroll - 1) // unroll
            acc, _ = lax.fori_loop(0, trips, body, (acc0, wide))
            out_ref[:, pl.ds(i0, TILE)] = acc
            return 0

        def tiled(_):
            j_lo = jnp.maximum(seg_lo, i0 - radius)
            j_hi = jnp.minimum(seg_hi, i0 + TILE + radius)
            jt_lo = jnp.maximum(j_lo // TILE, 0)
            jt_hi = jnp.minimum((j_hi + TILE - 1) // TILE, n_tiles)

            def per_candidate_tile(jt, acc):
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                d = dmat + (i0 - j0).astype(F32)
                quad = w2 * (d * d)  # (TILE, TILE)
                # cost[r, j, i]; min over sublane-axis j (elementwise mins)
                cost = f_j[:, :, None] + quad[None, :, :]
                return jnp.minimum(acc, jnp.min(cost, axis=1))

            out_ref[:, pl.ds(i0, TILE)] = lax.fori_loop(
                jt_lo, jt_hi, per_candidate_tile, acc0)
            return 0

        lax.cond(radius <= band_r, banded, tiled, 0)
        acc = out_ref[:, pl.ds(i0, TILE)]

        if walls:
            if masked:
                acc = jnp.minimum(acc, jnp.minimum(lwall, rwall))
            elif black_border:
                li = (gi + 1).astype(F32)
                ri = (n_real - gi).astype(F32)
                acc = jnp.minimum(acc, w2 * jnp.minimum(li * li, ri * ri))

        out_ref[:, pl.ds(i0, TILE)] = acc
        return 0

    lax.fori_loop(0, n_tiles, per_target_tile, 0)


def _pad_to(x, rows, cols, value, halo=0):
    R, n = x.shape
    if R == rows and n == cols and not halo:
        return x
    out = jnp.full((rows, cols + 2 * halo), value, x.dtype)
    return out.at[:R, halo:halo + n].set(x)


def minplus_pallas(f, seg_start, seg_end, w2, masked=True, interpret=False,
                   block_rows=MP_BLOCK_ROWS, walls=False, black_border=False,
                   band_r=None, row_sweep=False, split=None):
    """Min-plus over rows; f (R, n) f32 -> (R, n) f32.

    seg_start/seg_end: int32 per-voxel segment bounds along the row, used
    with masked=True to prune the candidate range (NOT to mask costs — see
    _minplus_kernel: callers must min in the wall parabolas afterward or
    pass walls=True to fuse them here, which makes per-cost masking
    redundant). With masked=False the whole row is one segment (binary fast
    path) and seg arrays are ignored.

    split (row-sweep kernel only): run the banded sweep in a kernel that
    carries NO tile-pair fallback (its mere static presence costs ~6x the
    sweep on v5e — see _minplus_rowsweep_kernel), plus an XLA-level
    lax.cond that re-runs the full kernel only when some tile's pruning
    radius exceeds band_r. None -> EDT_TPU_SPLIT_TILED env (default on;
    resolved at trace time like the other sweep knobs). band_r defaults to
    HALO in split mode (the sweep can cover any radius up to the halo
    width exactly, and a wider band only costs blocks that need it —
    trip counts are per-block dynamic) and BAND_MAX_R otherwise.
    """
    import os

    R, n = f.shape
    n_tiles = max(1, -(-n // TILE))
    # the sweep's static tile loop unrolls n_tiles times per offset step;
    # cap it so very long rows keep the per-tile kernel
    if n_tiles > 16:
        row_sweep = False
    if split is None:
        split = os.environ.get("EDT_TPU_SPLIT_TILED", "0") == "1"
    split = bool(split) and bool(row_sweep)
    if band_r is None:
        band_r = HALO if split else BAND_MAX_R
    return _minplus_pallas_jit(
        f, seg_start, seg_end, w2, masked=masked, interpret=interpret,
        block_rows=block_rows, walls=walls, black_border=black_border,
        band_r=band_r, row_sweep=row_sweep, split=split)


@functools.partial(
    jax.jit, static_argnames=("masked", "interpret", "block_rows", "walls",
                              "black_border", "band_r", "row_sweep", "split")
)
def _minplus_pallas_jit(f, seg_start, seg_end, w2, masked, interpret,
                        block_rows, walls, black_border, band_r, row_sweep,
                        split):
    R, n = f.shape
    n_tiles = max(1, -(-n // TILE))
    Rp = -(-R // block_rows) * block_rows
    np_ = n_tiles * TILE
    # banded evaluations reach at most HALO lanes past a tile (whole-row
    # rolls) / TILE lanes (3-tile windows, TILE == HALO); beyond that the
    # rolls wrap REAL f values back at understated offsets. Clamp so every
    # band_r value stays exact — larger radii take the tile-pair scan.
    band_r = min(band_r, HALO)

    fp = _pad_to(f.astype(F32), Rp, np_, _INF, halo=HALO)
    w2v = jnp.asarray(w2, F32).reshape(1)
    nrv = jnp.asarray(n, I32).reshape(1)

    kw = dict(n_tiles=n_tiles, masked=masked, block_rows=block_rows,
              walls=walls, black_border=black_border, band_r=band_r)
    grid = (Rp // block_rows,)
    n_blocks = Rp // block_rows
    row_spec = pl.BlockSpec((block_rows, np_), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((block_rows, np_ + 2 * HALO), lambda r: (r, 0),
                          memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((8, TILE), lambda r: (r, 0),
                             memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    base = _minplus_rowsweep_kernel if row_sweep else _minplus_kernel
    if masked:
        # int16 bound streams when positions fit: halves their HBM traffic
        # (kernels widen to i32 in-register at load)
        sdt = jnp.int16 if n <= 32767 else I32
        ssp = _pad_to(seg_start.astype(sdt), Rp, np_, -1)
        sep = _pad_to(seg_end.astype(sdt), Rp, np_, 0)
        in_specs = [scalar_spec, scalar_spec, f_spec, row_spec, row_spec]
        args = (w2v, nrv, fp, ssp, sep)
    else:
        in_specs = [scalar_spec, scalar_spec, f_spec]
        args = (w2v, nrv, fp)

    def make_kernel(do_split):
        k = functools.partial(base, split=do_split, **kw) if row_sweep \
            else functools.partial(base, **kw)
        if masked:
            return k

        def unmasked(w2_ref, nreal_ref, f_ref, out_ref, *scr):
            k(w2_ref, nreal_ref, f_ref, None, None, out_ref, *scr)

        return unmasked

    def call(do_split):
        scratch = [pltpu.SMEM((n_tiles,), jnp.int32)] if row_sweep else []
        out_specs = (row_spec, flag_spec) if do_split else row_spec
        out_shape = jax.ShapeDtypeStruct((Rp, np_), F32)
        if do_split:
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((8 * n_blocks, TILE), I32))
        return pl.pallas_call(
            make_kernel(do_split),
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*args)

    if split:
        out, flag = call(True)
        fb = flag[::8, 0] > 0  # (n_blocks,) some tile radius > band_r
        count = jnp.sum(fb.astype(I32))
        C = _fixup_capacity(n_blocks)
        # stable partition permutation: flagged block ids first (ascending),
        # unflagged after — a cumsum scatter, cheaper than argsort
        csum_f = jnp.cumsum(fb.astype(I32))
        pos = jnp.where(fb, csum_f - 1,
                        count + jnp.cumsum(jnp.logical_not(fb).astype(I32))
                        - 1)
        order = jnp.zeros((n_blocks,), I32).at[pos].set(
            jnp.arange(n_blocks, dtype=I32))

        fixk = functools.partial(
            _minplus_fixup_kernel, n_tiles=n_tiles, masked=masked,
            block_rows=block_rows, walls=walls,
            black_border=black_border, band_r=band_r)
        if masked:
            fix_kernel = fixk
        else:
            def fix_kernel(idx_ref, w2_ref, nreal_ref, f_ref, prev_ref,
                           out_ref):
                fixk(idx_ref, w2_ref, nreal_ref, f_ref, None, None,
                     prev_ref, out_ref)

        def bmap(g, idx_ref):
            return (idx_ref[g], 0)

        fix_in = [scalar_spec, scalar_spec,
                  pl.BlockSpec((block_rows, np_ + 2 * HALO), bmap,
                               memory_space=pltpu.VMEM)]
        if masked:
            fix_in += [pl.BlockSpec((block_rows, np_), bmap,
                                    memory_space=pltpu.VMEM)] * 2
        fix_in.append(pl.BlockSpec((block_rows, np_), bmap,
                                   memory_space=pltpu.VMEM))
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(C,),
            in_specs=fix_in,
            out_specs=pl.BlockSpec((block_rows, np_),
                                   lambda g, idx_ref: (g, 0),
                                   memory_space=pltpu.VMEM),
        )

        # lax.while_loop, NOT lax.cond: on this backend a cond executes
        # BOTH branches (measured: an untaken full-kernel branch cost its
        # full 320 ms — PARITY.md round-5), while loop bodies cannot be
        # flattened, so count == 0 volumes skip the fixup entirely and
        # volumes with > C flagged blocks iterate until covered (each
        # C-chunk of the partition; padding entries are pure copies).
        def cond_fn(carry):
            i, _ = carry
            return i * C < count

        def body_fn(carry):
            i, cur = carry
            idx = lax.dynamic_slice_in_dim(order, i * C, C)
            fixed = pl.pallas_call(
                fix_kernel, grid_spec=gs,
                out_shape=jax.ShapeDtypeStruct((C * block_rows, np_), F32),
                interpret=interpret,
            )(idx, *args, cur)
            fixed = fixed.reshape(C, block_rows, np_)
            cur = (cur.reshape(n_blocks, block_rows, np_)
                   .at[idx].set(fixed).reshape(Rp, np_))
            return i + 1, cur

        _, out = lax.while_loop(cond_fn, body_fn, (jnp.int32(0), out))
    else:
        out = call(False)
    return out[:R, :n]


def _fixup_capacity(n_blocks):
    """Compaction capacity of the split dispatch's fixup pass: the fixup
    kernel's footprint cost scales with the blocks it VISITS, so gather
    only the flagged ones (plus harmless unflagged padding). More flagged
    blocks than this -> the whole volume re-runs the fused kernel (rare:
    the capacity covers 1/8 of the volume; fields that exceed it are
    exactly the sparse regime the fused kernel's tiled branch was shaped
    for). Module-level so tests can exercise the overflow path."""
    return min(n_blocks, max(64, n_blocks // 8))


def _minplus_fixup_kernel(idx_ref, w2_ref, nreal_ref, f_ref, ss_ref, se_ref,
                          prev_ref, out_ref, *, n_tiles, masked, block_rows,
                          walls, black_border, band_r):
    """Compacted tile-pair recompute for blocks the split row-sweep kernel
    flagged (some tile's pruning radius > band_r). One grid step per
    GATHERED block (scalar-prefetched block indices; padding entries point
    at unflagged blocks and reduce to pure copies). Tiles within the band
    copy the banded result through; flagged tiles are overwritten by the
    pruned tile-pair scan with the wall epilogue re-applied — this is the
    ONLY kernel in the split dispatch carrying the big tile-pair body, so
    its footprint cost (the round-5 ~9 µs/instance dispatch tax) is paid
    on the C gathered blocks instead of the whole volume."""
    del idx_ref  # consumed by the index maps
    if ss_ref is None:
        ss_ref = se_ref = f_ref  # unused placeholders
    w2 = w2_ref[0]
    n_real = nreal_ref[0]
    n = n_tiles * TILE
    lanes = lax.broadcasted_iota(I32, (1, TILE), 1)
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (jj - ii).astype(F32)

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)

    def per_target_tile(it, _):
        i0 = it * TILE
        f_i = f_ref[:, pl.ds(HALO + i0, TILE)]
        gi = lanes + i0
        lwall = rwall = None
        if masked:
            ss_i = ss_ref[:, pl.ds(i0, TILE)].astype(I32)
            se_i = se_ref[:, pl.ds(i0, TILE)].astype(I32)
            seg_lo = jnp.min(ss_i)
            seg_hi = jnp.max(se_i)
        else:
            seg_lo = jnp.int32(0)
            seg_hi = jnp.int32(n)
        bound = jnp.max(f_i, axis=1, keepdims=True)
        if walls and masked:
            li = (gi - ss_i + 1).astype(F32)
            ri = (se_i - gi).astype(F32)
            lwall = w2 * (li * li)
            rwall = w2 * (ri * ri)
            if not black_border:
                lwall = jnp.where(ss_i > 0, lwall, _INF)
                rwall = jnp.where(se_i < n_real, rwall, _INF)
            bound = jnp.max(jnp.minimum(f_i, jnp.minimum(lwall, rwall)),
                            axis=1, keepdims=True)
        elif walls and black_border:
            bli = (gi + 1).astype(F32)
            bri = (n_real - gi).astype(F32)
            bwall = w2 * jnp.minimum(bli * bli, bri * bri)
            bound = jnp.max(jnp.minimum(f_i, bwall), axis=1, keepdims=True)
        radius = _radius_from_gap(_radius_gap(bound, minf_row), w2, n)

        def fixtile(_):
            j_lo = jnp.maximum(seg_lo, i0 - radius)
            j_hi = jnp.minimum(seg_hi, i0 + TILE + radius)
            jt_lo = jnp.maximum(j_lo // TILE, 0)
            jt_hi = jnp.minimum((j_hi + TILE - 1) // TILE, n_tiles)

            def per_candidate_tile(jt, acc):
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                d = dmat + (i0 - j0).astype(F32)
                quad = w2 * (d * d)
                cost = f_j[:, :, None] + quad[None, :, :]
                return jnp.minimum(acc, jnp.min(cost, axis=1))

            acc = lax.fori_loop(jt_lo, jt_hi, per_candidate_tile,
                                jnp.full((block_rows, TILE), _INF, F32))
            if walls:
                if masked:
                    acc = jnp.minimum(acc, jnp.minimum(lwall, rwall))
                elif black_border:
                    bli = (gi + 1).astype(F32)
                    bri = (n_real - gi).astype(F32)
                    acc = jnp.minimum(acc,
                                      w2 * jnp.minimum(bli * bli, bri * bri))
            out_ref[:, pl.ds(i0, TILE)] = acc
            return 0

        def copy(_):
            out_ref[:, pl.ds(i0, TILE)] = prev_ref[:, pl.ds(i0, TILE)]
            return 0

        lax.cond(radius > band_r, fixtile, copy, 0)
        return 0

    lax.fori_loop(0, n_tiles, per_target_tile, 0)


def _minplus_rowsweep_kernel(w2_ref, nreal_ref, f_ref, ss_ref, se_ref,
                             out_ref, *rest, n_tiles, masked,
                             block_rows=MP_BLOCK_ROWS, walls=False,
                             black_border=False, band_r=BAND_MAX_R,
                             split=False):
    """Offset-major variant of _minplus_kernel: the banded evaluation rolls
    the WHOLE padded row once per offset and min-updates every target tile,
    instead of rolling a 3-tile window per tile — halves roll traffic when
    several tiles take the band (rolls dominate the banded step cost).
    Extra offsets beyond a tile's own radius are genuine candidates, so
    sweeping every banded tile at the block's max banded radius stays
    exact. Tiles whose radius exceeds band_r are recomputed by the pruned
    tile-pair scan afterwards, and the wall epilogue applies at the end.

    split=True (the production default, see minplus_pallas): the tile-pair
    fallback is NOT in this kernel at all. Measured on v5e (PARITY.md
    round-5 sweep anatomy): any per-tile dynamic construct whose body
    holds the (rows, TILE, TILE) tile-pair work costs ~9 µs per static
    instance even when never executed — for value-returning AND
    side-effect-only conds alike — which made the in-kernel dispatch ~6x
    the sweep it guards. In split mode this kernel only runs phases 1/2
    plus the small-bodied wall epilogue and emits a per-block i32 flag
    (second output) = "some tile's radius exceeds band_r"; the caller
    routes flagged blocks to the compacted fixup kernel via an XLA-level
    lax.while_loop (a lax.cond would execute its pallas branch even when
    untaken — measured), so typical volumes never pay the footprint.
    """
    if split:
        flag_ref, rad_ref = rest
    else:
        (rad_ref,) = rest
    if ss_ref is None:
        ss_ref = se_ref = f_ref  # unused placeholders
    w2 = w2_ref[0]
    n_real = nreal_ref[0]
    n = n_tiles * TILE
    width = n + 2 * HALO
    lanes = lax.broadcasted_iota(I32, (1, TILE), 1)
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (jj - ii).astype(F32)

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)

    # ---- phase 1: per-tile radii (stored in SMEM scratch) ----
    # rmax starts at -1 so "some tile is banded with radius 0" (constant
    # rows — e.g. the all-ones cube's interior) still runs the k=0 sweep
    # step; rmax stays -1 only when every tile goes tiled. rall tracks the
    # unclamped maximum for split mode's needs-fallback flag.
    def calc_radius(it, carry):
        rmax, rall = carry
        i0 = it * TILE
        f_i = f_ref[:, pl.ds(HALO + i0, TILE)]
        gi = lanes + i0
        bound = jnp.max(f_i, axis=1, keepdims=True)
        if walls and masked:
            ss_i = ss_ref[:, pl.ds(i0, TILE)].astype(I32)
            se_i = se_ref[:, pl.ds(i0, TILE)].astype(I32)
            li = (gi - ss_i + 1).astype(F32)
            ri = (se_i - gi).astype(F32)
            lwall = w2 * (li * li)
            rwall = w2 * (ri * ri)
            if not black_border:
                lwall = jnp.where(ss_i > 0, lwall, _INF)
                rwall = jnp.where(se_i < n_real, rwall, _INF)
            bound = jnp.max(jnp.minimum(f_i, jnp.minimum(lwall, rwall)),
                            axis=1, keepdims=True)
        elif walls and black_border:
            bli = (gi + 1).astype(F32)
            bri = (n_real - gi).astype(F32)
            bwall = w2 * jnp.minimum(bli * bli, bri * bri)
            bound = jnp.max(jnp.minimum(f_i, bwall), axis=1, keepdims=True)
        radius = _radius_from_gap(_radius_gap(bound, minf_row), w2, n)
        rad_ref[it] = radius
        return (jnp.maximum(rmax, jnp.where(radius <= band_r, radius, -1)),
                jnp.maximum(rall, radius))

    rmax, rall = lax.fori_loop(0, n_tiles, calc_radius,
                               (jnp.int32(-1), jnp.int32(0)))

    # ---- phase 2: whole-row banded sweep over [-rmax, rmax] ----
    def init_tile(it, _):
        out_ref[:, pl.ds(it * TILE, TILE)] = jnp.full(
            (block_rows, TILE), _INF, F32)
        return 0

    lax.fori_loop(0, n_tiles, init_tile, 0)

    def sweep(_):
        w0 = f_ref[:, :]  # (block_rows, width) value copy
        # align so slice [t*T : t*T+T] holds f[i + kk] for kk = -rmax
        wk = pltpu.roll(w0, rmax + (width - HALO), axis=1)

        def body(k, wk):
            kk = (k - rmax).astype(F32)
            q = w2 * (kk * kk)
            # n_tiles is static, so the tile loop unrolls with static
            # value slices (Mosaic cannot dynamic-slice values)
            for it in range(n_tiles):
                sl = pl.ds(it * TILE, TILE)
                cand = wk[:, it * TILE:(it + 1) * TILE]
                out_ref[:, sl] = jnp.minimum(out_ref[:, sl], cand + q)
            return pltpu.roll(wk, width - 1, axis=1)  # advance kk by 1

        lax.fori_loop(0, 2 * rmax + 1, body, wk)
        return 0

    lax.cond(rmax >= 0, sweep, lambda _: 0, 0)

    # ---- phase 3: tiled recompute for large-radius tiles + wall epilogue ----
    # (split mode: no tiled branch here — the flag output routes blocks
    # that would need it to a separate full-kernel dispatch)
    def per_target_tile(it, _):
        i0 = it * TILE
        gi = lanes + i0
        if masked and (not split or walls):
            ss_i = ss_ref[:, pl.ds(i0, TILE)].astype(I32)
            se_i = se_ref[:, pl.ds(i0, TILE)].astype(I32)
        if not split:
            radius = rad_ref[it]
            if masked:
                seg_lo = jnp.min(ss_i)
                seg_hi = jnp.max(se_i)
            else:
                seg_lo = jnp.int32(0)
                seg_hi = jnp.int32(n)

            # side-effect-only cond; NB: Mosaic still charges the
            # (rows, TILE, TILE) body's footprint per tile instance even
            # when the branch never runs (measured 319 ms on the
            # all-banded probe for value-returning AND side-effecting
            # shapes alike — PARITY.md round-5). This non-split kernel is
            # the fallback/knob path; the production escape is split mode,
            # where the tile-pair body lives only in the compacted fixup
            # kernel. The tiled branch overwrites the partial sweep values
            # in out_ref; banded tiles skip it.
            def tiled(_):
                j_lo = jnp.maximum(seg_lo, i0 - radius)
                j_hi = jnp.minimum(seg_hi, i0 + TILE + radius)
                jt_lo = jnp.maximum(j_lo // TILE, 0)
                jt_hi = jnp.minimum((j_hi + TILE - 1) // TILE, n_tiles)

                def per_candidate_tile(jt, acc):
                    j0 = jt * TILE
                    f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                    d = dmat + (i0 - j0).astype(F32)
                    quad = w2 * (d * d)
                    cost = f_j[:, :, None] + quad[None, :, :]
                    return jnp.minimum(acc, jnp.min(cost, axis=1))

                out_ref[:, pl.ds(i0, TILE)] = lax.fori_loop(
                    jt_lo, jt_hi, per_candidate_tile,
                    jnp.full((block_rows, TILE), _INF, F32))
                return 0

            lax.cond(radius > band_r, tiled, lambda _: 0, 0)
        acc = out_ref[:, pl.ds(i0, TILE)]

        if walls:
            if masked:
                li = (gi - ss_i + 1).astype(F32)
                ri = (se_i - gi).astype(F32)
                lwall = w2 * (li * li)
                rwall = w2 * (ri * ri)
                if not black_border:
                    lwall = jnp.where(ss_i > 0, lwall, _INF)
                    rwall = jnp.where(se_i < n_real, rwall, _INF)
                acc = jnp.minimum(acc, jnp.minimum(lwall, rwall))
            elif black_border:
                li = (gi + 1).astype(F32)
                ri = (n_real - gi).astype(F32)
                acc = jnp.minimum(acc, w2 * jnp.minimum(li * li, ri * ri))

        out_ref[:, pl.ds(i0, TILE)] = acc
        return 0

    lax.fori_loop(0, n_tiles, per_target_tile, 0)

    if split:
        # one native (8, 128) tile per block (Mosaic's minimum VMEM block);
        # the caller reads column 0
        flag_ref[:, :] = jnp.broadcast_to(
            (rall > band_r).astype(I32), (8, TILE))


# ---------------------------------------------------------------------------
# Min-plus with argmin — the forward pass of the differentiable (soft) EDT
# at temperature 0 (edt_tpu.models.soft). Unmasked, no walls; returns the
# winning candidate index per voxel so the custom VJP can scatter
# cotangents with O(voxels) residual memory. Leftmost argmin on ties,
# matching jnp.argmin (the jnp oracle path).
# ---------------------------------------------------------------------------


def _wall_tile(walls_ref, sl, w2, wall_sent):
    """Load one wall tile. wall_sent None: walls are f32 squared distances
    (INF = open). Else: walls are integer COUNTS (distance in voxels;
    >= wall_sent = open) and the f32 w2*cnt^2 is formed in-register — the
    count stream is half (int16) the f32 walls stream in HBM."""
    w = walls_ref[:, sl]
    if wall_sent is None:
        return w
    c = w.astype(F32)
    # compare on the widened f32 copy: v5e Mosaic rejects ordered vector
    # compares at i16 ("Target does not support this comparison"). Exact
    # for both count dtypes: int16 counts are <= 16000 (guarded upstream),
    # and the int32 path's real counts are <= n+1 << 2^24 with sentinel
    # WALL_SENT32 = 2^30 exactly f32-representable (any count >= sentinel
    # rounds to a float >= it, so the >= test cannot misclassify)
    return jnp.where(c >= wall_sent, _INF, w2 * c * c)


def _minplus_argmin_kernel(w2_ref, f_ref, *rest, n_tiles,
                           block_rows, arg_band_r=48, walled=False,
                           wall_sent=None, off_dtype=None):
    if walled:
        walls_ref, out_ref, arg_ref = rest
    else:
        walls_ref = None
        out_ref, arg_ref = rest
    w2 = w2_ref[0]
    n = n_tiles * TILE
    # (TILE, TILE) [j, i] = i - j; candidates j on SUBLANES, targets i on
    # lanes, so both the min and the argmin-select reduce down the cheap
    # sublane axis (lane reductions are far slower on the VPU).
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    dmat = (ii - jj).astype(F32)
    jsub = lax.broadcasted_iota(I32, (1, TILE, 1), 1)

    ilanes = lax.broadcasted_iota(I32, (1, TILE), 1)

    # Per-row f floor: winners (and all their ties) satisfy
    # w2 (i - j)^2 <= dhat_i - minf_row (see _minplus_kernel) — on barrier-
    # height fields this collapses solid regions to the banded branch.
    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)

    def per_target_tile(it, _):
        i0 = it * TILE
        f_i = f_ref[:, pl.ds(HALO + i0, TILE)]

        # Banded pass with argmin over |k| <= R0, scanning k in LEFTMOST-j
        # order (k = -R0 .. R0) with strict improvement so ties resolve to
        # the lowest j like jnp.argmin. Soft-EDT height fields carry
        # barrier-sized values (a bound from f_i alone would force a full
        # scan), but max_i d_hat bounds every winning offset:
        # w^2 (i-j*)^2 <= d_i <= d_hat_i. If that shows radius <= R0, the
        # band already saw every possible winner and we are done — the
        # common case on realistic occupancy fields; otherwise fall back to
        # the full tile-pair scan.
        R0 = 16
        w0 = f_ref[:, pl.ds(HALO + i0 - TILE, TILE)]
        w2t = f_ref[:, pl.ds(HALO + i0 + TILE, TILE)]
        wide0 = jnp.concatenate([w0, f_i, w2t], axis=1)
        wide = pltpu.roll(wide0, 2 * TILE + R0, axis=1)  # left by TILE - R0
        dhat = jnp.full(f_i.shape, _INF, F32)
        ahat = jnp.zeros(f_i.shape, I32)
        for k in range(2 * R0 + 1):
            kk = jnp.float32(k - R0)
            cand = wide[:, :TILE] + w2 * (kk * kk)
            better = cand < dhat
            dhat = jnp.where(better, cand, dhat)
            ahat = jnp.where(better, ilanes + (i0 + k - R0), ahat)
            wide = pltpu.roll(wide, 3 * TILE - 1, axis=1)  # left by 1
        # clamp: padded-halo winners only occur for all-INF rows
        ahat = jnp.clip(ahat, 0, n - 1)

        wall_i = (_wall_tile(walls_ref, pl.ds(i0, TILE), w2, wall_sent)
                  if walled else None)
        dcap = jnp.minimum(dhat, wall_i) if walled else dhat
        gap = _radius_gap(jnp.max(dcap, axis=1, keepdims=True), minf_row)
        radius = _radius_from_gap(gap, w2, n)

        def banded_done(_):
            return dhat, ahat

        def banded_scan(rw):
            # dynamic-radius banded argmin rescan over [-rw, rw] in
            # leftmost-j order with strict improvement (restart from INF so
            # tie order is globally ascending). O(rw)/voxel.
            wideb = pltpu.roll(wide0, 2 * TILE + rw, axis=1)

            def body(k, carry):
                best, arg, win = carry
                kk = (k - rw).astype(F32)
                cand = win[:, :TILE] + w2 * (kk * kk)
                better = cand < best
                best = jnp.where(better, cand, best)
                arg = jnp.where(better, ilanes + (i0 + k - rw), arg)
                return best, arg, pltpu.roll(win, 3 * TILE - 1, axis=1)

            best0 = jnp.full((block_rows, TILE), _INF, F32)
            arg0 = jnp.zeros((block_rows, TILE), I32)
            best, arg, _ = lax.fori_loop(0, 2 * rw + 1, body,
                                         (best0, arg0, wideb))
            return best, jnp.clip(arg, 0, n - 1)

        def tiled_scan(r, ub):
            # full rescan from INF over [i0 - r, i0 + TILE + r): tiles are
            # visited ascending with strict <, so ties stay leftmost.
            # Tile-minima skip: a candidate tile whose cheapest possible
            # cost min(f_J) + w2 * tilegap^2 exceeds ub (an upper bound on
            # every d_i in the target tile) cannot win OR tie — on
            # barrier-height fields most candidate tiles are all-barrier
            # and skip, leaving only the source-bearing tiles to pay the
            # (rows, 128, 128) work.
            jt_lo = jnp.maximum((i0 - r) // TILE, 0)
            jt_hi = jnp.minimum((i0 + TILE + r + TILE - 1) // TILE, n_tiles)

            def per_candidate_tile(jt, carry):
                best, arg = carry
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                tilegap = jnp.maximum(jnp.abs(i0 - j0) - TILE + 1, 0
                                      ).astype(F32)
                lo_cost = jnp.min(f_j) + w2 * tilegap * tilegap

                def work(carry):
                    best, arg = carry
                    d = dmat + (i0 - j0).astype(F32)
                    quad = w2 * (d * d)
                    cost = f_j[:, :, None] + quad[None, :, :]  # (BR,T_j,T_i)
                    tile_best = jnp.min(cost, axis=1)
                    tile_arg = jnp.min(
                        jnp.where(cost == tile_best[:, None, :], jsub + j0,
                                  n),
                        axis=1,
                    )
                    # strict < keeps the leftmost tile's winner on ties
                    better = tile_best < best
                    return (jnp.where(better, tile_best, best),
                            jnp.where(better, tile_arg, arg))

                return lax.cond(lo_cost > ub, lambda c: c, work, (best, arg))

            best0 = jnp.full((block_rows, TILE), _INF, F32)
            arg0 = jnp.zeros((block_rows, TILE), I32)
            return lax.fori_loop(jt_lo, jt_hi, per_candidate_tile,
                                 (best0, arg0))

        def wide_then_maybe_tiled(_):
            # Two-stage refinement: the +-R0 probe cannot distinguish
            # "winning offset is huge" from "source just beyond the probe
            # under a barrier-height f" (dhat stays at the barrier, wildly
            # inflating the radius). A wide band scan up to a tile tightens
            # dhat to the true d wherever links are <= rw; the radius
            # recomputed from that is the real one, and only tiles with
            # genuinely long links fall through to the tile-pair scan.
            rw = jnp.minimum(radius, jnp.int32(min(arg_band_r, TILE)))
            best2, arg2 = banded_scan(rw)
            bcap = jnp.minimum(best2, wall_i) if walled else best2
            gap2 = _radius_gap(jnp.max(bcap, axis=1, keepdims=True),
                               minf_row)
            r2 = _radius_from_gap(gap2, w2, n)
            return lax.cond(
                r2 <= rw,
                lambda _: (best2, arg2),
                lambda _: tiled_scan(r2, jnp.max(bcap)),
                0,
            )

        best, arg = lax.cond(radius <= R0, banded_done,
                             wide_then_maybe_tiled, 0)
        ww = None
        if walled:
            ww = wall_i < best  # ties stay with the min-plus candidate
            best = jnp.where(ww, wall_i, best)
        out_ref[:, pl.ds(i0, TILE)] = best
        if off_dtype is not None:
            off = arg - (ilanes + i0)
            if ww is not None:
                off = jnp.where(ww, jnp.int32(jnp.iinfo(off_dtype).min),
                                off)
            arg_ref[:, pl.ds(i0, TILE)] = off.astype(off_dtype)
        else:
            if ww is not None:
                arg = jnp.where(ww, -(ilanes + i0) - 1, arg)
            arg_ref[:, pl.ds(i0, TILE)] = arg
        return 0

    lax.fori_loop(0, n_tiles, per_target_tile, 0)


def _minplus_argmin_rowsweep_kernel(w2_ref, f_ref, *rest,
                                    n_tiles, block_rows, arg_band_r=64,
                                    probe_r=16, walled=False,
                                    wall_sent=None, off_dtype=None,
                                    dyn_probe=False, off_track=False,
                                    split=False):
    """Offset-major argmin variant: whole-row rolls shared across tiles.

    Probe sweep (+-probe_r, ascending k, strict < -> leftmost ties), then
    per-tile radii from the probed minima; tiles needing more scan an
    extension sweep out to min(radius, arg_band_r) — the left chunk runs
    DESCENDING k with <= so equal-cost smaller-j candidates still win,
    the right chunk ascending with strict < — then radii recompute from
    the refined minima and only genuinely long-link tiles pay the pruned
    tile-pair scan (with tile-minima skipping).

    walled=True streams a per-voxel constant upper bound ("wall" — the
    multi-label boundary parabolas) that (a) caps every radius estimate —
    barrier-height rows with no nearby source would otherwise explode the
    scan — and (b) is min'd into the output in-kernel, with wall wins
    (strictly below every candidate) encoded as arg = ~i so the VJP can
    route their cotangents to the constant instead of a candidate.

    dyn_probe=True: the probe radius itself becomes dynamic —
    min(probe_r, radius from the RAW per-tile bounds max min(f, wall)),
    computed before any sweep. The k = 0 candidate already bounds d by
    f[i] (and the wall bounds it too), so the raw radius is a valid
    winning-offset bound; whenever it undershoots probe_r (later passes
    of a composed transform, whose heights are real finite distances —
    e.g. the z pass at 30x pitch needs ~±4) the probe shrinks to match
    instead of paying the fixed ±probe_r floor. Barrier-height fields
    keep an infinite raw radius and probe the full ±probe_r exactly as
    before. Exact for every input either way.

    split=True: the tile-pair fallback branch is compiled OUT of this
    kernel (its static presence alone costs ~9 µs per tile instance on
    v5e — see _minplus_rowsweep_kernel); tiles whose refined radius
    exceeds the swept band raise a per-block flag (third output) and the
    caller re-dispatches the full kernel under an XLA-level lax.cond.
    """
    idx = 0
    walls_ref = None
    if walled:
        walls_ref = rest[idx]
        idx += 1
    out_ref, arg_out_ref = rest[idx], rest[idx + 1]
    idx += 2
    flag_ref = None
    if split:
        flag_ref = rest[idx]
        idx += 1
    rad_ref = rest[idx]
    # emit_offsets mode: absolute winner indices accumulate in an i32 VMEM
    # scratch; the epilogue writes narrow offset residuals to arg_out_ref
    # (the VJP residual stream halves and the XLA argj -> o conversion
    # pass disappears)
    arg_ref = rest[-1] if off_dtype is not None else arg_out_ref
    w2 = w2_ref[0]
    n = n_tiles * TILE
    width = n + 2 * HALO
    lanes = lax.broadcasted_iota(I32, (1, TILE), 1)
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    dmat = (ii - jj).astype(F32)  # [j, i] = i - j
    jsub = lax.broadcasted_iota(I32, (1, TILE, 1), 1)

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)
    w0 = f_ref[:, :]

    for it in range(n_tiles):
        sl = pl.ds(it * TILE, TILE)
        out_ref[:, sl] = jnp.full((block_rows, TILE), _INF, F32)
        arg_ref[:, sl] = jnp.zeros((block_rows, TILE), I32)

    def upd_tiles(wk, kk_i32, cmp_le):
        """One offset step: min-update every tile from wk (ungated across
        tiles — per-(offset, tile) scalar conds measured slower than just
        doing the (rows, TILE) update). off_track: the sweeps record the
        winning OFFSET kk (a broadcast scalar select) instead of the
        absolute index — drops the lanes + i0 + kk vector add from every
        (offset, tile) step; the epilogue reconstructs absolutes once."""
        q = w2 * (kk_i32.astype(F32) ** 2)
        for it in range(n_tiles):
            sl = pl.ds(it * TILE, TILE)
            cand = wk[:, it * TILE:(it + 1) * TILE] + q
            best = out_ref[:, sl]
            better = (cand <= best) if cmp_le else (cand < best)
            out_ref[:, sl] = jnp.where(better, cand, best)
            win = (kk_i32 if off_track
                   else lanes + (it * TILE) + kk_i32)
            arg_ref[:, sl] = jnp.where(better, win, arg_ref[:, sl])

    # ---- probe radius ----
    if dyn_probe:
        # raw bound: d[i] <= min(f[i], wall[i]) (k = 0 candidate / wall
        # clamp), so max over the tile of that min bounds every winning
        # offset before any sweep runs
        def raw_body(it, mx):
            t = f_ref[:, pl.ds(HALO + it * TILE, TILE)]
            if walled:
                t = jnp.minimum(t, _wall_tile(walls_ref,
                                              pl.ds(it * TILE, TILE),
                                              w2, wall_sent))
            bound = jnp.max(t, axis=1, keepdims=True)
            r0 = _radius_from_gap(_radius_gap(bound, minf_row), w2, n)
            return jnp.maximum(mx, jnp.minimum(r0, jnp.int32(probe_r)))

        rp = lax.fori_loop(0, n_tiles, raw_body, jnp.int32(0))
    else:
        rp = jnp.int32(probe_r)

    # ---- probe sweep ----
    wk = pltpu.roll(w0, rp + (width - HALO), axis=1)

    def probe_body(k, wk):
        upd_tiles(wk, k - rp, cmp_le=False)
        return pltpu.roll(wk, width - 1, axis=1)

    lax.fori_loop(0, 2 * rp + 1, probe_body, wk)

    def calc_radius(store):
        def body(it, ext_max):
            t = out_ref[:, pl.ds(it * TILE, TILE)]
            if walled:
                # the final value is min'd with the wall, so only
                # candidates beating the wall matter for the radius
                t = jnp.minimum(t, _wall_tile(walls_ref,
                                              pl.ds(it * TILE, TILE),
                                              w2, wall_sent))
            bound = jnp.max(t, axis=1, keepdims=True)
            radius = _radius_from_gap(_radius_gap(bound, minf_row), w2, n)
            if store:
                rad_ref[it] = radius
            return jnp.maximum(
                ext_max,
                jnp.where(radius > rp,
                          jnp.minimum(radius, jnp.int32(arg_band_r)),
                          0),
            )

        return lax.fori_loop(0, n_tiles, body, jnp.int32(0))

    rmax_ext = calc_radius(store=True)

    # ---- extension sweeps (gated per tile on "probe was not enough") ----
    def extend(_):
        # ungated across tiles: candidates beyond a probe-complete tile's
        # radius can never win or tie, and per-(offset, tile) scalar conds
        # measured slower than just doing the (rows, 128) update
        # left chunk: kk descending from -(rp+1) to -rmax_ext, <=
        wl = pltpu.roll(w0, (rp + 1) + (width - HALO), axis=1)

        def left_body(k, wl):
            upd_tiles(wl, -(rp + 1) - k, cmp_le=True)
            return pltpu.roll(wl, 1, axis=1)

        lax.fori_loop(0, rmax_ext - rp, left_body, wl)

        # right chunk: kk ascending from rp+1 to rmax_ext, strict <
        wr = pltpu.roll(w0, (width - HALO) - (rp + 1), axis=1)

        def right_body(k, wr):
            upd_tiles(wr, (rp + 1) + k, cmp_le=False)
            return pltpu.roll(wr, width - 1, axis=1)

        lax.fori_loop(0, rmax_ext - rp, right_body, wr)
        return 0

    lax.cond(rmax_ext > rp, extend, lambda _: 0, 0)

    # radii recompute from refined minima (barrier-inflated estimates drop)
    calc_radius(store=True)

    # ---- tile-pair scan for tiles whose refined radius exceeds the sweep --
    swept = jnp.maximum(jnp.minimum(jnp.int32(arg_band_r), rmax_ext), rp)

    def per_target_tile(it, need):
        i0 = it * TILE
        radius = rad_ref[it]

        def tiled(_):
            cur = out_ref[:, pl.ds(i0, TILE)]
            if walled:
                cur = jnp.minimum(cur, _wall_tile(walls_ref, pl.ds(i0, TILE),
                                                  w2, wall_sent))
            ub = jnp.max(cur)
            jt_lo = jnp.maximum((i0 - radius) // TILE, 0)
            jt_hi = jnp.minimum((i0 + TILE + radius + TILE - 1) // TILE,
                                n_tiles)

            def per_candidate_tile(jt, carry):
                best, arg = carry
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                tg = jnp.maximum(jnp.abs(i0 - j0) - TILE + 1, 0).astype(F32)
                lo_cost = jnp.min(f_j) + w2 * tg * tg

                def work(carry):
                    best, arg = carry
                    d = dmat + (i0 - j0).astype(F32)
                    quad = w2 * (d * d)
                    cost = f_j[:, :, None] + quad[None, :, :]
                    tile_best = jnp.min(cost, axis=1)
                    tile_arg = jnp.min(
                        jnp.where(cost == tile_best[:, None, :], jsub + j0,
                                  n),
                        axis=1,
                    )
                    better = tile_best < best
                    return (jnp.where(better, tile_best, best),
                            jnp.where(better, tile_arg, arg))

                return lax.cond(lo_cost > ub, lambda c: c, work, carry)

            best0 = jnp.full((block_rows, TILE), _INF, F32)
            arg0 = jnp.zeros((block_rows, TILE), I32)
            best, arg = lax.fori_loop(jt_lo, jt_hi, per_candidate_tile,
                                      (best0, arg0))
            out_ref[:, pl.ds(i0, TILE)] = best
            if off_track:
                arg = arg - (lanes + i0)  # sweeps store offsets
            arg_ref[:, pl.ds(i0, TILE)] = arg
            return 0

        if split:
            # the tile-pair branch lives in a separate dispatch; just flag
            need = jnp.maximum(need, (radius > swept).astype(I32))
        else:
            lax.cond(radius > swept, tiled, lambda _: 0, 0)
        # clamp: padded-halo winners only occur for all-INF rows
        arg = arg_ref[:, pl.ds(i0, TILE)]
        if off_track:
            arg = arg + (lanes + i0)
        arg = jnp.clip(arg, 0, n - 1)
        ww = None
        if walled:
            wl = _wall_tile(walls_ref, pl.ds(i0, TILE), w2, wall_sent)
            best = out_ref[:, pl.ds(i0, TILE)]
            ww = wl < best  # ties stay with the min-plus candidate
            out_ref[:, pl.ds(i0, TILE)] = jnp.where(ww, wl, best)
        if off_dtype is not None:
            off = arg - (lanes + i0)
            if ww is not None:
                # wall wins: inert sentinel (the VJP's _link_dtype marker)
                off = jnp.where(ww, jnp.int32(jnp.iinfo(off_dtype).min),
                                off)
            arg_out_ref[:, pl.ds(i0, TILE)] = off.astype(off_dtype)
        else:
            if ww is not None:
                arg = jnp.where(ww, -(lanes + i0) - 1, arg)
            arg_out_ref[:, pl.ds(i0, TILE)] = arg
        return need

    need = lax.fori_loop(0, n_tiles, per_target_tile, jnp.int32(0))
    if split:
        flag_ref[:, :] = jnp.broadcast_to(need, (8, TILE))


def minplus_argmin_pallas(f, w2, walls=None, interpret=False,
                          block_rows=MP_BLOCK_ROWS, arg_band_r=None,
                          row_sweep=True, emit_offsets=False,
                          dyn_probe=None, off_track=None, split=None):
    """(R, n) f32 -> (d, argj): unmasked min-plus and its winning index.

    emit_offsets=True: the second output is the residual OFFSET o =
    argj - i in the narrow _link_dtype (int16 when n <= 16000), with wall
    wins as the dtype-min sentinel — exactly the VJP residual encoding of
    edt_tpu.models.soft, formed in-register (no XLA conversion pass, half
    the residual stream).

    walls: optional (R, n) per-voxel constant upper bound, min'd into
    the result in-kernel (multi-label boundary parabolas). f32: squared
    distances with INF = open. Integer (int16/int32): wall COUNTS
    (distance in voxels; >= WALL_SENT16/32 = open) — w2*cnt^2 is formed
    in-register, so the wall stream costs half the HBM of f32. Wall wins
    (strictly below every candidate) return arg = ~i (negative); they also
    cap the internal radius estimates, which is what keeps barrier-height
    fields with sparse sources off the full tile-pair scan.

    dyn_probe: shrink the probe sweep to the radius implied by the raw
    min(f, wall) bounds when that undershoots the fixed ±16 floor (exact
    either way — see the rowsweep kernel). None -> EDT_TPU_DYN_PROBE env,
    resolved here so it feeds this function's own jit cache key: toggling
    the env var takes effect for every NEW outer trace. A caller that
    cached an outer jit (and hits that cache) still replays the variant
    traced into it — sweep knobs in one process per variant regardless.

    off_track: sweeps track the winning offset (broadcast scalar select)
    instead of the absolute index, reconstructed once in the epilogue —
    drops one vector add per (offset, tile) step. Exact either way.
    None -> EDT_TPU_ARG_OFF_TRACK env (resolved like dyn_probe).

    split: compile the tile-pair fallback into a SEPARATE dispatch that
    only runs (XLA-level lax.cond on a per-block flag) when some tile's
    refined radius exceeds the swept band — its static presence in the
    main kernel costs ~6x the sweep on v5e (see the rowsweep kernel
    docstrings). None -> EDT_TPU_SPLIT_TILED env (default on). In split
    mode arg_band_r defaults to HALO (cover everything the halo permits;
    extension trip counts are per-block dynamic so only blocks that need
    long bands pay for them), else 48.
    """
    import os

    if dyn_probe is None:
        dyn_probe = os.environ.get("EDT_TPU_DYN_PROBE", "0") == "1"
    if off_track is None:
        off_track = os.environ.get("EDT_TPU_ARG_OFF_TRACK", "0") == "1"
    if (walls is not None and walls.dtype == jnp.int16
            and f.shape[1] > 16000):
        # int16 wall counts can legitimately reach n + 1 > WALL_SENT16 for
        # 16000 < n <= 32767 and would silently read as open walls
        raise ValueError(
            f"int16 wall counts require n <= 16000 (got n={f.shape[1]}); "
            "use int32 counts")
    if -(-f.shape[1] // TILE) > 16:
        row_sweep = False  # static tile unroll would explode on long rows
    if split is None:
        split = os.environ.get("EDT_TPU_SPLIT_TILED", "0") == "1"
    split = bool(split) and bool(row_sweep)
    if arg_band_r is None:
        arg_band_r = HALO if split else 48
    return _minplus_argmin_pallas_jit(
        f, w2, walls, interpret=interpret, block_rows=block_rows,
        arg_band_r=arg_band_r, row_sweep=row_sweep,
        emit_offsets=emit_offsets, dyn_probe=bool(dyn_probe),
        off_track=bool(off_track), split=split)


@functools.partial(
    jax.jit, static_argnames=("interpret", "block_rows", "arg_band_r",
                              "row_sweep", "emit_offsets", "dyn_probe",
                              "off_track", "split")
)
def _minplus_argmin_pallas_jit(f, w2, walls, interpret, block_rows,
                               arg_band_r, row_sweep, emit_offsets,
                               dyn_probe, off_track, split=False):
    R, n = f.shape
    n_tiles = max(1, -(-n // TILE))
    Rp = -(-R // block_rows) * block_rows
    np_ = n_tiles * TILE
    walled = walls is not None
    # band sweeps roll the INF halo in from at most HALO lanes away; a
    # larger band would wrap REAL f values back at understated offsets
    # (the per-tile variant separately clamps at TILE). Exactness of every
    # knob value relies on this clamp — longer radii take the tile-pair
    # scan instead.
    arg_band_r = min(arg_band_r, HALO)

    fp = _pad_to(f.astype(F32), Rp, np_, _INF, halo=HALO)
    w2v = jnp.asarray(w2, F32).reshape(1)

    if n_tiles > 16:
        row_sweep = False  # static tile unroll would explode on long rows
    row_spec = pl.BlockSpec((block_rows, np_), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((block_rows, np_ + 2 * HALO), lambda r: (r, 0),
                          memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), f_spec]
    operands = [w2v, fp]
    wall_sent = None
    if walled:
        in_specs.append(row_spec)
        if jnp.issubdtype(walls.dtype, jnp.integer):
            wall_sent = (WALL_SENT16 if walls.dtype == jnp.int16
                         else WALL_SENT32)
            operands.append(_pad_to(walls, Rp, np_, wall_sent, halo=0))
        else:
            operands.append(_pad_to(walls.astype(F32), Rp, np_, _INF,
                                    halo=0))
    off_dtype = None
    arg_out_dtype = I32
    if emit_offsets:
        off_dtype = jnp.int16 if n <= 16000 else jnp.int32
        arg_out_dtype = off_dtype
    n_blocks = Rp // block_rows
    flag_spec = pl.BlockSpec((8, TILE), lambda r: (r, 0),
                             memory_space=pltpu.VMEM)

    def call(do_split):
        if row_sweep:
            kernel = functools.partial(
                _minplus_argmin_rowsweep_kernel, n_tiles=n_tiles,
                block_rows=block_rows, arg_band_r=arg_band_r, walled=walled,
                wall_sent=wall_sent, off_dtype=off_dtype,
                dyn_probe=bool(dyn_probe), off_track=bool(off_track),
                split=do_split)
            scratch = [pltpu.SMEM((n_tiles,), jnp.int32)]
            if emit_offsets:
                scratch.append(pltpu.VMEM((block_rows, np_), I32))
        else:
            kernel = functools.partial(
                _minplus_argmin_kernel, n_tiles=n_tiles,
                block_rows=block_rows, arg_band_r=arg_band_r, walled=walled,
                wall_sent=wall_sent, off_dtype=off_dtype)
            scratch = []
        out_specs = (row_spec, row_spec)
        out_shape = (jax.ShapeDtypeStruct((Rp, np_), F32),
                     jax.ShapeDtypeStruct((Rp, np_), arg_out_dtype))
        if do_split:
            out_specs = out_specs + (flag_spec,)
            out_shape = out_shape + (
                jax.ShapeDtypeStruct((8 * n_blocks, TILE), I32),)
        return pl.pallas_call(
            kernel,
            grid=(Rp // block_rows,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*operands)

    if split:
        d, arg, flag = call(True)
        d, arg = lax.cond(jnp.any(flag[:, 0] > 0),
                          lambda _: call(False), lambda _: (d, arg), 0)
    else:
        d, arg = call(False)
    return d[:R, :n], arg[:R, :n]


def _minplus_grad_kernel(g_ref, arg_ref, out_ref, *, n_tiles, block_rows):
    """Transpose of argmin routing: df[r, j] = sum_i g[r, i] [argj[r, i] == j].

    A gather formulation of the VJP scatter — XLA scatter-add serializes on
    TPU; here each target tile scans source positions within the block's
    maximum link offset (banded rolling window when small, tile pairs
    otherwise). Padding carries argj == its own global position with g == 0,
    so padded/halo sites never contribute.
    """
    n = n_tiles * TILE
    lanes = lax.broadcasted_iota(I32, (1, TILE), 1)

    # max |argj - i| over the block bounds every link
    def _moff_tile(t, m):
        a = arg_ref[:, pl.ds(HALO + t * TILE, TILE)]
        pos = lanes + t * TILE
        return jnp.maximum(m, jnp.max(jnp.abs(a - pos)))

    moff = lax.fori_loop(0, n_tiles, _moff_tile, jnp.int32(0))

    def per_target_tile(jt, _):
        j0 = jt * TILE
        jpos = lanes + j0  # (1, TILE) global target positions
        acc0 = jnp.zeros((block_rows, TILE), F32)

        def banded(acc):
            # rolling 3-tile windows of g and argj over source positions
            # i = j + k, k in [-moff, moff] (dynamic trip count)
            def win3(ref):
                a = ref[:, pl.ds(HALO + j0 - TILE, TILE)]
                b = ref[:, pl.ds(HALO + j0, TILE)]
                c = ref[:, pl.ds(HALO + j0 + TILE, TILE)]
                w = jnp.concatenate([a, b, c], axis=1)
                return pltpu.roll(w, 2 * TILE + moff, axis=1)  # left T - moff

            def body(k, carry):
                acc, gw, aw = carry
                hit = aw[:, :TILE] == jpos
                acc = acc + jnp.where(hit, gw[:, :TILE], 0.0)
                return (acc, pltpu.roll(gw, 3 * TILE - 1, axis=1),
                        pltpu.roll(aw, 3 * TILE - 1, axis=1))

            acc, _, _ = lax.fori_loop(
                0, 2 * moff + 1, body, (acc, win3(g_ref), win3(arg_ref)))
            return acc

        def tiled(acc):
            it_lo = jnp.maximum((j0 - moff) // TILE, 0)
            it_hi = jnp.minimum((j0 + TILE + moff + TILE - 1) // TILE, n_tiles)

            jlanes3 = lax.broadcasted_iota(I32, (1, 1, TILE), 2) + j0

            def per_source_tile(it, acc):
                i0 = it * TILE
                g_i = g_ref[:, pl.ds(HALO + i0, TILE)]
                a_i = arg_ref[:, pl.ds(HALO + i0, TILE)]
                # hit[r, i, j] = argj[r, i0+i] == j0+j
                hit = a_i[:, :, None] == jlanes3
                contrib = jnp.where(hit, g_i[:, :, None], 0.0)
                return acc + jnp.sum(contrib, axis=1)

            return lax.fori_loop(it_lo, it_hi, per_source_tile, acc)

        acc = lax.cond(moff <= TILE, banded, tiled, acc0)
        out_ref[:, pl.ds(j0, TILE)] = acc
        return 0

    lax.fori_loop(0, n_tiles, per_target_tile, 0)


def _minplus_grad_rowsweep_kernel(g_ref, arg_ref, out_ref, m_ref, *, n_tiles,
                                  block_rows, band_cap=TILE, off_mode=False,
                                  off_sent=None, i16_cmp=False):
    """Offset-major grad gather: whole-row rolls of g and argj shared
    across target tiles (same restructuring as the forward row sweep —
    halves roll traffic vs per-tile 3-tile windows). The band covers the
    block's SIGNED link range [max(min_o, -band_cap), min(max_o,
    band_cap)] — asymmetric links (anisotropic passes, borders) cost
    only the offsets that actually occur, not a symmetric 2·max|o|+1.
    Links outside the band are handled by a SUPPLEMENTAL pass that
    visits only source tiles whose own extrema leave it (per-tile signed
    extrema in SMEM scratch), with a hit filter o outside [lo, hi] so
    nothing double counts — a few long links no longer drag the whole
    block through extra sweep offsets (every offset costs a whole-row
    roll) or full tile-pair gathers.

    HALO-FREE: unlike the forward sweeps (whose rolls drag real f values
    across row ends at wrong quadratic cost without an INF halo), every
    VALID link here stays inside the row (argmin j in [0, n)), so the
    rotating accumulator is exact under plain circular rolls of width n —
    j -> (j + s) % width is a bijection and no contribution ever lands on
    a foreign target. Dropping the 2*HALO pad cuts roll traffic by
    2*HALO/n (33% at n = 512), and rolls dominate the sweep.

    off_mode: arg_ref holds residual OFFSETS o = argj - i (int16/int32 —
    half the argj stream, straight from the VJP residual, no absolute
    reconstruction). off_sent (static): inert-marker offset value (wall
    wins); it can never equal a swept kk and its reconstructed absolute
    position is negative, so those voxels contribute nothing — exactly
    the zeroed-g + zero-length-link encoding of the absolute path.

    i16_cmp: keep int16 offset residuals in their native width through
    the per-tile maxima and the sweep's compare (kk cast down per step,
    |kk| <= band_cap fits) instead of widening the whole block to int32
    up front — trades one (block_rows, n) conversion for 2rb+1 scalar
    casts; exact either way (EDT_TPU_GRAD_I16_CMP sweeps it)."""
    n = n_tiles * TILE
    width = n
    lanes = lax.broadcasted_iota(I32, (1, TILE), 1)

    if off_mode:
        o_full = arg_ref[:, :]
        if not (i16_cmp and o_full.dtype == jnp.int16):
            o_full = o_full.astype(I32)
    else:
        # residual links o[i] = argj[i] - i over the whole row (0 in
        # padding where argj carries its own position and g == 0)
        o_full = arg_ref[:, :] - lax.broadcasted_iota(
            I32, (block_rows, width), 1)
    g_full = g_ref[:, :]

    # per-tile SIGNED link extrema (SMEM): the band sweeps [lo, hi] =
    # [max(min_o, -cap), min(max_o, cap)] instead of the symmetric
    # [-max|o|, max|o|] — strictly fewer whole-row steps whenever the
    # block's links are one-sided (anisotropic passes, border regions)
    mn = jnp.int32(0)
    mx = jnp.int32(0)
    for t in range(n_tiles):
        ot = o_full[:, t * TILE:(t + 1) * TILE]
        if off_sent is not None:
            ot = jnp.where(ot == off_sent, jnp.zeros((), ot.dtype), ot)
        mnt = jnp.min(ot).astype(I32)
        mxt = jnp.max(ot).astype(I32)
        m_ref[0, t] = mnt
        m_ref[1, t] = mxt
        mn = jnp.minimum(mn, mnt)
        mx = jnp.maximum(mx, mxt)
    lo = jnp.maximum(mn, jnp.int32(-band_cap))  # banded range [lo, hi]
    hi = jnp.minimum(mx, jnp.int32(band_cap))

    # (no out_ref zero-init: banded_sweep below writes every tile, even
    # with a single-offset band — at least the k = lo step always runs,
    # since lo <= 0 <= hi by construction: inert/padding offsets are 0)

    def banded_sweep(_):
        # rotating-accumulator gather: the compare+select for link offset
        # kk happens in FIXED (unrolled) index space — sel[i] = g[i] iff
        # o[i] == kk — and lands in an accumulator whose alignment rotates
        # by one lane per step (acc[:, c] holds df[(c + s) % width] at
        # alignment s = kk; circular wrap is safe — valid links stay
        # in-row, so j -> (j + s) % width never aliases). ONE incremental
        # roll per offset (of acc)
        # instead of two (of g and argj) — the rolls dominate the sweep —
        # plus a single dynamic unrotation at the end.
        def body(k, acc):
            kk = k + lo
            # compare in the residual's native width (i16_cmp): |kk| <=
            # band_cap always fits int16
            acc = acc + jnp.where(o_full == kk.astype(o_full.dtype),
                                  g_full, 0.0)
            return pltpu.roll(acc, width - 1, axis=1)  # s += 1

        acc0 = jnp.zeros((block_rows, width), F32)
        acc = lax.fori_loop(0, hi - lo + 1, body, acc0)
        # the loop left-rotated (hi - lo + 1) times from alignment s = lo:
        # df[j] = acc[:, (j - hi - 1) % width]; one shift restores it
        final = pltpu.roll(acc, (hi + 1) % width, axis=1)
        for it in range(n_tiles):
            out_ref[:, pl.ds(it * TILE, TILE)] = final[
                :, it * TILE:(it + 1) * TILE]
        return 0

    banded_sweep(0)
    moff = jnp.maximum(-mn, mx)  # max |o| (supplement source ranges)

    def supplement(_):
        # long links only: source tiles whose extrema leave [lo, hi],
        # hits filtered to o outside the band (already credited there)
        jlanes3 = lax.broadcasted_iota(I32, (1, 1, TILE), 2)

        def per_target_tile(jt, _):
            j0 = jt * TILE
            it_lo = jnp.maximum((j0 - moff) // TILE, 0)
            it_hi = jnp.minimum((j0 + TILE + moff + TILE - 1) // TILE,
                                n_tiles)

            def per_source_tile(it, acc):
                i0 = it * TILE

                def work(acc):
                    g_i = g_ref[:, pl.ds(i0, TILE)]
                    if off_mode:
                        o_i = arg_ref[:, pl.ds(i0, TILE)].astype(I32)
                        a_i = o_i + (lanes + i0)
                    else:
                        a_i = arg_ref[:, pl.ds(i0, TILE)]
                        o_i = a_i - (lanes + i0)
                    # fold the long-link filter into g before the minor-dim
                    # expansion (Mosaic cannot expand i1 vectors); inert
                    # markers reconstruct to negative positions (no hit),
                    # but mask them here too for safety
                    far = (o_i < lo) | (o_i > hi)
                    if off_sent is not None:
                        far = far & (o_i != off_sent)
                    g_far = jnp.where(far, g_i, 0.0)
                    hit = a_i[:, :, None] == (jlanes3 + j0)
                    contrib = jnp.where(hit, g_far[:, :, None], 0.0)
                    return acc + jnp.sum(contrib, axis=1)

                need = (m_ref[0, it] < lo) | (m_ref[1, it] > hi)
                return lax.cond(need, work, lambda a: a, acc)

            acc = lax.fori_loop(it_lo, it_hi, per_source_tile,
                                out_ref[:, pl.ds(j0, TILE)])
            out_ref[:, pl.ds(j0, TILE)] = acc
            return 0

        lax.fori_loop(0, n_tiles, per_target_tile, 0)
        return 0

    lax.cond((mn < lo) | (mx > hi), supplement, lambda _: 0, 0)


def minplus_grad_pallas(g, argj=None, interpret=False,
                        block_rows=MP_BLOCK_ROWS, row_sweep=True,
                        band_cap=TILE, offsets=None, off_sent=None,
                        i16_cmp=None):
    """VJP routing for minplus_argmin_pallas: (R, n) g, argj -> df (R, n).

    Pass EITHER argj (absolute int32 winner indices) OR offsets (residual
    o = argj - i, int16/int32, straight from the VJP residual — half the
    stream, no absolute reconstruction). off_sent (static int): offset
    value marking inert voxels (wall wins) — they contribute nothing.

    i16_cmp: compare int16 residuals at native width in the sweep instead
    of widening the block to int32 first (exact either way — a hardware
    tuning knob). None -> EDT_TPU_GRAD_I16_CMP env, resolved here so it
    feeds this function's jit cache key (effective for new outer traces;
    an already-cached outer jit replays its traced variant).
    """
    if i16_cmp is None:
        import os

        i16_cmp = os.environ.get("EDT_TPU_GRAD_I16_CMP", "0") == "1"
    return _minplus_grad_pallas_jit(
        g, argj, offsets, interpret=interpret, block_rows=block_rows,
        row_sweep=row_sweep, band_cap=band_cap, off_sent=off_sent,
        i16_cmp=bool(i16_cmp))


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows",
                                             "row_sweep", "band_cap",
                                             "off_sent", "i16_cmp"))
def _minplus_grad_pallas_jit(g, argj, offsets, interpret, block_rows,
                             row_sweep, band_cap, off_sent, i16_cmp):
    R, n = g.shape
    n_tiles = max(1, -(-n // TILE))
    Rp = -(-R // block_rows) * block_rows
    np_ = n_tiles * TILE
    if n_tiles > 16:
        row_sweep = False

    # the row-sweep kernel needs NO halo (valid links never leave the row,
    # so circular rolls are exact — see its docstring); the per-tile
    # fallback's 3-tile windows still read one tile past each end
    halo = 0 if row_sweep else HALO
    off_mode = offsets is not None
    if off_mode and not row_sweep:
        # the per-tile fallback kernel speaks absolute indices; rebuild
        # them (fuses into the padding copy)
        idx = jnp.arange(n, dtype=I32)[None, :]
        inert = offsets == off_sent if off_sent is not None else False
        argj = idx + jnp.where(inert, jnp.zeros((), offsets.dtype),
                               offsets).astype(I32)
        g = jnp.where(inert, jnp.asarray(0.0, F32), g)
        off_mode = False
    if not off_mode and row_sweep:
        # negative argj encodes wall wins (arg = ~i) in the walled argmin's
        # absolute mode: inert. Sanitize to zero-length links with g = 0 —
        # the per-tile kernel's hit test drops negatives naturally, but the
        # rotating accumulator would misread o = ~i - i as a short link
        # and wrap the contribution across the row end.
        idx = jnp.arange(n, dtype=I32)[None, :]
        neg = argj < 0
        argj = jnp.where(neg, idx, argj)
        g = jnp.where(neg, jnp.asarray(0.0, F32), g)
    gp = _pad_to(g.astype(F32), Rp, np_, 0.0, halo=halo)
    if off_mode:
        # pad with zero-length links (g == 0 there)
        ap = _pad_to(offsets, Rp, np_, 0, halo=halo)
    else:
        # pad argj with its own global position (links of length 0, g == 0)
        pos = jnp.broadcast_to(jnp.arange(-halo, np_ + halo, dtype=I32),
                               (Rp, np_ + 2 * halo))
        ap = pos.at[:R, halo:halo + n].set(argj.astype(I32))
    if row_sweep:
        kernel = functools.partial(_minplus_grad_rowsweep_kernel,
                                   band_cap=band_cap, off_mode=off_mode,
                                   off_sent=off_sent if off_mode else None,
                                   i16_cmp=bool(i16_cmp))
        scratch = [pltpu.SMEM((2, n_tiles), jnp.int32)]  # signed extrema
    else:
        kernel = _minplus_grad_kernel
        scratch = []
    out = pl.pallas_call(
        functools.partial(kernel, n_tiles=n_tiles,
                          block_rows=block_rows),
        grid=(Rp // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, np_ + 2 * halo), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, np_ + 2 * halo), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, np_), lambda r: (r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp, np_), F32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(gp, ap)
    return out[:R, :n]


def _binary_grad_scan_kernel(g_ref, o_ref, out_ref, *, width, block_rows,
                             off_sent, omax):
    """Closed-form-binary-pass backward as VMEM segmented scans.

    Residual offsets o mark wall wins with ``off_sent`` (inert) and zero
    sites with ``omax``; every other winner links to the nearest zero on
    its side, so each zero site's sources are contiguous runs (see
    models.soft._binary_grad_from_links for the argument). Two segmented
    Hillis-Steele scans (log2(width) shift steps, flags at zero sites)
    produce every zero site's gathered cotangent in ~2 log2(n) vector
    steps and ONE HBM round trip — vs the gather sweep's 2*moff + 1
    whole-row roll+select steps (moff ~ 32-64 on the blocky headline) or
    the XLA associative_scan's log2(n) full-size HBM temporaries.
    """
    lanes = lax.broadcasted_iota(I32, (block_rows, width), 1)
    # Widen int16 residuals immediately: v5e Mosaic rejects ordered vector
    # compares at i16 ("Target does not support this comparison"), and the
    # sign tests below need them. One in-register widening cast, like the
    # gather kernel's i16_cmp=0 default.
    o = o_ref[:, :].astype(I32)
    g = g_ref[:, :]
    if off_sent is not None:
        live = o != off_sent
        g = jnp.where(live, g, 0.0)
        o = jnp.where(live, o, 0)
    z = o == omax
    o0 = jnp.where(z, jnp.zeros((), o.dtype), o)
    zf = jnp.where(z, 1.0, 0.0)  # flags as f32 (mask-fold rule)
    hR = jnp.where(o0 > 0, g, 0.0)
    hL = jnp.where(o0 < 0, g, 0.0)

    def seg_scan(h, reverse):
        # v[i] = sum of h over [segment_start(i), i] (or mirrored), with
        # segments starting AT flagged positions: v += (fl ? 0 : v_shift);
        # fl |= fl_shift. Circular roll wrap-ins are masked to the
        # identity (flag 0, value 0).
        v, fl = h, zf
        s = 1
        while s < width:
            if reverse:
                vs = pltpu.roll(v, width - s, axis=1)  # from i + s
                fs = pltpu.roll(fl, width - s, axis=1)
                edge = lanes < width - s
            else:
                vs = pltpu.roll(v, s, axis=1)  # from i - s
                fs = pltpu.roll(fl, s, axis=1)
                edge = lanes >= s
            vs = jnp.where(edge, vs, 0.0)
            fs = jnp.where(edge, fs, 0.0)
            v = v + jnp.where(fl > 0.0, 0.0, vs)
            fl = jnp.maximum(fl, fs)
            s *= 2
        return v

    fs_ = seg_scan(hR, False)
    rs_ = seg_scan(hL, True)
    fs_prev = jnp.where(lanes >= 1, pltpu.roll(fs_, 1, axis=1), 0.0)
    rs_next = jnp.where(lanes < width - 1,
                        pltpu.roll(rs_, width - 1, axis=1), 0.0)
    out_ref[:, :] = (jnp.where(o0 == 0, g, 0.0)
                     + jnp.where(z, fs_prev + rs_next, 0.0))


@functools.partial(jax.jit, static_argnames=("off_sent", "interpret",
                                             "block_rows"))
def binary_grad_scan_pallas(g, offsets, off_sent=None, interpret=False,
                            block_rows=MP_BLOCK_ROWS):
    """(R, n) cotangents + binary-pass link offsets -> df, via segmented
    scans (see _binary_grad_scan_kernel). offsets must mark zero sites
    with their dtype max (models.soft stores them that way when the scan
    backward is active) and wall wins with ``off_sent`` if walled."""
    R, n = g.shape
    np_ = max(1, -(-n // TILE)) * TILE
    if np_ > 4096:
        block_rows = min(block_rows, 8)  # VMEM: ~6 f32 row copies live
    Rp = -(-R // block_rows) * block_rows
    omax = int(jnp.iinfo(offsets.dtype).max)
    gp = _pad_to(g.astype(F32), Rp, np_, 0.0, halo=0)
    op = _pad_to(offsets, Rp, np_, 0, halo=0)
    spec = pl.BlockSpec((block_rows, np_), lambda r: (r, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_binary_grad_scan_kernel, width=np_,
                          block_rows=block_rows, off_sent=off_sent,
                          omax=omax),
        grid=(Rp // block_rows,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Rp, np_), F32),
        interpret=interpret,
    )(gp, op)
    return out[:R, :n]


# ---------------------------------------------------------------------------
# Softmin-plus (temperature > 0) — the smooth training mode of
# edt_tpu.models.soft. d[i] = -t * log sum_j exp(-(f[j] + w2 (i-j)^2)/t).
# Evaluated as dmin - t * log sum_j exp(-(cost - dmin)/t): the hard min
# first (reusing the radius-pruned banded/tiled machinery), then a shifted
# exp accumulation. Terms with cost - dmin > SOFT_CUT*t are dropped: the
# sum is >= 1 (the winning j contributes exp(0)), so exp(-30) ~ 9e-14 sits
# far below f32 resolution of the accumulator — results match the exact
# O(n^2) logsumexp to f32 round-off. The contributing radius follows the
# same floor argument as the hard kernel: a term needs
# w2 (i-j)^2 <= d_i + SOFT_CUT*t - f_j <= max(dmin) + SOFT_CUT*t - minf.
# ---------------------------------------------------------------------------

SOFT_CUT = 30.0


def _softmin_kernel(w2_ref, t_ref, f_ref, out_ref, *, n_tiles, block_rows,
                    band_r=BAND_MAX_R):
    w2 = w2_ref[0]
    t = t_ref[0]
    invt = 1.0 / t
    n = n_tiles * TILE

    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (jj - ii).astype(F32)  # [j, i] = i - j

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)

    def per_target_tile(it, _):
        i0 = it * TILE
        f_i = f_ref[:, pl.ds(HALO + i0, TILE)]

        # --- phase A: hard min dmin (banded probe, tiled fallback) ---
        R0 = band_r
        w0 = f_ref[:, pl.ds(HALO + i0 - TILE, TILE)]
        w2t = f_ref[:, pl.ds(HALO + i0 + TILE, TILE)]
        wide0 = jnp.concatenate([w0, f_i, w2t], axis=1)
        wide = pltpu.roll(wide0, 2 * TILE + R0, axis=1)  # left by TILE - R0
        dhat = jnp.full(f_i.shape, _INF, F32)
        for k in range(2 * R0 + 1):
            kk = jnp.float32(k - R0)
            dhat = jnp.minimum(dhat, wide[:, :TILE] + w2 * (kk * kk))
            wide = pltpu.roll(wide, 3 * TILE - 1, axis=1)

        gap = _radius_gap(jnp.max(dhat, axis=1, keepdims=True), minf_row)
        radius = _radius_from_gap(gap, w2, n)

        def band_done(_):
            return dhat

        def tiled_min(d0, r, ub):
            # min-accumulate over candidate tiles; tiles whose cheapest
            # possible cost exceeds ub (>= every d_i here) are skipped
            jt_lo = jnp.maximum((i0 - r) // TILE, 0)
            jt_hi = jnp.minimum((i0 + TILE + r + TILE - 1) // TILE, n_tiles)

            def per_candidate_tile(jt, acc):
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                tg = jnp.maximum(jnp.abs(i0 - j0) - TILE + 1, 0).astype(F32)
                lo_cost = jnp.min(f_j) + w2 * tg * tg

                def work(acc):
                    d = dmat + (i0 - j0).astype(F32)
                    cost = f_j[:, :, None] + (w2 * (d * d))[None, :, :]
                    return jnp.minimum(acc, jnp.min(cost, axis=1))

                return lax.cond(lo_cost > ub, lambda a: a, work, acc)

            return lax.fori_loop(jt_lo, jt_hi, per_candidate_tile, d0)

        def wide_then_maybe_tiled(_):
            # same two-stage refinement as the argmin kernel: a wide band
            # (min is order-free, so it continues from dhat) tightens the
            # bound before committing to tile pairs
            rw = jnp.minimum(radius, jnp.int32(TILE))
            wideb = pltpu.roll(wide0, 2 * TILE + rw, axis=1)

            def body(k, carry):
                acc, win = carry
                kk = (k - rw).astype(F32)
                acc = jnp.minimum(acc, win[:, :TILE] + w2 * (kk * kk))
                return acc, pltpu.roll(win, 3 * TILE - 1, axis=1)

            d2, _ = lax.fori_loop(0, 2 * rw + 1, body, (dhat, wideb))
            gap2 = _radius_gap(jnp.max(d2, axis=1, keepdims=True), minf_row)
            r2 = _radius_from_gap(gap2, w2, n)
            return lax.cond(
                r2 <= rw,
                lambda _: d2,
                lambda _: tiled_min(d2, r2, jnp.max(d2)),
                0,
            )

        dmin = lax.cond(radius <= R0, band_done, wide_then_maybe_tiled, 0)

        # --- phase B: shifted exp accumulation within the soft radius ---
        gap_s = _radius_gap(
            jnp.max(dmin, axis=1, keepdims=True) + SOFT_CUT * t, minf_row
        )
        radius_s = _radius_from_gap(gap_s, w2, n)

        s0 = jnp.zeros((block_rows, TILE), F32)

        def banded_exp(s):
            wideb = pltpu.roll(wide0, 2 * TILE + radius_s, axis=1)

            def body(k, carry):
                s, win = carry
                kk = (k - radius_s).astype(F32)
                cost = win[:, :TILE] + w2 * (kk * kk)
                s = s + jnp.exp((dmin - cost) * invt)
                return s, pltpu.roll(win, 3 * TILE - 1, axis=1)

            s, _ = lax.fori_loop(0, 2 * radius_s + 1, body, (s, wideb))
            return s

        def tiled_exp(s):
            jt_lo = jnp.maximum((i0 - radius_s) // TILE, 0)
            jt_hi = jnp.minimum((i0 + TILE + radius_s + TILE - 1) // TILE,
                                n_tiles)
            # tiles whose cheapest cost exceeds every d_i + SOFT_CUT*t
            # contribute below f32 resolution of the (>= 1) accumulator
            ub_s = jnp.max(dmin) + SOFT_CUT * t

            def per_candidate_tile(jt, s):
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                tg = jnp.maximum(jnp.abs(i0 - j0) - TILE + 1, 0).astype(F32)
                lo_cost = jnp.min(f_j) + w2 * tg * tg

                def work(s):
                    d = dmat + (i0 - j0).astype(F32)
                    cost = f_j[:, :, None] + (w2 * (d * d))[None, :, :]
                    p = jnp.exp((dmin[:, None, :] - cost) * invt)
                    return s + jnp.sum(p, axis=1)

                return lax.cond(lo_cost > ub_s, lambda s: s, work, s)

            return lax.fori_loop(jt_lo, jt_hi, per_candidate_tile, s)

        # banded window reaches at most TILE either side (3-tile concat)
        s = lax.cond(radius_s <= TILE, banded_exp, tiled_exp, s0)
        # all-INF rows (padding): dmin = INF, s = 0 -> keep INF
        d = jnp.where(s > 0, dmin - t * jnp.log(s), dmin)
        out_ref[:, pl.ds(i0, TILE)] = d
        return 0

    lax.fori_loop(0, n_tiles, per_target_tile, 0)


def _softmin_rowsweep_kernel(w2_ref, t_ref, f_ref, out_ref, s_scr, rad_ref,
                             *, n_tiles, block_rows, probe_r=BAND_MAX_R):
    """Offset-major softmin: whole-row rolls shared across tiles for both
    the hard-min phase (probe + gated extension + tiled fallback) and the
    shifted exp accumulation (min and sum both continue across sweeps, so
    no tie bookkeeping is needed anywhere). Tiles whose contributing
    radius exceeds a tile fall back to per-tile tile-pair scans; such
    tiles are excluded from the exp sweep so nothing double-counts."""
    w2 = w2_ref[0]
    t = t_ref[0]
    invt = 1.0 / t
    n = n_tiles * TILE
    width = n + 2 * HALO
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (jj - ii).astype(F32)  # [j, i] = i - j

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)
    w0 = f_ref[:, :]

    for it in range(n_tiles):
        out_ref[:, pl.ds(it * TILE, TILE)] = jnp.full(
            (block_rows, TILE), _INF, F32)

    def min_sweep(lo_k, hi_k):
        """min-update all tiles over offsets kk in [lo_k, hi_k] (ungated —
        per-(offset, tile) scalar conds measured slower than the updates
        they skip)."""
        wk0 = pltpu.roll(w0, (width - HALO) - lo_k, axis=1)

        def body(k, wk):
            kk = (lo_k + k).astype(F32)
            q = w2 * (kk * kk)
            for it in range(n_tiles):
                sl = pl.ds(it * TILE, TILE)
                cand = wk[:, it * TILE:(it + 1) * TILE] + q
                out_ref[:, sl] = jnp.minimum(out_ref[:, sl], cand)
            return pltpu.roll(wk, width - 1, axis=1)

        lax.fori_loop(0, hi_k - lo_k + 1, body, wk0)

    # ---- phase A: dmin ----
    min_sweep(jnp.int32(-probe_r), jnp.int32(probe_r))

    def calc_radius(extra, floor_r):
        """Per-tile radii into rad_ref; returns the max sweep radius over
        tiles whose radius exceeds floor_r (capped at a tile)."""
        def body(it, mx):
            bound = jnp.max(out_ref[:, pl.ds(it * TILE, TILE)], axis=1,
                            keepdims=True) + extra
            radius = _radius_from_gap(_radius_gap(bound, minf_row), w2, n)
            rad_ref[it] = radius
            return jnp.maximum(
                mx, jnp.where(radius > floor_r,
                              jnp.minimum(radius, jnp.int32(TILE)), 0))
        return lax.fori_loop(0, n_tiles, body, jnp.int32(0))

    rmax_ext = calc_radius(0.0, probe_r)

    def extend(_):
        # ungated: extra min candidates are harmless, and per-tile scalar
        # conds measured slower than the updates they skip
        min_sweep(-rmax_ext, jnp.int32(-(probe_r + 1)))
        min_sweep(jnp.int32(probe_r + 1), rmax_ext)
        return 0

    lax.cond(rmax_ext > probe_r, extend, lambda _: 0, 0)
    calc_radius(0.0, probe_r)

    def tiled_min_tile(it, _):
        i0 = it * TILE
        radius = rad_ref[it]
        swept = jnp.maximum(rmax_ext, jnp.int32(probe_r))

        def tiled(_):
            ub = jnp.max(out_ref[:, pl.ds(i0, TILE)])
            jt_lo = jnp.maximum((i0 - radius) // TILE, 0)
            jt_hi = jnp.minimum((i0 + TILE + radius + TILE - 1) // TILE,
                                n_tiles)

            def per_candidate_tile(jt, acc):
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                tg = jnp.maximum(jnp.abs(i0 - j0) - TILE + 1, 0).astype(F32)
                lo_cost = jnp.min(f_j) + w2 * tg * tg

                def work(acc):
                    d = dmat + (i0 - j0).astype(F32)
                    cost = f_j[:, :, None] + (w2 * (d * d))[None, :, :]
                    return jnp.minimum(acc, jnp.min(cost, axis=1))

                return lax.cond(lo_cost > ub, lambda a: a, work, acc)

            acc = lax.fori_loop(jt_lo, jt_hi, per_candidate_tile,
                                out_ref[:, pl.ds(i0, TILE)])
            out_ref[:, pl.ds(i0, TILE)] = acc
            return 0

        lax.cond(radius > swept, tiled, lambda _: 0, 0)
        return 0

    lax.fori_loop(0, n_tiles, tiled_min_tile, 0)

    # ---- phase B: shifted exp accumulation ----
    # floor -1: every tile joins the sweep (even radius 0 needs its k=0
    # term); rs_max >= 1 whenever any real data exists
    rs_max = calc_radius(SOFT_CUT * t, -1)  # rad_ref now holds soft radii

    for it in range(n_tiles):
        s_scr[:, pl.ds(it * TILE, TILE)] = jnp.zeros((block_rows, TILE), F32)

    def exp_sweep(_):
        wk0 = pltpu.roll(w0, rs_max + (width - HALO), axis=1)

        def body(k, wk):
            kk = (k - rs_max).astype(F32)
            q = w2 * (kk * kk)
            for it in range(n_tiles):
                # ungated: tiles destined for tiled_exp discard s_scr at
                # the selection in finish_tile, and per-tile scalar conds
                # measured slower than the exp update they skip
                sl = pl.ds(it * TILE, TILE)
                cost = wk[:, it * TILE:(it + 1) * TILE] + q
                dmin = out_ref[:, sl]
                s_scr[:, sl] = s_scr[:, sl] + jnp.exp((dmin - cost) * invt)
            return pltpu.roll(wk, width - 1, axis=1)

        lax.fori_loop(0, 2 * rs_max + 1, body, wk0)
        return 0

    lax.cond(rs_max > 0, exp_sweep, lambda _: 0, 0)

    def finish_tile(it, _):
        i0 = it * TILE
        radius = rad_ref[it]
        dmin = out_ref[:, pl.ds(i0, TILE)]

        def tiled_exp(_):
            ub_s = jnp.max(dmin) + SOFT_CUT * t
            jt_lo = jnp.maximum((i0 - radius) // TILE, 0)
            jt_hi = jnp.minimum((i0 + TILE + radius + TILE - 1) // TILE,
                                n_tiles)

            def per_candidate_tile(jt, s):
                j0 = jt * TILE
                f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
                tg = jnp.maximum(jnp.abs(i0 - j0) - TILE + 1, 0).astype(F32)
                lo_cost = jnp.min(f_j) + w2 * tg * tg

                def work(s):
                    d = dmat + (i0 - j0).astype(F32)
                    cost = f_j[:, :, None] + (w2 * (d * d))[None, :, :]
                    p = jnp.exp((dmin[:, None, :] - cost) * invt)
                    return s + jnp.sum(p, axis=1)

                return lax.cond(lo_cost > ub_s, lambda s: s, work, s)

            return lax.fori_loop(jt_lo, jt_hi, per_candidate_tile,
                                 jnp.zeros((block_rows, TILE), F32))

        s = lax.cond(radius <= jnp.int32(TILE),
                     lambda _: s_scr[:, pl.ds(i0, TILE)], tiled_exp, 0)
        d = jnp.where(s > 0, dmin - t * jnp.log(s), dmin)
        out_ref[:, pl.ds(i0, TILE)] = d
        return 0

    lax.fori_loop(0, n_tiles, finish_tile, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows",
                                             "row_sweep"))
def softmin_pallas(f, w2, t, interpret=False, block_rows=MP_BLOCK_ROWS,
                   row_sweep=True):
    """(R, n) f32 -> softmin-plus along rows at temperature t (> 0)."""
    R, n = f.shape
    n_tiles = max(1, -(-n // TILE))
    Rp = -(-R // block_rows) * block_rows
    np_ = n_tiles * TILE
    if n_tiles > 16:
        row_sweep = False

    fp = _pad_to(f.astype(F32), Rp, np_, _INF, halo=HALO)
    w2v = jnp.asarray(w2, F32).reshape(1)
    tv = jnp.asarray(t, F32).reshape(1)

    row_spec = pl.BlockSpec((block_rows, np_), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec((block_rows, np_ + 2 * HALO), lambda r: (r, 0),
                          memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    if row_sweep:
        kernel = functools.partial(_softmin_rowsweep_kernel, n_tiles=n_tiles,
                                   block_rows=block_rows)
        scratch = [pltpu.VMEM((block_rows, np_), F32),
                   pltpu.SMEM((n_tiles,), jnp.int32)]
    else:
        kernel = functools.partial(_softmin_kernel, n_tiles=n_tiles,
                                   block_rows=block_rows)
        scratch = []
    out = pl.pallas_call(
        kernel,
        grid=(Rp // block_rows,),
        in_specs=[scalar_spec, scalar_spec, f_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((Rp, np_), F32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(w2v, tv, fp)
    return out[:R, :n]


def _softmin_grad_kernel(w2_ref, t_ref, f_ref, d_ref, g_ref, df_ref, e_ref,
                         *, n_tiles, block_rows):
    """df[j] = sum_i g_i p_ij and e[i] = sum_j p_ij quad_ij for
    p_ij = exp(-(f_j + w2 (i-j)^2 - d_i)/t) (softmax weights, which sum to
    1 over j). dw2 = sum_i g_i e_i is reduced by the caller. One sweep over
    (j-tile, i-tile) pairs accumulates both: df into the current j tile,
    e via read-modify-write into the visited i tiles."""
    w2 = w2_ref[0]
    t = t_ref[0]
    invt = 1.0 / t
    n = n_tiles * TILE

    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (ii - jj).astype(F32)  # [i, j] = i - j

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)
    # per-row max of real d (padding is -INF so it cannot raise the max)
    maxd_row = jnp.max(d_ref[:, :], axis=1, keepdims=True)
    gap = _radius_gap(maxd_row + SOFT_CUT * t, minf_row)
    radius = _radius_from_gap(gap, w2, n)

    def _win3(ref, c0):
        """3-tile window rotated so [i, :TILE] starts at c0 - radius."""
        a = ref[:, pl.ds(HALO + c0 - TILE, TILE)]
        b = ref[:, pl.ds(HALO + c0, TILE)]
        c = ref[:, pl.ds(HALO + c0 + TILE, TILE)]
        return pltpu.roll(jnp.concatenate([a, b, c], axis=1),
                          2 * TILE + radius, axis=1)

    def banded_all(_):
        # two rolling-window sweeps per tile: df is j-major (sources
        # i = j + k), e is i-major (sources j = i + k); each pays one
        # (rows, TILE) exp per offset — O(radius)/voxel instead of the
        # >=128-candidates-per-voxel tile pairs below.
        def per_tile(jt, _):
            j0 = jt * TILE
            f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
            d_j = d_ref[:, pl.ds(HALO + j0, TILE)]
            gw0 = _win3(g_ref, j0)
            dw0 = _win3(d_ref, j0)
            fw0 = _win3(f_ref, j0)

            def body(k, carry):
                acc_df, acc_e, gw, dw, fw = carry
                kk = (k - radius).astype(F32)
                qk = kk * kk
                wq = w2 * qk
                p_df = jnp.exp((dw[:, :TILE] - f_j - wq) * invt)
                acc_df = acc_df + gw[:, :TILE] * p_df
                p_e = jnp.exp((d_j - fw[:, :TILE] - wq) * invt)
                acc_e = acc_e + qk * p_e
                roll1 = lambda x: pltpu.roll(x, 3 * TILE - 1, axis=1)
                return acc_df, acc_e, roll1(gw), roll1(dw), roll1(fw)

            z = jnp.zeros((block_rows, TILE), F32)
            acc_df, acc_e, *_ = lax.fori_loop(
                0, 2 * radius + 1, body, (z, z, gw0, dw0, fw0))
            df_ref[:, pl.ds(j0, TILE)] = acc_df
            e_ref[:, pl.ds(j0, TILE)] = acc_e
            return 0

        lax.fori_loop(0, n_tiles, per_tile, 0)
        return 0

    def tiled_all(_):
        def zero_tile(k, _):
            z = jnp.zeros((block_rows, TILE), F32)
            df_ref[:, pl.ds(k * TILE, TILE)] = z
            e_ref[:, pl.ds(k * TILE, TILE)] = z
            return 0

        lax.fori_loop(0, n_tiles, zero_tile, 0)

        def per_j_tile(jt, _):
            j0 = jt * TILE
            f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
            it_lo = jnp.maximum((j0 - radius) // TILE, 0)
            it_hi = jnp.minimum((j0 + TILE + radius + TILE - 1) // TILE,
                                n_tiles)

            def per_i_tile(it, acc_df):
                i0 = it * TILE
                d_i = d_ref[:, pl.ds(HALO + i0, TILE)]
                g_i = g_ref[:, pl.ds(HALO + i0, TILE)]
                dd = dmat + (i0 - j0).astype(F32)
                qq = dd * dd  # [i, j] = (i - j)^2 — d(cost)/d(w2)
                p = jnp.exp(
                    (d_i[:, :, None] - f_j[:, None, :]
                     - (w2 * qq)[None, :, :]) * invt
                )
                acc_df = acc_df + jnp.sum(g_i[:, :, None] * p, axis=1)
                e_ref[:, pl.ds(i0, TILE)] += jnp.sum(p * qq[None, :, :],
                                                     axis=2)
                return acc_df

            acc = lax.fori_loop(it_lo, it_hi, per_i_tile,
                                jnp.zeros((block_rows, TILE), F32))
            df_ref[:, pl.ds(j0, TILE)] = acc
            return 0

        lax.fori_loop(0, n_tiles, per_j_tile, 0)
        return 0

    lax.cond(radius <= TILE, banded_all, tiled_all, 0)


def _softmin_grad_rowsweep_kernel(w2_ref, t_ref, f_ref, d_ref, g_ref,
                                  df_ref, e_ref, *, n_tiles, block_rows):
    """Offset-major softmin backward: rolled d/g/f buffers shared across
    tiles; per offset each tile pays one exp for the df accumulation
    (sources i = j + k) and one for the expected-quad accumulation
    (sources j = i + k). Falls back to the per-tile tiled sweep when the
    contributing radius exceeds a tile."""
    w2 = w2_ref[0]
    t = t_ref[0]
    invt = 1.0 / t
    n = n_tiles * TILE
    width = n + 2 * HALO

    minf_row = jnp.min(f_ref[:, :], axis=1, keepdims=True)
    maxd_row = jnp.max(d_ref[:, :], axis=1, keepdims=True)
    gap = _radius_gap(maxd_row + SOFT_CUT * t, minf_row)
    radius = _radius_from_gap(gap, w2, n)

    for it in range(n_tiles):
        sl = pl.ds(it * TILE, TILE)
        df_ref[:, sl] = jnp.zeros((block_rows, TILE), F32)
        e_ref[:, sl] = jnp.zeros((block_rows, TILE), F32)

    def banded_sweep(_):
        shift0 = radius + (width - HALO)
        dw0 = pltpu.roll(d_ref[:, :], shift0, axis=1)
        gw0 = pltpu.roll(g_ref[:, :], shift0, axis=1)
        fw0 = pltpu.roll(f_ref[:, :], shift0, axis=1)

        def body(k, carry):
            dw, gw, fw = carry
            kk = (k - radius).astype(F32)
            qk = kk * kk
            wq = w2 * qk
            for it in range(n_tiles):
                sl = pl.ds(it * TILE, TILE)
                vsl = slice(it * TILE, (it + 1) * TILE)
                f_j = f_ref[:, pl.ds(HALO + it * TILE, TILE)]
                d_j = d_ref[:, pl.ds(HALO + it * TILE, TILE)]
                p_df = jnp.exp((dw[:, vsl] - f_j - wq) * invt)
                df_ref[:, sl] = df_ref[:, sl] + gw[:, vsl] * p_df
                p_e = jnp.exp((d_j - fw[:, vsl] - wq) * invt)
                e_ref[:, sl] = e_ref[:, sl] + qk * p_e
            roll1 = lambda x: pltpu.roll(x, width - 1, axis=1)
            return roll1(dw), roll1(gw), roll1(fw)

        lax.fori_loop(0, 2 * radius + 1, body, (dw0, gw0, fw0))
        return 0

    def tiled_all(_):
        _softmin_grad_tiled_body(w2, t, invt, n, radius, f_ref, d_ref,
                                 g_ref, df_ref, e_ref, n_tiles, block_rows)
        return 0

    lax.cond(radius <= TILE, banded_sweep, tiled_all, 0)


def _softmin_grad_tiled_body(w2, t, invt, n, radius, f_ref, d_ref, g_ref,
                             df_ref, e_ref, n_tiles, block_rows):
    """Shared tiled fallback of the softmin backward (see
    _softmin_grad_kernel's tiled_all for the derivation)."""
    ii = lax.broadcasted_iota(I32, (TILE, TILE), 0)
    jj = lax.broadcasted_iota(I32, (TILE, TILE), 1)
    dmat = (ii - jj).astype(F32)  # [i, j] = i - j

    def per_j_tile(jt, _):
        j0 = jt * TILE
        f_j = f_ref[:, pl.ds(HALO + j0, TILE)]
        it_lo = jnp.maximum((j0 - radius) // TILE, 0)
        it_hi = jnp.minimum((j0 + TILE + radius + TILE - 1) // TILE,
                            n_tiles)

        def per_i_tile(it, acc_df):
            i0 = it * TILE
            d_i = d_ref[:, pl.ds(HALO + i0, TILE)]
            g_i = g_ref[:, pl.ds(HALO + i0, TILE)]
            dd = dmat + (i0 - j0).astype(F32)
            qq = dd * dd
            p = jnp.exp(
                (d_i[:, :, None] - f_j[:, None, :] - (w2 * qq)[None, :, :])
                * invt
            )
            acc_df = acc_df + jnp.sum(g_i[:, :, None] * p, axis=1)
            e_ref[:, pl.ds(i0, TILE)] += jnp.sum(p * qq[None, :, :], axis=2)
            return acc_df

        acc = lax.fori_loop(it_lo, it_hi, per_i_tile,
                            jnp.zeros((block_rows, TILE), F32))
        df_ref[:, pl.ds(j0, TILE)] = acc
        return 0

    lax.fori_loop(0, n_tiles, per_j_tile, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "block_rows",
                                             "row_sweep"))
def softmin_grad_pallas(f, d, g, w2, t, interpret=False,
                        block_rows=MP_BLOCK_ROWS, row_sweep=True):
    """VJP for softmin_pallas: returns (df, e) with e[i] = E_p[quad] so the
    caller reduces dw2 = sum(g * e)."""
    R, n = f.shape
    n_tiles = max(1, -(-n // TILE))
    Rp = -(-R // block_rows) * block_rows
    np_ = n_tiles * TILE
    if n_tiles > 16:
        row_sweep = False

    fp = _pad_to(f.astype(F32), Rp, np_, _INF, halo=HALO)
    dp = _pad_to(d.astype(F32), Rp, np_, -_INF, halo=HALO)
    gp = _pad_to(g.astype(F32), Rp, np_, 0.0, halo=HALO)
    w2v = jnp.asarray(w2, F32).reshape(1)
    tv = jnp.asarray(t, F32).reshape(1)

    row_spec = pl.BlockSpec((block_rows, np_), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
    halo_spec = pl.BlockSpec((block_rows, np_ + 2 * HALO), lambda r: (r, 0),
                             memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kernel = (_softmin_grad_rowsweep_kernel if row_sweep
              else _softmin_grad_kernel)
    df, e = pl.pallas_call(
        functools.partial(kernel, n_tiles=n_tiles, block_rows=block_rows),
        grid=(Rp // block_rows,),
        in_specs=[scalar_spec, scalar_spec, halo_spec, halo_spec, halo_spec],
        out_specs=(row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct((Rp, np_), F32),
                   jax.ShapeDtypeStruct((Rp, np_), F32)),
        interpret=interpret,
    )(w2v, tv, fp, dp, gp)
    return df[:R, :n], e[:R, :n]


def make_parabolic_fn(interpret=False, block_rows=MP_BLOCK_ROWS,
                      band_r=None, row_sweep=True, split=None):
    """Full-pass adapter used by ops.core/compose: signature
    (f2d, labels2d, w2, black_border, binary) -> d2d.

    Implements the complete reference parabolic pass
    (squared_edt_1d_parabolic_multi_seg + border parabolas, edt.hpp:231-243,
    344-377): segment bounds via XLA scans, then ONE Pallas kernel doing
    the pruned unmasked min-plus with the wall parabolas fused in
    (walls=True). Background zeroing is implicit (background carries
    f == 0, which candidate j == i propagates)."""

    def fn(f2d, labels2d, w2, black_border, binary):
        if binary:
            return minplus_pallas(
                f2d, f2d, f2d, w2, masked=False, walls=True,
                black_border=black_border, interpret=interpret,
                block_rows=block_rows, band_r=band_r, row_sweep=row_sweep,
                split=split,
            )
        from edt_tpu.ops import core

        ss, se = core.segment_bounds(labels2d)
        return minplus_pallas(
            f2d, ss, se, w2, masked=True, walls=True,
            black_border=black_border, interpret=interpret,
            block_rows=block_rows, band_r=band_r, row_sweep=row_sweep,
            split=split,
        )

    return fn


def make_minplus_fn(interpret=False, block_rows=MP_BLOCK_ROWS,
                    band_r=None):
    """Adapter with the (f2d, seg_start2d, seg_end2d, w2, masked) signature
    used by ops.core.parabolic_pass_sq (walls applied by the caller)."""

    def fn(f2d, seg_start, seg_end, w2, masked=True):
        return minplus_pallas(f2d, seg_start, seg_end, w2, masked=masked,
                              interpret=interpret, block_rows=block_rows,
                              band_r=band_r)

    return fn
