"""Pallas kernels vs the pure-jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edt_tpu.ops import core, compose, pallas_kernels as pk


def _random_case(R=13, n=200, nl=3, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, nl, size=(R, n)).astype(np.uint32)
    f = (rng.random((R, n)).astype(np.float32) * 25)
    f[labels == 0] = 0
    return jnp.asarray(f), jnp.asarray(labels)


@pytest.mark.parametrize("black_border", [False, True])
def test_walls_fused_masked_matches_core(black_border):
    f, lab = _random_case()
    w = jnp.float32(1.3)
    pf = pk.make_parabolic_fn(interpret=True)
    ref = np.array(core.parabolic_pass_sq(f, lab, w, black_border))
    out = np.array(
        core.parabolic_pass_sq(f, lab, w, black_border, parabolic_fn=pf)
    )
    fin = np.isfinite(ref)
    assert np.array_equal(np.isfinite(out), fin)
    assert np.array_equal(out[fin], ref[fin])


@pytest.mark.parametrize("black_border", [False, True])
def test_walls_fused_binary_matches_core(black_border):
    rng = np.random.default_rng(1)
    occ = rng.random((11, 180)) > 0.3
    f = (rng.random((11, 180)).astype(np.float32) * 25)
    f[~occ] = 0
    fj = jnp.asarray(f)
    lab = jnp.asarray(occ.astype(np.uint8))
    w = jnp.float32(0.7)
    pf = pk.make_parabolic_fn(interpret=True)
    ref = np.array(core.parabolic_pass_sq(fj, lab, w, black_border, binary=True))
    out = np.array(
        core.parabolic_pass_sq(fj, lab, w, black_border, binary=True,
                               parabolic_fn=pf)
    )
    fin = np.isfinite(ref)
    assert np.array_equal(np.isfinite(out), fin)
    assert np.allclose(out[fin], ref[fin], rtol=1e-6, atol=1e-5)


def test_minplus_tiled_matches_core():
    """Full parabolic pass with the Pallas min-plus == pure-jnp pass."""
    f, lab = _random_case(R=11, n=300, seed=2)
    w = jnp.float32(1.2)

    def mp(f2, ss, se, w2, masked=True):
        return pk.minplus_pallas(f2, ss, se, w2, masked=masked, interpret=True)

    for bb in (False, True):
        ref = np.array(core.parabolic_pass_sq(f, lab, w, bb))
        out = np.array(core.parabolic_pass_sq(f, lab, w, bb, minplus_fn=mp))
        fin = np.isfinite(ref)
        assert np.array_equal(np.isfinite(out), fin)
        assert np.array_equal(out[fin], ref[fin])


def test_unmasked_plus_walls_equals_masked():
    """The mask-redundancy lemma: foreign-segment candidates never beat the
    wall parabolas, so unmasked min-plus + walls == masked min-plus + walls
    bit-for-bit (this is what lets the kernels drop per-(i,j) masking)."""
    for seed in range(4):
        f, lab = _random_case(R=9, n=257, nl=4, seed=seed)
        w2 = jnp.float32(1.69)
        start, end = core.segment_bounds(lab)
        n = f.shape[-1]
        for bb in (False, True):
            masked = core.border_envelopes_sq(
                core.minplus_masked(f, start, w2), start, end, n, w2, bb)
            unmasked = core.border_envelopes_sq(
                core.minplus_masked(f, None, w2), start, end, n, w2, bb)
            masked = np.array(jnp.where(lab == 0, 0.0, masked))
            unmasked = np.array(jnp.where(lab == 0, 0.0, unmasked))
            fin = np.isfinite(masked)
            assert np.array_equal(np.isfinite(unmasked), fin)
            assert np.array_equal(unmasked[fin], masked[fin])


@pytest.mark.parametrize("black_border", [False, True])
@pytest.mark.parametrize("binary", [False, True])
def test_rowsweep_variant_matches(black_border, binary):
    """The offset-major row-sweep kernel == the per-tile kernel, across
    masked/binary x border modes, including a mixed band/tiled field."""
    rng = np.random.default_rng(9)
    f = (rng.random((10, 300)).astype(np.float32) * 25)
    lab = rng.integers(0, 3, size=(10, 300)).astype(np.uint32)
    if binary:
        lab = (lab != 0).astype(np.uint32)
    f[lab == 0] = 0
    # a long empty stretch forces some tiles tiled while others stay banded
    f[:, 100:260] = 500.0
    lab[:, 100:260] = 1
    fj, labj = jnp.asarray(f), jnp.asarray(lab)
    w = jnp.float32(1.1)
    a = np.array(core.parabolic_pass_sq(
        fj, labj, w, black_border, binary=binary,
        parabolic_fn=pk.make_parabolic_fn(interpret=True)))
    b = np.array(core.parabolic_pass_sq(
        fj, labj, w, black_border, binary=binary,
        parabolic_fn=pk.make_parabolic_fn(interpret=True, row_sweep=True)))
    fin = np.isfinite(a)
    assert np.array_equal(np.isfinite(b), fin)
    assert np.array_equal(a[fin], b[fin])


def test_rowsweep_constant_rows():
    """Regression: constant rows (per-row gap 0 -> radius 0, the all-ones
    cube's interior regime) must still scan their k=0 candidate — the
    sweep guard once skipped them entirely, leaving INF."""
    R = 300
    i = np.arange(R, dtype=np.float32)
    f2 = np.stack([i ** 2, i ** 2], axis=1)  # constant along each row
    f2[0] = 0.0
    lab2 = np.ones((R, 2), np.uint32)
    lab2[0] = 0
    fj, labj = jnp.asarray(f2), jnp.asarray(lab2)
    for bb in (False, True):
        for binary in (False, True):
            ref = np.array(core.parabolic_pass_sq(
                fj, labj, jnp.float32(1.0), bb, binary=binary))
            out = np.array(core.parabolic_pass_sq(
                fj, labj, jnp.float32(1.0), bb, binary=binary,
                parabolic_fn=pk.make_parabolic_fn(interpret=True,
                                                  row_sweep=True)))
            fin = np.isfinite(ref)
            assert np.array_equal(np.isfinite(out), fin), (bb, binary)
            assert np.array_equal(out[fin], ref[fin]), (bb, binary)


def test_fused_3d_composition_matches():
    rng = np.random.default_rng(5)
    labels = jnp.asarray(rng.integers(0, 4, size=(10, 11, 12)).astype(np.uint32))
    anis = jnp.asarray((2.0, 1.0, 3.0), jnp.float32)
    from edt_tpu.ops import pallas_kernels

    pf = pallas_kernels.make_parabolic_fn(interpret=True)
    a = np.array(compose.edtsq(labels, anis, True))
    b = np.array(compose.edtsq(labels, anis, True, parabolic_fn=pf))
    assert np.array_equal(a, b)


def test_argmin_kernel_matches_jnp():
    """Soft-path forward kernel: min-plus + leftmost argmin == jnp oracle,
    across small-radius, tied, barrier-height (tiled), and mid-radius
    (wide-band two-stage) regimes."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        f = (rng.random((9, 300)) * 50).astype(np.float32)
        f[rng.random((9, 300)) > 0.6] = 0.0
        if seed == 2:  # soft-EDT barrier heights, links > a tile -> tiled
            f = (rng.random((9, 300)) > 0.5).astype(np.float32) * 2.7e5
        if seed == 3:  # barrier field with sources every ~80: the probe
            # band misses them (radius estimate explodes to the barrier)
            # but the wide band stage finds and proves them
            f = np.full((9, 300), 2.7e5, np.float32)
            f[:, ::80] = 0.0
        fj = jnp.asarray(f)
        w2 = jnp.float32(1.3)
        i = jnp.arange(300, dtype=jnp.float32)
        cost = fj[:, None, :] + w2 * (i[:, None] - i[None, :]) ** 2
        for sweep in (False, True):
            for dyn, otr in ((False, False), (True, False), (False, True),
                             (True, True)):
                d, a = pk.minplus_argmin_pallas(fj, w2, interpret=True,
                                                row_sweep=sweep,
                                                dyn_probe=dyn,
                                                off_track=otr)
                assert np.array_equal(np.array(d),
                                      np.array(jnp.min(cost, -1))), (
                    seed, sweep, dyn, otr)
                assert np.array_equal(np.array(a),
                                      np.array(jnp.argmin(cost, -1))), (
                    seed, sweep, dyn, otr)


def test_argmin_kernel_walled_matches_oracle():
    """Walled argmin kernel (fused multi-label wall clamp): value ==
    min(min-plus, wall), wall wins (strict) encoded as arg = ~i, ties kept
    by the candidate — across source-rich, barrier-sparse, and
    wall-everywhere regimes, both kernel variants."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        n = 300
        f = (rng.random((9, n)) * 50).astype(np.float32)
        f[rng.random((9, n)) > 0.6] = 0.0
        walls = (rng.random((9, n)) * 60).astype(np.float32)
        if seed == 2:
            # barrier heights with sparse sources + moderate walls: the
            # wall cap must keep radii bounded AND stay correct
            f = np.full((9, n), 2.7e5, np.float32)
            f[:, ::70] = 0.0
            walls = (rng.random((9, n)) * 400).astype(np.float32)
        if seed == 3:
            # exact ties: wall value equals the candidate cost
            f = np.full((9, n), 1000.0, np.float32)
            f[:, ::10] = 0.0
            walls = np.zeros((9, n), np.float32)
            i = np.arange(n)
            near = np.minimum(i % 10, 10 - (i % 10))
            walls[:] = (near.astype(np.float32) ** 2) * 1.3
        fj = jnp.asarray(f)
        wj = jnp.asarray(walls)
        w2 = jnp.float32(1.3)
        i = jnp.arange(n, dtype=jnp.float32)
        cost = fj[:, None, :] + w2 * (i[:, None] - i[None, :]) ** 2
        dmp = np.array(jnp.min(cost, -1))
        amp = np.array(jnp.argmin(cost, -1))
        win = dmp <= walls
        ref_d = np.where(win, dmp, walls)
        ref_a = np.where(win, amp, ~np.arange(n)[None, :])
        for sweep in (False, True):
            for dyn, otr in ((False, False), (True, False), (True, True)):
                d, a = pk.minplus_argmin_pallas(fj, w2, walls=wj,
                                                interpret=True,
                                                row_sweep=sweep,
                                                dyn_probe=dyn,
                                                off_track=otr)
                assert np.array_equal(np.array(d), ref_d), (
                    seed, sweep, dyn, otr)
                assert np.array_equal(np.array(a), ref_a), (
                    seed, sweep, dyn, otr)


def _soft_cases():
    """Random, barrier-height, and mixed fields (the soft-EDT regimes)."""
    cases = []
    rng = np.random.default_rng(0)
    f = (rng.random((9, 300)) * 50).astype(np.float32)
    f[rng.random((9, 300)) > 0.6] = 0.0
    cases.append((f, 1.3, 0.7))
    barrier = (np.random.default_rng(1).random((7, 260)) > 0.5).astype(
        np.float32) * 2000.0
    cases.append((barrier, 2.0, 5.0))
    smooth = np.abs(np.sin(np.arange(280) / 9.0))[None] * 40.0
    cases.append((np.repeat(smooth, 8, 0).astype(np.float32), 0.49, 0.3))
    # huge contributing radius (> row length): forces the tiled branches
    wide = (np.random.default_rng(2).random((6, 270)) > 0.5).astype(
        np.float32) * 2e4
    cases.append((wide, 0.01, 1.0))
    return cases


def test_softmin_kernel_matches_logsumexp():
    """Softmin forward kernel == exact O(n^2) logsumexp to f32 round-off
    (the SOFT_CUT-dropped terms sit below accumulator resolution), in both
    the row-sweep and per-tile variants."""
    for f, w2, t in _soft_cases():
        fj = jnp.asarray(f)
        n = f.shape[1]
        i = jnp.arange(n, dtype=jnp.float32)
        cost = fj[:, None, :] + w2 * (i[:, None] - i[None, :]) ** 2
        ref = np.array(-t * jax.nn.logsumexp(-cost / t, axis=-1))
        for sweep in (True, False):
            out = np.array(pk.softmin_pallas(
                fj, jnp.float32(w2), jnp.float32(t), interpret=True,
                row_sweep=sweep))
            assert np.allclose(out, ref, rtol=1e-5, atol=1e-4), (w2, t, sweep)


def test_softmin_grad_kernel_matches_ad():
    """Softmin backward kernel (df, dw2 via expected-quad) == jax AD through
    the exact logsumexp."""
    for f, w2, t in _soft_cases():
        fj = jnp.asarray(f)
        n = f.shape[1]
        w2j = jnp.float32(w2)

        def exact(fv, w2v):
            i = jnp.arange(n, dtype=jnp.float32)
            cost = fv[:, None, :] + w2v * (i[:, None] - i[None, :]) ** 2
            return -t * jax.nn.logsumexp(-cost / t, axis=-1)

        rng = np.random.default_rng(42)
        g = jnp.asarray(rng.random(f.shape).astype(np.float32))
        ref_df, ref_dw2 = jax.vjp(exact, fj, w2j)[1](g)
        d = pk.softmin_pallas(fj, w2j, jnp.float32(t), interpret=True)
        for sweep in (True, False):
            df, e = pk.softmin_grad_pallas(fj, d, g, w2j, jnp.float32(t),
                                           interpret=True, row_sweep=sweep)
            dw2 = jnp.sum(g * e)
            assert np.allclose(np.array(df), np.array(ref_df),
                               rtol=1e-4, atol=1e-4), (w2, t, sweep)
            assert np.isclose(float(dw2), float(ref_dw2), rtol=1e-3), (
                w2, t, sweep)


def test_grad_gather_kernel_matches_scatter():
    """Soft-path backward kernel: gather formulation == scatter-add,
    including rare long-range argmin links that force the tiled branch."""
    for seed in range(3):
        rng = np.random.default_rng(seed)
        R, n = 9, 300
        i = np.arange(n)
        off = rng.integers(-5, 6, size=(R, n))
        if seed == 2:
            off[rng.random((R, n)) > 0.98] = 200
        argj = np.clip(i[None, :] + off, 0, n - 1).astype(np.int32)
        g = rng.random((R, n)).astype(np.float32)
        rows = np.arange(R)[:, None]
        ref = np.zeros((R, n), np.float32)
        np.add.at(ref, (rows.repeat(n, 1), argj), g)
        for sweep in (False, True):
            out = np.array(
                pk.minplus_grad_pallas(jnp.asarray(g), jnp.asarray(argj),
                                       interpret=True, row_sweep=sweep)
            )
            assert np.allclose(out, ref, atol=1e-5), (seed, sweep)


def test_grad_gather_band_cap_variants():
    """Capping the swept band routes the long-link tail through the
    supplemental pass; every cap must stay exact (the sweep credits
    |o| <= cap, the supplement strictly |o| > cap — no double counting)."""
    rng = np.random.default_rng(7)
    R, n = 33, 640
    i = np.arange(n)
    off = rng.integers(-12, 13, size=(R, n))
    far = rng.random((R, n)) < 0.02
    off = np.where(far, rng.integers(-300, 301, size=(R, n)), off)
    argj = np.clip(i[None, :] + off, 0, n - 1).astype(np.int32)
    g = rng.standard_normal((R, n)).astype(np.float32)
    rows = np.arange(R)[:, None]
    ref = np.zeros((R, n), np.float32)
    np.add.at(ref, (rows.repeat(n, 1), argj), g)
    for cap in (8, 32, 128):
        out = np.array(
            pk.minplus_grad_pallas(jnp.asarray(g), jnp.asarray(argj),
                                   interpret=True, band_cap=cap)
        )
        assert np.allclose(out, ref, atol=1e-5), cap

    # single-tile row with max-length links: every link points at column 0
    # (all-negative offsets -> one-sided band [lo, 0])
    n1 = 128
    argj1 = np.zeros((4, n1), np.int32)
    g1 = rng.standard_normal((4, n1)).astype(np.float32)
    ref1 = np.zeros((4, n1), np.float32)
    ref1[:, 0] = g1.sum(axis=1)
    out1 = np.array(
        pk.minplus_grad_pallas(jnp.asarray(g1), jnp.asarray(argj1),
                               interpret=True, band_cap=128)
    )
    assert np.allclose(out1, ref1, atol=1e-4)
    # and at column n-1: hi + 1 == width exercises the halo-free
    # accumulator's full circular wrap (unrotation amount 0)
    argj2 = np.full((4, n1), n1 - 1, np.int32)
    ref2 = np.zeros((4, n1), np.float32)
    ref2[:, -1] = g1.sum(axis=1)
    out2 = np.array(
        pk.minplus_grad_pallas(jnp.asarray(g1), jnp.asarray(argj2),
                               interpret=True, band_cap=128)
    )
    assert np.allclose(out2, ref2, atol=1e-4)


def test_grad_gather_asymmetric_band():
    """The sweep covers the signed link range [min_o, max_o] (clamped to
    the cap), not a symmetric band: one-sided and skewed link fields must
    stay exact, including when the supplement handles one side only."""
    rng = np.random.default_rng(19)
    R, n = 17, 384
    i = np.arange(n)
    cases = [
        rng.integers(0, 9, size=(R, n)),        # all right links
        rng.integers(-60, 1, size=(R, n)),      # all left links
        rng.integers(-3, 40, size=(R, n)),      # skewed
    ]
    for ci, off in enumerate(cases):
        argj = np.clip(i[None, :] + off, 0, n - 1).astype(np.int32)
        g = rng.standard_normal((R, n)).astype(np.float32)
        rows = np.arange(R)[:, None]
        ref = np.zeros((R, n), np.float32)
        np.add.at(ref, (rows.repeat(n, 1), argj), g)
        for cap in (8, 128):
            out = np.array(
                pk.minplus_grad_pallas(jnp.asarray(g), jnp.asarray(argj),
                                       interpret=True, band_cap=cap))
            assert np.allclose(out, ref, atol=1e-5), (ci, cap)
        # offsets mode with sentinel wall wins sprinkled in (offsets must
        # be the real clipped links: i + o stays inside the row)
        o16 = (argj - i[None, :]).astype(np.int16)
        sent = np.int16(np.iinfo(np.int16).min)
        inert = rng.random((R, n)) < 0.1
        o16 = np.where(inert, sent, o16).astype(np.int16)
        ref_m = np.zeros((R, n), np.float32)
        gm = np.where(inert, 0.0, g).astype(np.float32)
        argj_m = np.where(inert, i[None, :], argj).astype(np.int32)
        np.add.at(ref_m, (rows.repeat(n, 1), argj_m), gm)
        out = np.array(
            pk.minplus_grad_pallas(jnp.asarray(g), offsets=jnp.asarray(o16),
                                   off_sent=int(sent), interpret=True,
                                   band_cap=16))
        assert np.allclose(out, ref_m, atol=1e-5), ci


def test_grad_gather_negative_argj_inert():
    """Wall wins in the walled argmin's ABSOLUTE mode encode arg = ~i
    (negative): both gather paths must treat them as inert (zero
    contribution). The row-sweep rotating accumulator would otherwise
    misread o = ~i - i as a short link and wrap it across the row end."""
    rng = np.random.default_rng(5)
    R, n = 8, 384
    i = np.arange(n)
    off = rng.integers(-6, 7, size=(R, n))
    argj = np.clip(i[None, :] + off, 0, n - 1).astype(np.int32)
    wall = rng.random((R, n)) < 0.3
    argj = np.where(wall, ~i[None, :], argj).astype(np.int32)
    g = rng.standard_normal((R, n)).astype(np.float32)
    ref = np.zeros((R, n), np.float32)
    rows = np.arange(R)[:, None].repeat(n, 1)
    valid = argj >= 0
    np.add.at(ref, (rows[valid], argj[valid]), g[valid])
    for sweep in (False, True):
        out = np.array(
            pk.minplus_grad_pallas(jnp.asarray(g), jnp.asarray(argj),
                                   interpret=True, row_sweep=sweep)
        )
        assert np.allclose(out, ref, atol=1e-5), sweep


def test_argmin_walls_as_counts_matches_f32_walls():
    """Integer wall counts (w2*cnt^2 formed in-register, sentinel = open)
    must reproduce the f32 wall field path bit-exactly."""
    from edt_tpu.models import soft as msoft

    assert msoft.WALL_SENT16 == pk.WALL_SENT16
    assert msoft.WALL_SENT32 == pk.WALL_SENT32

    rng = np.random.default_rng(5)
    n = 300
    f = np.full((9, n), 900.0, np.float32)
    f[rng.random((9, n)) > 0.8] = 0.0
    # counts: distance-to-wall pattern with some open (sentinel) sides
    cnt = rng.integers(1, n, size=(9, n)).astype(np.int16)
    cnt[rng.random((9, n)) > 0.9] = pk.WALL_SENT16
    w2 = jnp.float32(1.3)
    walls_f32 = np.where(cnt >= pk.WALL_SENT16, np.inf,
                         1.3 * cnt.astype(np.float32) ** 2
                         ).astype(np.float32)
    for sweep in (False, True):
        d_f, a_f = pk.minplus_argmin_pallas(jnp.asarray(f), w2,
                                            walls=jnp.asarray(walls_f32),
                                            interpret=True, row_sweep=sweep)
        d_c, a_c = pk.minplus_argmin_pallas(jnp.asarray(f), w2,
                                            walls=jnp.asarray(cnt),
                                            interpret=True, row_sweep=sweep)
        assert np.array_equal(np.array(d_f), np.array(d_c)), sweep
        assert np.array_equal(np.array(a_f), np.array(a_c)), sweep
        # dynamic probe + offset tracking must not disturb the int16
        # sentinel-count wall path (the raw-bound pre-pass reads the same
        # _wall_tile decode)
        d_k, a_k = pk.minplus_argmin_pallas(jnp.asarray(f), w2,
                                            walls=jnp.asarray(cnt),
                                            interpret=True, row_sweep=sweep,
                                            dyn_probe=True, off_track=True)
        assert np.array_equal(np.array(d_f), np.array(d_k)), sweep
        assert np.array_equal(np.array(a_f), np.array(a_k)), sweep


@pytest.mark.parametrize("walled", [False, True])
def test_binary_grad_scan_kernel_matches_jnp(walled):
    """The VMEM segmented-scan backward must match the XLA scan path (and
    hence the gather, up to fp summation order) on binary-pass links with
    zero-site marks, wall sentinels, unaligned widths, and no-zero rows."""
    from edt_tpu.models import soft

    rng = np.random.default_rng(11)
    n = 300  # unaligned (pads to 384)
    R = 9
    B = 900.0
    f = (rng.random((R, n)) > 0.35).astype(np.float32) * B
    f[2] = B  # no zeros
    f[3] = 0.0  # all zeros
    g = rng.standard_normal((R, n)).astype(np.float32)
    fj, w2 = jnp.asarray(f), jnp.float32(1.7)
    d, argj = soft._minplus_hard_binary_with_arg(fj, w2)
    idx = np.arange(n, dtype=np.int32)[None, :]
    o = (np.array(argj) - idx).astype(np.int16)
    omax = np.iinfo(np.int16).max
    sent = np.iinfo(np.int16).min
    if walled:
        # clamp against random walls: wall wins become inert sentinels
        walls = 1.7 * rng.integers(1, 20, size=(R, n)).astype(np.float32) ** 2
        winm = np.array(d) <= walls
        o = np.where(winm, o, sent).astype(np.int16)
    o = np.where(f <= 0.0, omax, o).astype(np.int16)
    oj, gj = jnp.asarray(o), jnp.asarray(g)

    got = np.array(pk.binary_grad_scan_pallas(
        gj, oj, off_sent=int(sent) if walled else None, interpret=True))
    z = o == omax
    gm = jnp.where(jnp.asarray(o != sent if walled else np.ones_like(o, bool)),
                   gj, 0.0)
    o0 = np.where(z | (o == sent), 0, o).astype(np.int16)
    want = np.array(soft._binary_grad_from_links(
        gm, jnp.asarray(o0), jnp.asarray(z)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # conservation: every live cotangent lands somewhere exactly once
    live = (o != sent) if walled else np.ones_like(o, bool)
    np.testing.assert_allclose(got.sum(), g[live].sum(), rtol=1e-4)


def test_argmin_int16_walls_long_row_rejected():
    """For 16000 < n <= 32767 legitimate int16 wall counts (up to n + 1)
    can reach WALL_SENT16 and silently read as open walls — the public
    entry must enforce its documented precondition."""
    n = 16384
    f = jnp.zeros((1, n), jnp.float32)
    cnt = jnp.ones((1, n), jnp.int16)
    with pytest.raises(ValueError, match="int16 wall counts"):
        pk.minplus_argmin_pallas(f, jnp.float32(1.0), walls=cnt,
                                 interpret=True)


def test_grad_gather_offsets_mode_matches_absolute():
    """Residual-offset input (int16, optional inert sentinel) must match
    the absolute-argj path exactly, including capped bands."""
    rng = np.random.default_rng(11)
    R, n = 32, 512
    i = np.arange(n)
    off = rng.integers(-12, 13, size=(R, n))
    off = np.where(rng.random((R, n)) < 0.02,
                   rng.integers(-300, 301, size=(R, n)), off)
    argj = np.clip(i[None, :] + off, 0, n - 1).astype(np.int32)
    o = (argj - i[None, :]).astype(np.int16)
    g = rng.standard_normal((R, n)).astype(np.float32)

    # inert sentinel on some voxels: absolute path = zero-length link + g=0
    sent = np.int16(np.iinfo(np.int16).min)
    inert = rng.random((R, n)) < 0.1
    o_s = np.where(inert, sent, o)
    gm = np.where(inert, 0.0, g).astype(np.float32)
    links = np.where(inert, i[None, :], argj).astype(np.int32)

    rows = np.arange(R)[:, None]
    ref = np.zeros((R, n), np.float32)
    np.add.at(ref, (rows.repeat(n, 1), links), gm)

    for cap in (16, 128):
        for i16_cmp in (False, True):
            out = np.array(pk.minplus_grad_pallas(
                jnp.asarray(g), offsets=jnp.asarray(o_s), off_sent=int(sent),
                interpret=True, band_cap=cap, i16_cmp=i16_cmp))
            assert np.allclose(out, ref, atol=1e-5), (cap, i16_cmp)
    # no-sentinel variant vs absolute argj (both compare widths)
    ref2 = np.zeros((R, n), np.float32)
    np.add.at(ref2, (rows.repeat(n, 1), argj), g)
    for i16_cmp in (False, True):
        out2 = np.array(pk.minplus_grad_pallas(
            jnp.asarray(g), offsets=jnp.asarray(o), interpret=True,
            i16_cmp=i16_cmp))
        assert np.allclose(out2, ref2, atol=1e-5), i16_cmp
    # long-row fallback (n_tiles > 16 -> per-tile kernel via reconstruction)
    n2 = 17 * 128
    o_l = rng.integers(-5, 6, size=(4, n2)).astype(np.int16)
    i2 = np.arange(n2)[None, :]
    o_l = np.where(i2 + o_l < 0, 0, o_l)
    o_l = np.where(i2 + o_l >= n2, 0, o_l)
    o_ls = np.where(rng.random((4, n2)) < 0.1, sent, o_l)
    g_l = rng.standard_normal((4, n2)).astype(np.float32)
    ref3 = np.zeros((4, n2), np.float32)
    links3 = np.where(o_ls == sent, i2, i2 + o_ls).astype(np.int64)
    gm3 = np.where(o_ls == sent, 0.0, g_l)
    np.add.at(ref3, (np.arange(4)[:, None].repeat(n2, 1), links3), gm3)
    out3 = np.array(pk.minplus_grad_pallas(
        jnp.asarray(g_l), offsets=jnp.asarray(o_ls), off_sent=int(sent),
        interpret=True))
    assert np.allclose(out3, ref3, atol=1e-5)


def test_argmin_emit_offsets_matches_absolute():
    """emit_offsets=True must return o = argj - i (int16, wall wins as
    dtype-min sentinel) for both kernel variants, walled and not."""
    rng = np.random.default_rng(13)
    n = 300
    f = np.full((9, n), 700.0, np.float32)
    f[rng.random((9, n)) > 0.85] = 0.0
    cnt = rng.integers(1, 12, size=(9, n)).astype(np.int16)
    w2 = jnp.float32(1.3)
    i = np.arange(n, dtype=np.int32)[None, :]
    sent = np.iinfo(np.int16).min
    for walls in (None, jnp.asarray(cnt)):
        for sweep in (False, True):
            d_a, a_a = pk.minplus_argmin_pallas(
                jnp.asarray(f), w2, walls=walls, interpret=True,
                row_sweep=sweep)
            for otr in (False, True):
                d_o, o = pk.minplus_argmin_pallas(
                    jnp.asarray(f), w2, walls=walls, interpret=True,
                    row_sweep=sweep, emit_offsets=True, off_track=otr)
                assert o.dtype == jnp.int16
                assert np.array_equal(np.array(d_a), np.array(d_o))
                a_a2 = np.array(a_a)
                exp = np.where(a_a2 >= 0, a_a2 - i, sent).astype(np.int16)
                assert np.array_equal(np.array(o), exp), (
                    walls is None, sweep, otr)


@pytest.mark.parametrize("split", [False, True])
def test_rowsweep_split_dispatch_matches(split):
    """The split dispatch (tile-pair fallback compiled into a separate
    pallas_call behind an XLA-level cond on the per-block radius flag,
    EDT_TPU_SPLIT_TILED) is bit-identical to the fused kernel on both a
    banded-only field and a forced-fallback field (radius > HALO)."""
    rng = np.random.default_rng(17)
    f = (rng.random((10, 512)).astype(np.float32) * 25)
    lab = np.repeat(rng.integers(0, 4, size=(10, 16)), 32, axis=1)
    lab = lab.astype(np.uint32)
    f[lab == 0] = 0
    fj, labj = jnp.asarray(f), jnp.asarray(lab)
    w = jnp.float32(1.1)
    for bb in (False, True):
        ref = np.array(core.parabolic_pass_sq(fj, labj, w, bb))
        out = np.array(core.parabolic_pass_sq(
            fj, labj, w, bb,
            parabolic_fn=pk.make_parabolic_fn(interpret=True,
                                              row_sweep=True, split=split)))
        fin = np.isfinite(ref)
        assert np.array_equal(np.isfinite(out), fin), bb
        assert np.array_equal(out[fin], ref[fin]), bb

    # forced fallback: one source -> pruning radius ~ n > HALO, so the
    # split path's flag must fire and re-dispatch the full kernel
    f2 = np.full((8, 512), np.inf, np.float32)
    f2[:, 3] = 0.0
    f2j = jnp.asarray(f2)
    out = np.array(pk.minplus_pallas(
        f2j, f2j, f2j, 1.0, masked=False, walls=False, interpret=True,
        row_sweep=True, split=split))
    i = np.arange(512, dtype=np.float64)
    exp = ((i - 3) ** 2).astype(np.float32)
    assert np.array_equal(out, np.broadcast_to(exp, (8, 512)))


@pytest.mark.parametrize("split", [False, True])
def test_argmin_split_dispatch_matches(split):
    """Split dispatch of the argmin row-sweep kernel: values/args equal
    the jnp oracle with and without walls, including a sparse-source
    field whose refined radii exceed the swept band (fallback fires)."""
    rng = np.random.default_rng(23)
    n = 512
    w2 = 1.0
    i = np.arange(n)
    quad = w2 * (i[:, None] - i[None, :]).astype(np.float64) ** 2

    def oracle(f, wallsq=None):
        cost = f.astype(np.float64)[:, None, :] + quad[None]
        d = cost.min(-1)
        a = cost.argmin(-1)
        if wallsq is not None:
            ww = wallsq < d
            d = np.where(ww, wallsq, d)
            a = np.where(ww, ~i[None, :], a)
        return d.astype(np.float32), a

    # sparse sources: some inter-source gaps > HALO force the tile-pair
    # scan (flag fires); others stay banded
    f = np.full((8, n), 1e6, np.float32)
    for r in range(8):
        cols = rng.choice(n, size=3, replace=False)
        f[r, cols] = rng.random(3).astype(np.float32)
    fj = jnp.asarray(f)
    cnt = rng.integers(1, 200, size=(8, n)).astype(np.int16)

    d_ref, a_ref = oracle(f)
    d, a = pk.minplus_argmin_pallas(fj, w2, interpret=True, split=split)
    assert np.array_equal(np.array(d), d_ref)
    assert np.array_equal(np.array(a), a_ref)

    wallsq = w2 * cnt.astype(np.float64) ** 2
    d_ref, a_ref = oracle(f, wallsq)
    d, a = pk.minplus_argmin_pallas(fj, w2, walls=jnp.asarray(cnt),
                                    interpret=True, split=split,
                                    emit_offsets=True)
    sent = np.iinfo(np.int16).min
    an = np.array(a).astype(np.int64)
    abs_a = np.where(an == sent, ~i[None, :], an + i[None, :])
    assert np.array_equal(np.array(d), d_ref)
    assert np.array_equal(abs_a, a_ref)


def test_split_fixup_overflow_falls_back(monkeypatch):
    """When more blocks are flagged than the fixup capacity, the split
    dispatch must re-run the fused kernel on the whole volume (exactness
    cannot depend on the compaction capacity)."""
    monkeypatch.setattr(pk, "_fixup_capacity", lambda n_blocks: 1)
    rng = np.random.default_rng(31)
    # two row-blocks (block_rows=8), BOTH with a source gap > HALO so both
    # flag: count(2) > capacity(1) -> overflow path
    f = np.full((16, 512), np.inf, np.float32)
    f[:, 5] = 0.0
    fj = jnp.asarray(f)
    out = np.array(pk.minplus_pallas(
        fj, fj, fj, 1.0, masked=False, walls=False, interpret=True,
        row_sweep=True, split=True, block_rows=8))
    i = np.arange(512, dtype=np.float64)
    exp = ((i - 5) ** 2).astype(np.float32)
    assert np.array_equal(out, np.broadcast_to(exp, (16, 512)))
