"""Differentiable (soft) squared Euclidean distance transforms.

The hard multi-label EDT is not differentiable (labels are discrete, and
the reference's argmin is buried in sequential C++ scans,
/root/reference/src/edt.hpp:168-313). Here the transform is re-posed on a
continuous *height field* h:

    d(x) = min_v ( h(v) + sum_k w_k^2 (x_k - v_k)^2 )

h(v) = 0 marks a source (background); h(v) = +B (a large barrier) marks
solid foreground; intermediate values are soft occupancy. When h = B * occ
with occ in {0,1}, d equals the binary squared EDT clamped at B. The
transform is *separable*: one 1-D min-plus pass per axis, exactly like the
hard transform's Saito decomposition.

Differentiation:

  * temperature == 0 (hard min): a custom VJP stores only the per-pass
    argmin indices and scatter-adds cotangents back to the winning source
    of each voxel — O(voxels) residual memory instead of the O(voxels * n)
    a naive AD through the min reduction would keep.
  * temperature > 0 (softmin): min is replaced by
    -t * logsumexp(-cost / t).  Because exp(-(h + q1 + q2 + q3)/t)
    factorizes over axes, separable softmin passes compute the *exact*
    joint softmin over all of 3-D space — smooth everywhere in h.

black_border adds the usual implicit wall parabolas per axis
(w^2 (i+1)^2, w^2 (n-i)^2 — reference edt.hpp:231-243).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
INF = jnp.inf

_ROW_CHUNK = 256


def _grad_band_cap():
    """Static band cap for the VJP grad-gather kernel (sweep knob).

    Links longer than the cap are credited by the kernel's supplemental
    per-source-tile pass, so the value affects speed only, never
    correctness (tests/test_pallas_kernels.py band-cap variants)."""
    import os

    v = os.environ.get("EDT_TPU_GRAD_BAND_CAP")
    return int(v) if v else None


def _argmin_kwargs():
    """Static sweep knobs for the forward argmin kernels (hardware tuning
    only — every value is exact; defaults are the measured optima)."""
    import os

    kw = {}
    v = os.environ.get("EDT_TPU_ARG_BAND_R")
    if v:
        kw["arg_band_r"] = int(v)
    v = os.environ.get("EDT_TPU_BLOCK_ROWS")
    if v:
        kw["block_rows"] = int(v)
    return kw


def _match_vma(x, ref):
    """Cast x to vary over every shard_map mesh axis ref varies over.

    Under shard_map's vma (varying-manual-axes) type system, a custom VJP's
    bwd must return cotangents whose vma matches the primal inputs exactly.
    Our min-plus VJPs compute dw2 = sum(g * ...) — varying over whatever
    axes the data f (hence g) varies over — so a replicated w2 input would
    make the bwd type-incorrect. Casting w2 to f's vma BEFORE the
    custom_vjp call fixes the types, and is also the mathematically
    correct factoring: the cast (pvary) transposes to psum, so a caller
    differentiating w.r.t. an un-varied w2 outside the shard_map still
    receives the correct cross-shard-summed cotangent. Outside shard_map
    (vma empty) this is a no-op."""
    need = _vma_of(ref) - _vma_of(x)
    if not need:
        return x
    axes = tuple(sorted(need))
    if hasattr(lax, "pcast"):
        return lax.pcast(x, axes, to="varying")
    return lax.pvary(x, axes)


def _vma_of(x):
    try:
        return frozenset(getattr(jax.typeof(x), "vma", frozenset()))
    except Exception:
        return frozenset()


def _chunk_rows(f, row_chunk):
    R, n = f.shape
    pad = (-R) % row_chunk
    if pad:
        f = jnp.concatenate([f, jnp.full((pad, n), jnp.inf, f.dtype)], axis=0)
    return f.reshape(-1, row_chunk, n), pad


# ---------------- hard min with argmin-residual VJP ----------------


def _use_pallas():
    from edt_tpu.ops.compose import use_pallas_default

    return use_pallas_default()


def _minplus_hard_with_arg(f, w2):
    """(R, n) -> (d, argj) unmasked min-plus along axis -1 with argmin.

    On TPU this runs as a radius-pruned Pallas kernel
    (pallas_kernels.minplus_argmin_pallas, leftmost argmin on ties like
    jnp.argmin); elsewhere a brute-force jnp evaluation chunked over rows.
    """
    if _use_pallas():
        from edt_tpu.ops import pallas_kernels

        return pallas_kernels.minplus_argmin_pallas(f, w2, **_argmin_kwargs())

    R, n = f.shape
    i = jnp.arange(n, dtype=F32)
    diff = i[:, None] - i[None, :]
    quad = diff * diff

    def one(fc):
        cost = fc[:, None, :] + w2 * quad  # (rc, n_i, n_j)
        return jnp.min(cost, -1), jnp.argmin(cost, -1).astype(jnp.int32)

    if R <= _ROW_CHUNK:
        return one(f)
    fc, pad = _chunk_rows(f, _ROW_CHUNK)
    d, a = lax.map(one, fc)
    d = d.reshape(-1, n)[:R]
    a = a.reshape(-1, n)[:R]
    return d, a


def _minplus_hard_binary_with_arg(f, w2):
    """Closed-form (d, argj) for a two-valued height row f in {0, B}.

    The winner is the nearest zero on either side (cost w2 k^2) or the
    voxel itself at height B — every other candidate is dominated. Tie
    order matches the kernel/jnp.argmin (leftmost j): left zero, then
    self, then right zero. O(n) scans instead of the min-plus kernel;
    bit-identical to _minplus_hard_with_arg whenever f really is
    two-valued (tested).
    """
    R, n = f.shape
    # int16 scans (positions fit): halves the dominant scan traffic, same
    # trick as the wall field / segment_bounds
    idt = jnp.int16 if n <= 16000 else jnp.int32
    idx = jnp.arange(n, dtype=idt)
    zero = f <= 0.0
    pz = lax.cummax(jnp.where(zero, idx, idt(-1)), axis=1)
    nz = lax.cummin(jnp.where(zero, idx, idt(n)), axis=1, reverse=True)
    dl = w2 * (idx - pz).astype(F32) ** 2
    dr = w2 * (nz - idx).astype(F32) ** 2
    dl = jnp.where(pz >= 0, dl, INF)
    dr = jnp.where(nz < n, dr, INF)
    d = jnp.minimum(jnp.minimum(dl, f), dr)
    argj = jnp.where(
        dl == d, pz, jnp.where(f == d, jnp.broadcast_to(idx, f.shape), nz)
    )
    return d, argj.astype(jnp.int32)


def _link_dtype(n):
    """Residual-link dtype: offsets |argj - i| < n fit int16 for short rows,
    halving the fwd->bwd residual's HBM round trip (the argmin indices are
    the only tensor saved between the passes)."""
    return jnp.int16 if n <= 16000 else jnp.int32


def _binary_scan_grad():
    """Whether the binary-heights passes use the O(n) scan backward
    (default) instead of the offset-sweep gather kernel. Resolved pre-jit
    (feeds the lru_cache key of the custom-VJP makers) so toggling the
    env var mid-process takes effect."""
    import os

    return os.environ.get("EDT_TPU_BINARY_GRAD_SCAN", "1") == "1"


def _binary_grad_from_links(gm, o0, z):
    """df for the closed-form binary pass from its link residuals, in
    O(n) scans instead of the gather kernel's O(n * max_link) offset
    sweep.

    gm: (R, n) cotangents with inert (wall-won) voxels zeroed; o0: signed
    link offsets with 0 for self wins / zero sites / inert voxels; z:
    zero-site mask. Every winner of a binary row links to the NEAREST
    zero on its side, so the left-linked sources of a zero site are
    exactly the left-winners in the open interval up to the next zero
    (and mirrored for right links) — contiguous runs. Two segmented
    scans (reset at zero sites) therefore produce every zero site's
    gathered cotangent:

        df[j] = gm[j] * [o0[j] == 0]                      (self)
              + suffix_seg_sum(gm * [o0 < 0])[j + 1]      (left links)
              + prefix_seg_sum(gm * [o0 > 0])[j - 1]      (right links)

    Values match the gather kernels up to fp summation order (the scan
    reassociates the same contribution set); the blocky-headline regime
    this targets has per-block link maxima ~32-64 (PARITY.md), i.e. the
    sweep does ~65-129 whole-row roll+select steps that these ~2 log n
    scan steps replace."""
    hR = jnp.where(o0 > 0, gm, jnp.asarray(0.0, F32))
    hL = jnp.where(o0 < 0, gm, jnp.asarray(0.0, F32))

    def seg(h, zf):
        # classic segmented-sum scan: value resets AT flagged positions
        def op(a, b):
            fa, va = a
            fb, vb = b
            return fa | fb, jnp.where(fb, vb, va + vb)

        return lax.associative_scan(op, (zf, h), axis=1)[1]

    fs = seg(hR, z)
    rs = jnp.flip(seg(jnp.flip(hL, 1), jnp.flip(z, 1)), 1)
    fs_prev = jnp.pad(fs[:, :-1], ((0, 0), (1, 0)))
    rs_next = jnp.pad(rs[:, 1:], ((0, 0), (0, 1)))
    df_z = jnp.where(z, fs_prev + rs_next, jnp.asarray(0.0, F32))
    return jnp.where(o0 == 0, gm, jnp.asarray(0.0, F32)) + df_z


@functools.lru_cache(maxsize=4)
def _make_minplus_hard(binary_heights, scan_grad=False):
    @jax.custom_vjp
    def mhard(f, w2):
        d, _ = fwd_impl(f, w2)
        return d

    def fwd_impl(f, w2):
        if binary_heights:
            return _minplus_hard_binary_with_arg(f, w2)
        return _minplus_hard_with_arg(f, w2)

    def fwd(f, w2):
        n = f.shape[1]
        if not binary_heights and _use_pallas():
            from edt_tpu.ops import pallas_kernels

            # the kernel emits the narrow offset residual directly
            d, o = pallas_kernels.minplus_argmin_pallas(f, w2, **_argmin_kwargs(),
                                                        emit_offsets=True)
            return d, (o, w2, n)
        d, argj = fwd_impl(f, w2)
        idt = _link_dtype(n)
        # store residual offsets o = argj - i (narrow dtype); the bwd
        # consumes them directly (offsets-mode gather)
        o = (argj - jnp.arange(n, dtype=jnp.int32)[None, :]).astype(idt)
        if binary_heights and scan_grad:
            # zero sites marked with the dtype max (real links |o| < n
            # can't reach it): the scan backward segments on them
            o = jnp.where(f <= 0.0, jnp.asarray(jnp.iinfo(idt).max, idt), o)
        return d, (o, w2, n)

    def bwd(res, g):
        o, w2, n = res
        if binary_heights and scan_grad:
            omax = jnp.iinfo(o.dtype).max
            z = o == omax
            o0 = jnp.where(z, jnp.zeros((), o.dtype), o)
            if _use_pallas():
                from edt_tpu.ops import pallas_kernels

                df = pallas_kernels.binary_grad_scan_pallas(g, o)
            else:
                df = _binary_grad_from_links(g, o0, z)
            dw2 = jnp.sum(g * o0.astype(F32) ** 2)
            return df, dw2
        # d[r, i] = f[r, i + o[r, i]] + w2 * o^2
        if _use_pallas():
            from edt_tpu.ops import pallas_kernels

            cap = _grad_band_cap()
            df = pallas_kernels.minplus_grad_pallas(
                g, offsets=o,
                **({"band_cap": cap} if cap else {}))
        else:
            idx = jnp.arange(n, dtype=jnp.int32)[None, :]
            argj = idx + o.astype(jnp.int32)
            R = argj.shape[0]
            rows = jnp.arange(R, dtype=jnp.int32)[:, None]
            df = jnp.zeros(g.shape, g.dtype).at[rows, argj].add(g)
        dw2 = jnp.sum(g * o.astype(F32) ** 2)
        return df, dw2

    mhard.defvjp(fwd, bwd)
    return mhard


def _minplus_hard(f, w2, binary_heights=False):
    scan = _binary_scan_grad() if binary_heights else False
    return _make_minplus_hard(bool(binary_heights), scan)(f, _match_vma(w2, f))


# ---------------- softmin ----------------
#
# The softmin pass carries a custom VJP: naive AD through the logsumexp
# keeps the (rows, n_i, n_j) softmax-weight tensor as a residual — 16 GB
# at 256^3 — while the weights are cheap to *recompute* in the backward
# from the O(rows * n) forward output d (they are exp(-(cost - d)/t), and
# they sum to 1 over j by construction).


def _soft_fwd_impl(f, w2, t):
    R, n = f.shape
    i = jnp.arange(n, dtype=F32)
    diff = i[:, None] - i[None, :]
    quad = diff * diff

    def one(fc):
        cost = fc[:, None, :] + w2 * quad
        return -t * jax.nn.logsumexp(-cost / t, axis=-1)

    if R <= _ROW_CHUNK:
        return one(f)
    fc, pad = _chunk_rows(f, _ROW_CHUNK)
    d = lax.map(one, fc)
    return d.reshape(-1, n)[:R]


def _soft_bwd_impl(f, w2, d, g, t):
    """df[r, j] = sum_i g[r, i] p[r, i, j]; dw2 = sum g p q.

    p[r, i, j] = exp(-(f[r, j] + w2 q(i,j) - d[r, i]) / t) are the softmax
    weights, recomputed chunk-wise so only (chunk, n, n) transients exist.
    """
    R, n = f.shape
    i = jnp.arange(n, dtype=F32)
    diff = i[:, None] - i[None, :]
    quad = diff * diff

    def one(args):
        fc, dc, gc = args
        p = jnp.exp(-(fc[:, None, :] + w2 * quad - dc[:, :, None]) / t)
        df = jnp.einsum("ri,rij->rj", gc, p)
        dw2 = jnp.sum(gc[:, :, None] * p * quad)
        return df, dw2

    if R <= _ROW_CHUNK:
        return one((f, d, g))
    pad = (-R) % _ROW_CHUNK
    if pad:
        z = jnp.zeros((pad, n), F32)
        # padded rows: g = 0 contributes nothing; f/d finite keeps exp sane
        f = jnp.concatenate([f, z], axis=0)
        d = jnp.concatenate([d, z], axis=0)
        g = jnp.concatenate([g, z], axis=0)
    m = f.shape[0] // _ROW_CHUNK
    shp = (m, _ROW_CHUNK, n)
    df, dw2 = lax.map(one, (f.reshape(shp), d.reshape(shp), g.reshape(shp)))
    return df.reshape(-1, n)[:R], jnp.sum(dw2)


@functools.lru_cache(maxsize=32)
def _make_minplus_soft(t):
    """Softmin-plus with O(rows * n) residuals; t is a static float.

    Each distinct temperature compiles its own closure (and jit trace), so
    annealing schedules should quantize t to a modest set of values; the
    cache is bounded so an unquantized schedule degrades to recompiles
    rather than unbounded memory growth.
    """

    def _fwd_impl(f, w2):
        # Pallas on TPU: hard-min phase + shifted exp accumulation, pruned
        # to the contributing radius (pallas_kernels.softmin_pallas);
        # matches the exact logsumexp to f32 round-off. jnp elsewhere.
        if _use_pallas():
            from edt_tpu.ops import pallas_kernels

            return pallas_kernels.softmin_pallas(f, w2, t)
        return _soft_fwd_impl(f, w2, t)

    @jax.custom_vjp
    def msoft(f, w2):
        return _fwd_impl(f, w2)

    def fwd(f, w2):
        d = _fwd_impl(f, w2)
        return d, (f, w2, d)

    def bwd(res, g):
        f, w2, d = res
        if _use_pallas():
            from edt_tpu.ops import pallas_kernels

            df, e = pallas_kernels.softmin_grad_pallas(f, d, g, w2, t)
            return df, jnp.sum(g * e)
        return _soft_bwd_impl(f, w2, d, g, t)

    msoft.defvjp(fwd, bwd)
    return msoft


def _minplus_soft(f, w2, temperature):
    """Softmin-plus: -t * logsumexp(-(f_j + w2 (i-j)^2) / t) along axis -1."""
    return _make_minplus_soft(float(temperature))(f, _match_vma(w2, f))


# ---------------- passes and composition ----------------


def _soft_pass(f, w, black_border, temperature, binary_heights=False):
    """One differentiable min-plus pass along the last axis of f."""
    n = f.shape[-1]
    w = jnp.asarray(w, F32)
    w2 = w * w
    shape = f.shape
    f2 = f.reshape(-1, n)
    if temperature and temperature > 0.0:
        d = _minplus_soft(f2, w2, float(temperature))
    else:
        d = _minplus_hard(f2, w2, binary_heights=binary_heights)
    d = d.reshape(shape)
    if black_border:
        idx = jnp.arange(n, dtype=F32)
        lwall = w2 * (idx + 1.0) ** 2
        rwall = w2 * (n - idx) ** 2
        walls = jnp.minimum(lwall, rwall)
        if temperature and temperature > 0.0:
            t = jnp.asarray(temperature, F32)
            d = -t * jnp.logaddexp(-d / t, -walls / t)
        else:
            # ties go to the min-plus candidate (not the constant wall) so
            # a source exactly at the wall distance keeps its gradient —
            # same subgradient choice as multilabel_edtsq
            d = jnp.where(d <= walls, d, walls)
    return d


def edtsq_from_heights(h, anisotropy, black_border=False, temperature=0.0,
                       axis_name=None, binary_heights=False):
    """Differentiable squared EDT of a height field (N-D, separable).

    h: (..., ) float32 heights; 0 at sources, +barrier at solid foreground.
    Returns squared distances d with dd/dh defined everywhere (subgradient
    at ties for temperature == 0).

    axis_name: if set, h is the local slab of a volume sharded along axis 0
    inside a shard_map over that mesh axis; the axis-0 pass rotates the
    sharded axis via all_to_all (differentiable — its transpose is the
    reverse all_to_all), exactly like edt_tpu.parallel.edtsq_sharded.
    The rotation wraps just that one pass, so it runs at its natural
    position in the ascending-pitch order: sharded and single-chip pass
    composition are IDENTICAL, and results match to f32 round-off at any
    temperature (order matters at t > 0, where softmin composition is
    order-dependent — tests/test_sharded.py).

    binary_heights: caller's promise that h takes exactly two values
    {0, B} (hard masks — the common inference case, or straight-through
    training). At temperature 0 the first pass then runs as a closed form
    (nearest-zero scans) with the same values, argmins, and gradients the
    kernel would produce; later passes see smooth fields and use the
    kernel regardless. Invalid (silently wrong values) if h is not
    two-valued.
    """
    nd = h.ndim
    anis_np = np.asarray(anisotropy, np.float32).reshape(nd)
    anisotropy = jnp.asarray(anis_np)
    f = h.astype(F32)
    # ascending-pitch pass order (like api._sorted_axis_order): running
    # cheap-pitch axes first keeps later passes' pruning radii small.
    # Under sharding the axis-0 pass wraps itself in the all_to_all
    # rotation at its natural position, so the order (and hence the t > 0
    # softmin composition) is identical to the single-chip path.
    if axis_name is not None and nd != 3:
        raise ValueError("sharded soft EDT requires a 3-D volume")
    order = sorted(range(nd), key=lambda a: (float(anis_np[a]), -a))
    for step, ax in enumerate(order):
        rotated = axis_name is not None and ax == 0
        if rotated:
            f = lax.all_to_all(f, axis_name, split_axis=2, concat_axis=0,
                               tiled=True)
        f = jnp.moveaxis(
            _soft_pass(jnp.moveaxis(f, ax, -1), anisotropy[ax], black_border,
                       temperature,
                       binary_heights=binary_heights and step == 0),
            -1,
            ax,
        )
        if rotated:
            f = lax.all_to_all(f, axis_name, split_axis=0, concat_axis=2,
                               tiled=True)
    return f


def default_barrier(shape, anisotropy):
    """A height larger than any achievable squared distance in the volume."""
    anisotropy = jnp.asarray(anisotropy, F32).reshape(len(shape))
    return jnp.sum((anisotropy * jnp.asarray(shape, F32)) ** 2) * 4.0


def soft_edtsq(occupancy, anisotropy, black_border=False, barrier=None,
               temperature=0.0, axis_name=None, binary_occupancy=False):
    """Squared EDT of a soft occupancy map (1 = foreground, 0 = background).

    Differentiable w.r.t. occupancy. With binary occupancy and the default
    barrier this matches the hard binary edtsq wherever the hard result is
    finite, and returns ~barrier where it is infinite.

    For TRAINING, pick ``barrier`` near the distance scale the loss cares
    about rather than the (deliberately huge) default: with black_border
    the h-independent wall parabolas cap every distance, and a barrier far
    above that cap leaves gradients exponentially suppressed at
    temperature > 0 (and exactly zero at temperature == 0).

    binary_occupancy=True promises occupancy takes only values {0, 1}
    (hard masks / straight-through estimators): the first pass then runs
    as a closed form at temperature 0, same values and gradients, much
    faster. Silently wrong for genuinely soft occupancies.
    """
    if barrier is None:
        barrier = default_barrier(occupancy.shape, anisotropy)
    h = jnp.asarray(barrier, F32) * occupancy.astype(F32)
    return edtsq_from_heights(h, anisotropy, black_border, temperature,
                              axis_name=axis_name,
                              binary_heights=binary_occupancy)


# ---------------- wall-faithful differentiable multi-label EDT ----------------
#
# The hard multi-label transform (reference edt.hpp:99-103, README.md:21-24)
# treats label boundaries as walls: a voxel adjacent to a differing label
# gets distance w (the differing SITE acts as a zero-height source), so the
# per-label transforms equal the binary EDT of each label's own mask. The
# differentiable version below keeps that exact semantics:
#
#     d(x) = min( hard_edtsq(x),
#                 min_{v : L(v) == L(x)} ( B * occ(v) + ||x - v||^2_w ) )
#
# for foreground x (0 at background). Labels stay discrete (they define the
# structural walls — constants); ``occ`` is the differentiable per-voxel
# solidity: an occupancy hole (occ(v) < 1) inside a label acts as a soft
# source exactly as in the binary soft transform. At occ == 1 the forward
# equals the hard multi-label edtsq EXACTLY (wall-at-distance-w boundary
# voxels included) and the gradient is zero; with occ = (labels != 0) the
# forward is still exactly hard edtsq, and cotangents route B to the
# winning background sources (ties between a zero-height candidate and the
# structural wall resolve to the candidate, so background sources keep
# their gradient).
#
# Why it decomposes: the unmasked min-plus passes compose to the FULL
# pairwise min over all voxels v of (h(v) + ||x - v||^2), and per-pass wall
# clamping composes to exactly the hard transform's wall propagation
# (reference squared_edt_1d_parabolic_multi_seg, edt.hpp:344-377). Foreign
# candidates (differing label or background, any height >= 0) are subsumed
# by the wall that sits between — the same lemma the hard kernels rely on —
# so only same-label heights and the structural walls survive the min.


# wall-count sentinel values ("open side" -> INF), single-sourced from the
# leaf module shared with ops.pallas_kernels — the walled argmin kernel
# consumes the counts directly and forms w2*cnt^2 in-register, halving the
# wall stream's HBM traffic vs f32 fields.
from edt_tpu.ops.wall_sentinels import WALL_SENT16, WALL_SENT32  # noqa: E402


def _wall_counts(labels, axis, black_border):
    """Distance IN VOXELS to the nearest label-boundary wall along `axis`,
    in labels' own layout (int16 when the axis fits, sentinel = open side).

    min(i - seg_start + 1, seg_end - i) per voxel — the implicit border
    parabolas of the reference (edt.hpp:231-243) extended to every
    interior segment boundary; squared and scaled lazily (in-kernel for
    the Pallas path). A constant w.r.t. heights (labels are discrete).
    Int16 scans measured ~2x the int32+f32 formulation at 512^3; computing
    in the ORIGINAL layout means the per-pass transpose moves 2-byte
    counts instead of 4-byte labels.
    """
    n = labels.shape[axis]
    if n <= 16000:  # 2n + 2 must fit the dtype
        idt, sent = jnp.int16, WALL_SENT16
    else:
        idt, sent = jnp.int32, WALL_SENT32
    shape1 = [1] * labels.ndim
    shape1[axis] = n
    idx = jnp.arange(n, dtype=idt).reshape(shape1)
    neq = (lax.slice_in_dim(labels, 1, n, axis=axis)
           != lax.slice_in_dim(labels, 0, n - 1, axis=axis))
    pad_shape = list(labels.shape)
    pad_shape[axis] = 1
    edge = jnp.full(pad_shape, black_border, dtype=bool)
    is_start = jnp.concatenate([edge, neq], axis=axis)
    is_end = jnp.concatenate([neq, edge], axis=axis)
    # li = i - start + 1 with start = last wall position; a missing marker
    # (open-left run) yields li = i + n + 2 > n, the open sentinel
    li = idx - lax.cummax(jnp.where(is_start, idx, idt(-(n + 1))),
                          axis=axis) + 1
    ri = lax.cummin(jnp.where(is_end, idx, idt(2 * n)), axis=axis,
                    reverse=True) + 1 - idx
    wmin = jnp.minimum(li, ri)  # <= 2n + 2, exact
    return jnp.where(wmin > n, idt(sent), wmin)


def _walls_from_counts(cnt, w2):
    """f32 squared wall field (INF = open) from integer wall counts."""
    sent = WALL_SENT16 if cnt.dtype == jnp.int16 else WALL_SENT32
    c = cnt.astype(F32)
    return jnp.where(cnt >= sent, INF, w2 * c * c)


@functools.lru_cache(maxsize=4)
def _make_minplus_hard_walled(binary_heights, scan_grad=False):
    """Hard min-plus fused with the wall clamp: out = where(d <= walls, d,
    walls), ties to the candidate.

    Functionally identical to _minplus_hard followed by the where — but the
    fused VJP (a) masks cotangents at wall-won voxels before the gather and
    (b) rewrites their argmin links to zero length, so the gather kernel's
    link-length bound (moff) reflects only REAL source links. Without this,
    wall-won voxels carry arbitrary-length links into barrier-height
    regions (the unmasked kernel's argmin there is meaningless garbage that
    the clamp discards), dragging the whole backward through full
    tile-pair gathers — measured 3x the entire backward at 512^3.
    """

    def fwd_impl(f, w2, cnt):
        """(out, argj_enc): wall-clamped min-plus; wall wins carry
        argj_enc = ~i (negative), candidate wins their argmin index.
        ``cnt``: integer wall COUNTS (see _wall_counts) — the Pallas
        kernel streams them directly (half the f32 field's HBM)."""
        if not binary_heights and _use_pallas():
            # fused kernel: wall min + arg encoding + wall-capped radius
            # pruning happen in-kernel (one stream, no clamp round-trip)
            from edt_tpu.ops import pallas_kernels

            return pallas_kernels.minplus_argmin_pallas(f, w2, walls=cnt,
                                                        **_argmin_kwargs())
        walls = _walls_from_counts(cnt, w2)
        if binary_heights:
            d, argj = _minplus_hard_binary_with_arg(f, w2)
        else:
            d, argj = _minplus_hard_with_arg(f, w2)
        win = d <= walls
        idx = jnp.arange(f.shape[1], dtype=jnp.int32)[None, :]
        return jnp.where(win, d, walls), jnp.where(win, argj, ~idx)

    @jax.custom_vjp
    def mhw(f, w2, cnt):
        return fwd_impl(f, w2, cnt)[0]

    def fwd(f, w2, cnt):
        n = f.shape[1]
        if not binary_heights and _use_pallas():
            from edt_tpu.ops import pallas_kernels

            # kernel emits the narrow offset residual (wall wins already
            # sentinel-encoded) — no XLA conversion pass
            out, o = pallas_kernels.minplus_argmin_pallas(
                f, w2, walls=cnt, emit_offsets=True, **_argmin_kwargs())
            return out, (o, w2, n, cnt)
        out, argj = fwd_impl(f, w2, cnt)
        idt = _link_dtype(n)
        sent = jnp.asarray(jnp.iinfo(idt).min, idt)  # wall-win marker
        idx = jnp.arange(n, dtype=jnp.int32)[None, :]
        # residual offsets, narrow dtype; |o| < n < |sent| so the marker
        # can never collide with a real link
        o = jnp.where(argj >= 0, (argj - idx).astype(idt), sent)
        if binary_heights and scan_grad:
            # zero sites (always candidate wins: d = 0 < any wall) marked
            # with the dtype max for the scan backward's segmentation
            o = jnp.where(f <= 0.0, jnp.asarray(jnp.iinfo(idt).max, idt), o)
        return out, (o, w2, n, cnt)

    def bwd(res, g):
        o, w2, n, cnt = res
        sent = int(jnp.iinfo(o.dtype).min)
        win = o != sent
        gm = jnp.where(win, g, jnp.asarray(0.0, F32))
        if binary_heights and scan_grad:
            z = o == jnp.iinfo(o.dtype).max
            o0 = jnp.where(win & ~z, o, jnp.zeros((), o.dtype))
            if _use_pallas():
                from edt_tpu.ops import pallas_kernels

                df = pallas_kernels.binary_grad_scan_pallas(g, o,
                                                            off_sent=sent)
            else:
                df = _binary_grad_from_links(gm, o0, z)
            dw2 = jnp.sum(gm * o0.astype(F32) ** 2)
            c = cnt.astype(F32)
            dw2 = dw2 + jnp.sum(
                jnp.where(win, jnp.asarray(0.0, F32), g * c * c))
            dcnt = np.zeros(cnt.shape, jax.dtypes.float0)
            return df, dw2, dcnt
        om = jnp.where(win, o, jnp.zeros((), o.dtype))
        if _use_pallas():
            from edt_tpu.ops import pallas_kernels

            # raw g + sentinel offsets: wall wins are inert in-kernel, no
            # gm/links materialization at all
            cap = _grad_band_cap()
            df = pallas_kernels.minplus_grad_pallas(
                g, offsets=o, off_sent=sent,
                **({"band_cap": cap} if cap else {}))
        else:
            idx = jnp.arange(n, dtype=jnp.int32)[None, :]
            links = idx + om.astype(jnp.int32)  # wall wins: 0-length link
            rows = jnp.arange(o.shape[0], dtype=jnp.int32)[:, None]
            df = jnp.zeros(g.shape, g.dtype).at[rows, links].add(gm)
        dw2 = jnp.sum(gm * om.astype(F32) ** 2)
        # wall-won voxels return out = w2 * cnt^2, so they contribute
        # g * cnt^2 to dw2 (wall wins always have finite counts: sentinel
        # counts mean an INF wall, which never beats the candidate).
        # cnt rides the residuals for this term alone; when w2 is a
        # constant (every in-repo caller) the whole dw2 path is dead code
        # XLA eliminates, residual included.
        c = cnt.astype(F32)
        dw2 = dw2 + jnp.sum(jnp.where(win, jnp.asarray(0.0, F32), g * c * c))
        # integer wall counts take a float0 cotangent (walls are
        # label-derived constants)
        dcnt = np.zeros(cnt.shape, jax.dtypes.float0)
        return df, dw2, dcnt

    mhw.defvjp(fwd, bwd)
    return mhw


def _multilabel_pass(f, wall_cnt_ax, w, temperature, binary_heights=False):
    """One differentiable multi-label min-plus pass along the last axis.

    wall_cnt_ax: integer wall counts along the same (last) axis — from
    _wall_counts, precomputed in the volume's original layout so the
    per-pass transpose moves 2-byte counts, not 4-byte labels. Border
    behavior is fully encoded in the counts (black_border edges become
    walls in _wall_counts) — there is deliberately no per-pass border
    handling here."""
    n = f.shape[-1]
    w = jnp.asarray(w, F32)
    w2 = w * w
    shape = f.shape
    f2 = f.reshape(-1, n)
    if temperature and temperature > 0.0:
        walls = _walls_from_counts(wall_cnt_ax, w2)
        d = _minplus_soft(f2, w2, float(temperature)).reshape(shape)
        t = jnp.asarray(temperature, F32)
        return -t * jnp.logaddexp(-d / t, -walls / t)
    # ties go to the min-plus candidate (d <= walls), so a zero-height
    # source at the wall site keeps its gradient
    scan = _binary_scan_grad() if binary_heights else False
    d = _make_minplus_hard_walled(bool(binary_heights), scan)(
        f2, _match_vma(w2, f2), _match_vma(wall_cnt_ax.reshape(-1, n), f2))
    return d.reshape(shape)


def wall_counts_for(labels, black_border=False, axis_name=None):
    """Precompute multilabel_edtsq's label analysis for a FIXED label
    volume: the per-axis wall-count fields (tuple, one per axis, each in
    the volume's original layout).

    The wall counts are the only thing multilabel_edtsq derives from
    labels besides the final background mask; when labels are static
    across training steps (optimizing occupancy against a fixed
    segmentation), passing the result as ``wall_counts=`` skips the two
    int16 scans per axis on every step.

    axis_name: set when labels is the local slab of a volume sharded
    along axis 0 inside a shard_map (matching multilabel_edtsq's
    axis_name). The axis-0 scan then runs in the rotated layout (a local
    slab never sees the full axis 0, so a local scan would plant phantom
    walls at shard boundaries) and is rotated back, so every returned
    field is in the original sharded layout. multilabel_edtsq re-rotates
    the axis-0 field per call — an int16 all_to_all, half the bytes of
    the label rotation it replaces, on top of skipping the scans."""
    labels = jnp.asarray(labels)
    out = []
    for ax in range(labels.ndim):
        if axis_name is not None and ax == 0:
            lab = lax.all_to_all(labels, axis_name, split_axis=2,
                                 concat_axis=0, tiled=True)
            c = _wall_counts(lab, 0, black_border)
            c = lax.all_to_all(c, axis_name, split_axis=0, concat_axis=2,
                               tiled=True)
        else:
            c = _wall_counts(labels, ax, black_border)
        out.append(c)
    return tuple(out)


def multilabel_edtsq(labels, occupancy=None, anisotropy=None,
                     black_border=False, barrier=None, temperature=0.0,
                     axis_name=None, binary_occupancy=None,
                     wall_counts=None):
    """Differentiable multi-label squared EDT, wall-faithful to the
    reference semantics (boundary voxels at distance w, edt.hpp:99-103).

    labels: integer volume (0 = background) — discrete, non-differentiable;
    defines the structural label-boundary walls.
    occupancy: differentiable per-voxel solidity in [0, 1]. Default
    (labels != 0): background voxels are zero-height sources, and the
    forward then equals the hard ``edtsq(labels)`` exactly (up to f32
    rounding of w^2 k^2 vs (w k)^2 for non-integer anisotropy), while
    gradients w.r.t. occupancy route to the winning background sources.
    barrier: B above; must exceed every finite hard distance for exact
    forward parity (the default does). Voxels whose hard distance is INF
    (open borders) saturate near B * occ instead.
    temperature: 0 = hard min (argmin-residual VJP); > 0 = exact separable
    softmin (smooth everywhere, wall clamps blend via logaddexp).
    axis_name: set inside shard_map for volumes sharded along axis 0 (the
    axis-0 pass rotates shards via all_to_all, like edtsq_sharded).
    binary_occupancy: promise that occupancy is two-valued {0, 1} — first
    pass runs closed-form (same values/argmins/gradients). Defaults to
    True when occupancy is omitted (the mask is two-valued by
    construction).
    wall_counts: optional precomputed per-axis wall-count fields from
    ``wall_counts_for(labels, black_border)`` — must come from the SAME
    labels, black_border, and axis_name (silently wrong otherwise). Skips
    the label analysis scans when labels are fixed across calls; under
    sharding, pass wall_counts_for(..., axis_name=...) computed inside
    the same shard_map.
    """
    labels = jnp.asarray(labels)
    nd = labels.ndim
    anis_np = np.asarray(
        anisotropy if anisotropy is not None else (1.0,) * nd, np.float32
    ).reshape(nd)
    anisotropy = jnp.asarray(anis_np)
    if barrier is None:
        barrier = default_barrier(labels.shape, anisotropy)
    if occupancy is None:
        occupancy = labels != 0
        if binary_occupancy is None:
            binary_occupancy = True
    binary_occupancy = bool(binary_occupancy)
    f = jnp.asarray(barrier, F32) * occupancy.astype(F32)

    if axis_name is not None and nd != 3:
        raise ValueError("sharded multi-label soft EDT requires 3-D")
    # full ascending-pitch order; the rotated axis-0 pass runs at its
    # natural position so sharded == single-chip composition exactly
    order = sorted(range(nd), key=lambda a: (float(anis_np[a]), -a))
    for step, ax in enumerate(order):
        rotated = axis_name is not None and ax == 0
        if rotated:
            f = lax.all_to_all(f, axis_name, split_axis=2, concat_axis=0,
                               tiled=True)
            if wall_counts is not None:
                # precomputed axis-0 counts (original layout, from
                # wall_counts_for(..., axis_name=...)) ride the same
                # rotation as f — int16, half the label rotation's bytes
                cnt = lax.all_to_all(wall_counts[0], axis_name,
                                     split_axis=2, concat_axis=0,
                                     tiled=True)
            else:
                lab = lax.all_to_all(labels, axis_name, split_axis=2,
                                     concat_axis=0, tiled=True)
                cnt = _wall_counts(lab, 0, black_border)
        elif wall_counts is not None:
            cnt = wall_counts[ax]
        else:
            # counts in the ORIGINAL layout (scans run along any axis);
            # the pass transpose then moves int16 counts, not u32 labels
            cnt = _wall_counts(labels, ax, black_border)
        f = jnp.moveaxis(
            _multilabel_pass(
                jnp.moveaxis(f, ax, -1), jnp.moveaxis(cnt, ax, -1),
                anisotropy[ax], temperature,
                binary_heights=binary_occupancy and step == 0,
            ),
            -1,
            ax,
        )
        if rotated:
            f = lax.all_to_all(f, axis_name, split_axis=0, concat_axis=2,
                               tiled=True)
    return jnp.where(labels == 0, jnp.asarray(0.0, F32), f)


def soft_sdfsq(occupancy, anisotropy, black_border=False, barrier=None,
               temperature=0.0, axis_name=None):
    """Differentiable signed squared distance: d(occ) - d(1 - occ)."""
    fg = soft_edtsq(occupancy, anisotropy, black_border, barrier, temperature,
                    axis_name)
    bg = soft_edtsq(1.0 - occupancy.astype(F32), anisotropy, black_border,
                    barrier, temperature, axis_name)
    return fg - bg
