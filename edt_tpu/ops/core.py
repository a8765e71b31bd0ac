"""Core 1-D EDT passes, re-derived for TPU (no pointer-walking, no stacks).

The reference CPU library decomposes the N-D multi-label EDT into 1-D passes
(Saito–Toriwaki decomposition; see /root/reference/src/edt.hpp:379-410):

  pass 1: Rosenfeld–Pfaltz two-sweep along the first axis
          (reference squared_edt_1d_multi_seg, edt.hpp:70-119)
  pass 2+: Felzenszwalb–Huttenlocher lower-envelope-of-parabolas along each
          remaining axis, restarted per same-label segment
          (reference squared_edt_1d_parabolic[_multi_seg], edt.hpp:168-377)

Both passes are *sequential scans* on CPU. Here they are re-derived as
branch-free array programs that vectorize across thousands of rows on the
TPU VPU:

  pass 1 becomes a closed form over per-voxel segment bounds, where the
  bounds come from a cummax/cummin scan (XLA-native, O(n)):

      d(i) = min( w * (i - seg_start(i) + 1),  w * (seg_end(i) - i) )

  with INF substituted when a segment touches an open (non-black) border,
  0 at background voxels, squared at the end. This reproduces the reference
  semantics exactly: a voxel adjacent to a differing label has distance w
  (the label boundary acts as a wall), background stays 0.

  pass 2 becomes a segment-masked *min-plus (tropical) transform*:

      d(i) = min_{j : seg(j) == seg(i)} ( f(j) + w^2 (i - j)^2 )

  followed by the implicit border parabolas of the reference
  (edt.hpp:231-243): d(i) = min(d(i), w^2 (i - seg_start + 1)^2,
  w^2 (seg_end - i)^2), each gated on whether that side of the segment is a
  wall. The lower envelope of parabolas *is* this min; evaluating it
  directly trades the O(n) sequential hull scan for O(n^2/row) of perfectly
  vectorizable VPU work with zero control flow — a large win on TPU where
  thousands of rows run in parallel. (A Pallas kernel version with tile-level
  pruning lives in pallas_kernels.py.)

No special INF clamping is needed (reference tofinite/toinfinite dance,
edt.hpp:39-53): the min-plus form never subtracts infinities, so INF
propagates correctly through f32 arithmetic without NaNs.

All functions operate along the LAST axis; callers move axes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
INF = jnp.inf


def segment_bounds(labels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-voxel [start, end) of the contiguous same-label run along axis -1.

    Replaces the sequential segment walking of the reference
    (edt.hpp:344-377) with two O(n) XLA scans. ``start`` doubles as a
    segment id: voxels share a segment iff they share a start.
    """
    n = labels.shape[-1]
    # int16 scans when positions fit: the cummax/cummin lower to log-n
    # shifted-select passes over HBM, so halving the element width halves
    # the dominant traffic (values are bounded by n)
    idt = jnp.int16 if n <= 32767 else jnp.int32
    idx = jnp.arange(n, dtype=idt)
    neq = labels[..., 1:] != labels[..., :-1]
    pad_shape = labels.shape[:-1] + (1,)
    true_pad = jnp.ones(pad_shape, dtype=bool)
    is_start = jnp.concatenate([jnp.broadcast_to(true_pad, pad_shape), neq], axis=-1)
    is_end = jnp.concatenate([neq, jnp.broadcast_to(true_pad, pad_shape)], axis=-1)
    start = lax.cummax(
        jnp.where(is_start, idx, idt(0)), axis=labels.ndim - 1
    ).astype(jnp.int32)
    end = lax.cummin(
        jnp.where(is_end, idx + idt(1), idt(n)), axis=labels.ndim - 1,
        reverse=True,
    ).astype(jnp.int32)
    return start, end


def rp_pass_sq(labels: jax.Array, w: jax.Array, black_border: bool) -> jax.Array:
    """First-axis multi-label squared EDT along axis -1 (closed form).

    Semantics match reference squared_edt_1d_multi_seg (edt.hpp:70-119):
    background = 0; first voxel of a label run is at distance w from the
    wall (including the retro-patched d[i-1] at a label change,
    edt.hpp:99-103); a run touching the volume edge is INF unless
    black_border, in which case the edge acts as a wall (edt.hpp:85-90).
    """
    n = labels.shape[-1]
    if n == 0:
        return jnp.zeros(labels.shape, F32)
    w = jnp.asarray(w, F32)
    start, end = segment_bounds(labels)
    idx = jnp.arange(n, dtype=jnp.int32)
    dl = (idx - start + 1).astype(F32) * w
    dr = (end - idx).astype(F32) * w
    if not black_border:
        dl = jnp.where(start > 0, dl, INF)
        dr = jnp.where(end < n, dr, INF)
    d = jnp.minimum(dl, dr)
    d = jnp.where(labels == 0, jnp.asarray(0.0, F32), d)
    return d * d


def _minplus_chunk(f: jax.Array, seg, w2: jax.Array) -> jax.Array:
    """Brute-force min-plus over a (rows, n) chunk.

    d[r, i] = min_j { f[r, j] + w2 * (i - j)^2 }, restricted to
    seg[r, j] == seg[r, i] when ``seg`` is given. Passing seg=None is the
    multi-label fast path: foreign-segment candidates can never beat the
    wall parabolas that border_envelopes_sq min's in afterward (a foreign j
    has |i - j| >= i's distance to its segment edge + 1 and f[j] >= 0), so
    the mask is redundant in the full parabolic pass.
    """
    n = f.shape[-1]
    i = jnp.arange(n, dtype=F32)
    diff = i[:, None] - i[None, :]
    quad = w2 * (diff * diff)  # (n_i, n_j)
    cost = f[..., None, :] + quad  # (rows, n_i, n_j)
    if seg is not None:
        same = seg[..., None, :] == seg[..., :, None]  # [r,i,j]: seg(j)==seg(i)
        cost = jnp.where(same, cost, INF)
    return jnp.min(cost, axis=-1)


def minplus_masked(
    f: jax.Array,
    seg,
    w2: jax.Array,
    row_chunk: int = 256,
) -> jax.Array:
    """Min-plus transform along axis -1, chunked over rows.

    ``f`` is (R, n); ``seg`` is (R, n) for the segment-masked form or None
    for the unmasked form (see _minplus_chunk). Rows are processed
    ``row_chunk`` at a time via lax.map so the fused (rows, n, n)
    broadcast+reduce never exceeds a bounded footprint.
    """
    R, n = f.shape
    if R <= row_chunk:
        return _minplus_chunk(f, seg, w2)
    pad = (-R) % row_chunk
    if pad:
        f = jnp.concatenate([f, jnp.zeros((pad, n), f.dtype)], axis=0)
        if seg is not None:
            seg = jnp.concatenate([seg, jnp.zeros((pad, n), seg.dtype)], axis=0)
    m = f.shape[0] // row_chunk
    fc = f.reshape(m, row_chunk, n)
    if seg is None:
        out = lax.map(lambda t: _minplus_chunk(t, None, w2), fc)
    else:
        sc = seg.reshape(m, row_chunk, n)
        out = lax.map(lambda t: _minplus_chunk(t[0], t[1], w2), (fc, sc))
    out = out.reshape(m * row_chunk, n)
    return out[:R] if pad else out


def border_envelopes_sq(
    d: jax.Array,
    start: jax.Array,
    end: jax.Array,
    n: int,
    w2: jax.Array,
    black_border: bool,
) -> jax.Array:
    """Apply the implicit border parabolas of the reference (edt.hpp:231-243).

    Interior segment boundaries always act as walls
    (reference squared_edt_1d_parabolic_multi_seg, edt.hpp:359-375:
    black_border_left = black_border || segment does not start at 0,
    black_border_right analogously).
    """
    idx = jnp.arange(d.shape[-1], dtype=jnp.int32)
    li = (idx - start + 1).astype(F32)
    ri = (end - idx).astype(F32)
    lwall = w2 * (li * li)
    rwall = w2 * (ri * ri)
    if not black_border:
        lwall = jnp.where(start > 0, lwall, INF)
        rwall = jnp.where(end < n, rwall, INF)
    return jnp.minimum(d, jnp.minimum(lwall, rwall))


def parabolic_pass_sq(
    f: jax.Array,
    labels: jax.Array,
    w: jax.Array,
    black_border: bool,
    row_chunk: int = 256,
    minplus_fn=None,
    binary: bool = False,
    parabolic_fn=None,
) -> jax.Array:
    """Multi-label parabolic (FH) squared-EDT pass along axis -1.

    ``f`` holds squared distances from previous passes; ``labels`` drives the
    per-segment restarts. Equivalent to reference
    squared_edt_1d_parabolic_multi_seg applied per row (edt.hpp:344-377),
    evaluated as a masked min-plus instead of a sequential envelope scan.

    ``minplus_fn``, if given, overrides the core min-plus evaluation
    (e.g. with a Pallas TPU kernel); signature
    (f2d, seg_start2d, seg_end2d, w2, masked) -> d2d.

    ``binary=True`` is the fast path for two-valued volumes (reference
    _binary_edt3dsq, edt.hpp:487-576): background voxels carry f == 0 and
    act as sources themselves, which makes segment masking and interior
    wall parabolas redundant — the unmasked min-plus gives identical
    results at ~1.8x the throughput.
    """
    n = f.shape[-1]
    if n == 0:
        return f
    w = jnp.asarray(w, F32)
    w2 = w * w
    shape = f.shape
    f2 = f.reshape(-1, n)

    if parabolic_fn is not None:
        # fully fused kernel: segment bounds, min-plus, walls, zeroing
        d = parabolic_fn(f2, labels.reshape(-1, n), w2, black_border, binary)
        return d.reshape(shape)

    if binary:
        if minplus_fn is None:
            d = minplus_masked(f2, None, w2, row_chunk=row_chunk)
        else:
            # seg arrays are unused with masked=False; pass f2 placeholders
            d = minplus_fn(f2, f2, f2, w2, masked=False)
        d = d.reshape(shape)
        if black_border:
            idx = jnp.arange(n, dtype=jnp.int32)
            li = (idx + 1).astype(F32)
            ri = (n - idx).astype(F32)
            d = jnp.minimum(d, w2 * jnp.minimum(li * li, ri * ri))
        return d

    start, end = segment_bounds(labels)
    if minplus_fn is None:
        # unmasked: the wall envelopes below subsume foreign-segment
        # candidates exactly (see _minplus_chunk docstring)
        d = minplus_masked(f2, None, w2, row_chunk=row_chunk)
    else:
        # masked=True only engages segment-extent pruning in the kernel
        d = minplus_fn(f2, start.reshape(-1, n), end.reshape(-1, n), w2,
                       masked=True)
    d = d.reshape(shape)

    d = border_envelopes_sq(d, start, end, n, w2, black_border)
    d = jnp.where(labels == 0, jnp.asarray(0.0, F32), d)
    return d
