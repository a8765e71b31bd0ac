"""Host-side (NumPy) reference implementation of the multi-label EDT.

Independent reimplementation of the published algorithms — Rosenfeld &
Pfaltz (1966) first pass, Felzenszwalb & Huttenlocher (2012) parabolic
envelope pass with per-segment restarts — matching the semantics of the
reference library (/root/reference/src/edt.hpp:70-377). Used as:

  * an exact oracle in the test suite (independent of scipy), and
  * a fallback in the NumPy API for pathologically long axes where the
    device-side O(n^2/row) min-plus evaluation would be wasteful
    (e.g. a (46342, 1) array).

Computation uses float64 internally for the envelope intercepts (like the
reference, edt.hpp:187-214) and emits float32.
"""

from __future__ import annotations

import numpy as np


def _rp_row_sq(labels: np.ndarray, w: float, black_border: bool) -> np.ndarray:
    """Closed-form Rosenfeld-Pfaltz multi-label squared EDT of one row."""
    n = labels.shape[0]
    d = np.empty(n, dtype=np.float64)
    if n == 0:
        return d
    idx = np.arange(n)
    neq = labels[1:] != labels[:-1]
    starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
    ends = np.concatenate([starts[1:], [n]])
    seg_of = np.searchsorted(starts, idx, side="right") - 1
    s = starts[seg_of]
    e = ends[seg_of]
    dl = (idx - s + 1.0) * w
    dr = (e - idx + 0.0) * w
    if not black_border:
        dl = np.where(s > 0, dl, np.inf)
        dr = np.where(e < n, dr, np.inf)
    d = np.minimum(dl, dr)
    d[labels == 0] = 0.0
    return d * d


def _parabolic_segment_sq(f: np.ndarray, w: float, bb_left: bool, bb_right: bool):
    """FH lower-envelope scan of one same-label segment (in place).

    Math per Felzenszwalb & Huttenlocher, Theory of Computing 8 (2012),
    anisotropy-corrected as in reference edt.hpp:203-215; the implicit
    border parabolas follow edt.hpp:231-243.
    """
    n = f.shape[0]
    if n == 0:
        return
    w2 = float(w) * float(w)
    ff = f.astype(np.float64)
    # Clamp infinities so intercepts stay finite (reference tofinite,
    # edt.hpp:39-45 — avoids INF - INF in the intercept formula).
    big = np.finfo(np.float32).max - 1.0
    ffc = np.minimum(ff, big)
    v = np.zeros(n, dtype=np.int64)
    ranges = np.empty(n + 1, dtype=np.float64)
    ranges[0] = -np.inf
    ranges[1] = np.inf
    k = 0
    for i in range(1, n):
        while True:
            j = v[k]
            factor = (i - j) * w2
            s_int = (ffc[i] - ffc[j] + factor * (i + j)) / (2.0 * factor)
            if k > 0 and s_int <= ranges[k]:
                k -= 1
            else:
                break
        k += 1
        v[k] = i
        ranges[k] = s_int
        ranges[k + 1] = np.inf

    k = 0
    for i in range(n):
        while ranges[k + 1] < i:
            k += 1
        val = w2 * (i - v[k]) ** 2 + ffc[v[k]]
        if bb_left:
            val = min(val, w2 * (i + 1.0) ** 2)
        if bb_right:
            val = min(val, w2 * (n - i + 0.0) ** 2)
        f[i] = np.float32(val)
    # restore infinities (reference toinfinite, edt.hpp:47-53)
    f[f >= big] = np.inf


def _parabolic_row_sq(f, labels, w, black_border):
    """Multi-segment parabolic pass over one row (reference edt.hpp:344-377)."""
    n = labels.shape[0]
    if n == 0:
        return
    neq = labels[1:] != labels[:-1]
    starts = np.concatenate([[0], np.flatnonzero(neq) + 1])
    ends = np.concatenate([starts[1:], [n]])
    for s, e in zip(starts, ends):
        if labels[s] == 0:
            continue
        _parabolic_segment_sq(
            f[s:e], w, black_border or s > 0, black_border or e < n
        )


def edtsq_host(labels: np.ndarray, anisotropy, black_border: bool = False) -> np.ndarray:
    """Exact multi-label anisotropic squared EDT on the host (N-D)."""
    labels = np.asarray(labels)
    nd = labels.ndim
    anisotropy = np.broadcast_to(np.asarray(anisotropy, dtype=np.float64), (nd,))
    out = np.zeros(labels.shape, dtype=np.float32)
    if labels.size == 0:
        return out

    # Pass 1 along last axis.
    flat_l = labels.reshape(-1, labels.shape[-1])
    flat_o = out.reshape(-1, labels.shape[-1])
    for r in range(flat_l.shape[0]):
        flat_o[r] = _rp_row_sq(flat_l[r], float(anisotropy[-1]), black_border)

    # Parabolic passes along the remaining axes. moveaxis+reshape may copy,
    # so write the processed block back explicitly.
    for ax in range(nd - 2, -1, -1):
        lm = np.moveaxis(labels, ax, -1)
        om = np.moveaxis(out, ax, -1)
        n = lm.shape[-1]
        moved_shape = om.shape
        lm2 = np.ascontiguousarray(lm).reshape(-1, n)
        om2 = np.ascontiguousarray(om).reshape(-1, n)
        for r in range(lm2.shape[0]):
            _parabolic_row_sq(om2[r], lm2[r], float(anisotropy[ax]), black_border)
        out = np.ascontiguousarray(
            np.moveaxis(om2.reshape(moved_shape), -1, ax)
        )
    return out


def edt_host(labels, anisotropy, black_border=False):
    return np.sqrt(edtsq_host(labels, anisotropy, black_border))
