"""N-D composition of the 1-D EDT passes (jittable, device-native).

Mirrors the reference drivers pyedt::_edt3dsq / _edt2dsq
(/root/reference/src/edt.hpp:411-484, 631-678): a Rosenfeld–Pfaltz pass
along the fastest axis, then a Felzenszwalb–Huttenlocher parabolic pass
along each remaining axis. On CPU the reference fans rows across a thread
pool with barriers between passes; on TPU every pass is a single fused XLA
op (or Pallas kernel) over all rows at once, and the inter-pass "barrier"
is simply dataflow. Strided row access is replaced by axis transposes,
which XLA lays out efficiently.

The decomposition is order-independent mathematically, so C- vs F-order
inputs are handled purely at the NumPy API layer (edt_tpu.api); here arrays
are plain (s0, ..., sk) jnp arrays with anisotropy[k] attached to axis k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from edt_tpu.ops import core


def use_pallas_default():
    """True when the Pallas kernels should be the default backend
    (TPU, unless EDT_TPU_DISABLE_PALLAS is set)."""
    import os

    if os.environ.get("EDT_TPU_DISABLE_PALLAS"):
        return False
    return jax.default_backend() == "tpu"


def default_minplus_fn(use_pallas=None):
    """Pick the min-plus backend: Pallas kernel on TPU, fused jnp elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from edt_tpu.ops import pallas_kernels

        return pallas_kernels.make_minplus_fn()
    return None


def default_parabolic_fn(use_pallas=None):
    """Fully fused Pallas parabolic pass on TPU; None elsewhere."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from edt_tpu.ops import pallas_kernels

        return pallas_kernels.make_parabolic_fn()
    return None


def _along_last(fn, axis, *arrays):
    """Move ``axis`` of every array to -1, call fn, move the result back."""
    moved = [jnp.moveaxis(a, axis, -1) for a in arrays]
    out = fn(*moved)
    return jnp.moveaxis(out, -1, axis)


def edtsq(
    labels: jax.Array,
    anisotropy: jax.Array,
    black_border: bool = False,
    minplus_fn=None,
    binary: bool = False,
    parabolic_fn=None,
    axis_order: tuple | None = None,
) -> jax.Array:
    """Squared multi-label anisotropic EDT of a 1/2/3-D (or N-D) volume.

    labels: integer/float/bool array; 0 is background, label boundaries act
    as walls at distance w (reference README.md:21-24).
    anisotropy: (ndim,) physical voxel pitch per axis (axis k <-> entry k).
    black_border: treat the volume edge as background.
    binary: fast path for two-valued volumes (nonzero = one foreground
    label), auto-selected for bool inputs at the API layer like the
    reference's bool* overload (edt.hpp:580-587).

    Differentiable w.r.t. nothing (labels are discrete); for gradients use
    edt_tpu.models.soft.
    """
    nd = labels.ndim
    anisotropy = jnp.asarray(anisotropy, jnp.float32).reshape(nd)

    # The Saito decomposition is axis-order independent; axis_order (a
    # static permutation, first entry takes the RP pass) lets callers run
    # cheap-pitch axes first so later parabolic passes see radii scaled by
    # w_early / w_late — dramatically smaller candidate windows on
    # anisotropic volumes (the NumPy API sorts by ascending anisotropy).
    if axis_order is None:
        axis_order = tuple(range(nd - 1, -1, -1))

    # Pass 1: closed-form Rosenfeld-Pfaltz.
    a1 = axis_order[0]
    f = _along_last(
        lambda lab: core.rp_pass_sq(lab, anisotropy[a1], black_border),
        a1,
        labels,
    )

    # Passes 2..nd: parabolic along each remaining axis.
    for ax in axis_order[1:]:
        if binary:
            f = _along_last(
                lambda ff, _ax=ax: core.parabolic_pass_sq(
                    ff, ff, anisotropy[_ax], black_border,
                    minplus_fn=minplus_fn, binary=True,
                    parabolic_fn=parabolic_fn,
                ),
                ax,
                f,
            )
        else:
            f = _along_last(
                lambda ff, lab, _ax=ax: core.parabolic_pass_sq(
                    ff, lab, anisotropy[_ax], black_border,
                    minplus_fn=minplus_fn, parabolic_fn=parabolic_fn,
                ),
                ax,
                f,
                labels,
            )
    return f


def edt(labels, anisotropy, black_border=False, minplus_fn=None,
        parabolic_fn=None, axis_order=None):
    """Euclidean distance (sqrt of edtsq)."""
    return jnp.sqrt(edtsq(labels, anisotropy, black_border,
                          minplus_fn=minplus_fn, parabolic_fn=parabolic_fn,
                          axis_order=axis_order))


def sdfsq(labels, anisotropy, black_border=False, minplus_fn=None,
          parabolic_fn=None, axis_order=None):
    """Squared signed distance field: edtsq(x) - edtsq(x == 0).

    Mirrors reference edt.pyx:160-202.
    """
    fg = edtsq(labels, anisotropy, black_border, minplus_fn=minplus_fn,
               parabolic_fn=parabolic_fn, axis_order=axis_order)
    bg = edtsq((labels == 0).astype(jnp.uint8), anisotropy, black_border,
               minplus_fn=minplus_fn, binary=True, parabolic_fn=parabolic_fn,
               axis_order=axis_order)
    return fg - bg


def sdf(labels, anisotropy, black_border=False, minplus_fn=None,
        parabolic_fn=None, axis_order=None):
    """Signed distance field: edt(x) - edt(x == 0) (reference edt.pyx:120-158)."""
    fg = edt(labels, anisotropy, black_border, minplus_fn=minplus_fn,
             parabolic_fn=parabolic_fn, axis_order=axis_order)
    bg = jnp.sqrt(edtsq((labels == 0).astype(jnp.uint8), anisotropy,
                        black_border, minplus_fn=minplus_fn, binary=True,
                        parabolic_fn=parabolic_fn, axis_order=axis_order))
    return fg - bg
