"""Wall-faithful differentiable multi-label EDT (models.soft.multilabel_edtsq).

The forward must equal the hard multi-label ``edtsq`` EXACTLY — including
the d = w^2 boundary-voxel rule (reference edt.hpp:99-103, README.md:21-24)
— whenever occupancy is the foreground mask (or all-ones), and gradients
must match finite differences / the binary soft transform within a label.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edt_tpu import api
from edt_tpu.models import soft


def _blocky_labels(rng, shape, n_labels=5, blk=4):
    base = rng.integers(0, n_labels, size=tuple(-(-s // blk) for s in shape))
    lab = np.kron(base, np.ones((blk,) * len(shape), dtype=np.int64))
    return lab[tuple(slice(0, s) for s in shape)].astype(np.uint32)


@pytest.mark.parametrize("black_border", [True, False])
@pytest.mark.parametrize("aniso", [(1.0, 1.0, 1.0), (6.0, 6.0, 30.0)])
def test_forward_equals_hard_edtsq_3d(black_border, aniso):
    rng = np.random.default_rng(11)
    labels = _blocky_labels(rng, (17, 14, 12))
    hard = api.edtsq(labels, anisotropy=aniso, black_border=black_border)
    sft = np.array(
        soft.multilabel_edtsq(jnp.asarray(labels), anisotropy=aniso,
                              black_border=black_border)
    )
    finite = np.isfinite(hard)
    # integer anisotropy: w2 k^2 == (w k)^2 exactly in f32
    np.testing.assert_array_equal(sft[finite], hard[finite])
    if not finite.all():
        # hard-INF voxels saturate at ~barrier in the soft transform
        bar = float(soft.default_barrier(labels.shape, aniso))
        assert np.all(sft[~finite] >= 0.5 * bar)


def test_forward_equals_hard_edtsq_fractional_aniso():
    rng = np.random.default_rng(3)
    labels = _blocky_labels(rng, (13, 11), n_labels=4, blk=3)
    aniso = (1.3, 2.7)
    hard = api.edtsq(labels, anisotropy=aniso, black_border=True)
    sft = np.array(
        soft.multilabel_edtsq(jnp.asarray(labels), anisotropy=aniso,
                              black_border=True)
    )
    # (w k)^2 vs w^2 k^2 differ by ~1 ulp for non-integer w
    np.testing.assert_allclose(sft, hard, rtol=2e-6, atol=0)


def test_boundary_voxels_at_distance_w():
    # two labels touching: every voxel adjacent to the boundary must read
    # d = w^2 along that axis (the wall-at-distance-w rule), NOT 0
    labels = np.zeros((1, 8), np.uint32)
    labels[0, :4] = 1
    labels[0, 4:] = 2
    d = np.array(
        soft.multilabel_edtsq(jnp.asarray(labels), anisotropy=(1.0, 3.0),
                              black_border=False)
    )
    assert d[0, 3] == 9.0 and d[0, 4] == 9.0
    assert d[0, 2] == 36.0 and d[0, 5] == 36.0


def test_occ_ones_zero_gradient():
    rng = np.random.default_rng(5)
    labels = _blocky_labels(rng, (9, 8, 7), n_labels=4, blk=3)
    occ = jnp.ones(labels.shape, jnp.float32)
    hard = api.edtsq(labels, black_border=True)

    def loss(o):
        return jnp.sum(
            soft.multilabel_edtsq(jnp.asarray(labels), o, black_border=True,
                                  binary_occupancy=True)
        )

    d = soft.multilabel_edtsq(jnp.asarray(labels), occ, black_border=True,
                              binary_occupancy=True)
    np.testing.assert_array_equal(np.array(d), hard)
    g = np.array(jax.grad(loss)(occ))
    # occ == 1: every finite distance is wall-determined -> zero gradient
    np.testing.assert_array_equal(g, np.zeros_like(g))


def test_mask_occupancy_gradient_routes_to_background_sources():
    rng = np.random.default_rng(7)
    labels = _blocky_labels(rng, (10, 9, 8), n_labels=3, blk=3)
    assert (labels == 0).any() and (labels != 0).any()
    occ = jnp.asarray((labels != 0).astype(np.float32))

    def loss(o):
        return jnp.sum(
            soft.multilabel_edtsq(jnp.asarray(labels), o, black_border=True,
                                  binary_occupancy=True)
        )

    g = np.array(jax.grad(loss)(occ))
    # foreground voxels (height = barrier) never win -> no gradient there
    np.testing.assert_array_equal(g[labels != 0], 0.0)
    # winning background sources receive gradient (multiples of barrier)
    assert (g[labels == 0] > 0).any()


def test_single_label_reduces_to_binary_soft():
    rng = np.random.default_rng(9)
    occ = jnp.asarray(np.clip(rng.random((6, 7, 8)), 0.1, 0.9)
                      .astype(np.float32))
    labels = jnp.ones(occ.shape, jnp.uint32)
    aniso = (2.0, 1.0, 1.5)
    for t in (0.0, 0.6):
        a = soft.multilabel_edtsq(labels, occ, anisotropy=aniso,
                                  black_border=True, barrier=90.0,
                                  temperature=t)
        b = soft.soft_edtsq(occ, aniso, black_border=True, barrier=90.0,
                            temperature=t)
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-6,
                                   atol=1e-5)
        ga = np.array(jax.grad(lambda o, tt=t: jnp.sum(
            soft.multilabel_edtsq(labels, o, anisotropy=aniso,
                                  black_border=True, barrier=90.0,
                                  temperature=tt)))(occ))
        gb = np.array(jax.grad(lambda o, tt=t: jnp.sum(
            soft.soft_edtsq(o, aniso, black_border=True, barrier=90.0,
                            temperature=tt)))(occ))
        np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("temperature", [0.0, 0.5])
def test_grad_matches_finite_differences(temperature):
    rng = np.random.default_rng(13)
    labels = _blocky_labels(rng, (4, 5, 6), n_labels=3, blk=2)
    occ = jnp.asarray(np.clip(rng.random(labels.shape), 0.15, 0.85)
                      .astype(np.float32))
    aniso = (2.0, 1.0, 1.5)

    def loss(o):
        return jnp.sum(
            soft.multilabel_edtsq(jnp.asarray(labels), o, anisotropy=aniso,
                                  black_border=True, barrier=60.0,
                                  temperature=temperature)
        ) / o.size

    g = np.array(jax.grad(loss)(occ))
    eps = 1e-3
    flat = occ.reshape(-1)
    basis = jnp.eye(flat.size, dtype=jnp.float32) * eps

    def fd_one(e):
        ev = e.reshape(occ.shape)
        return (loss(occ + ev) - loss(occ - ev)) / (2 * eps)

    fd = np.array(jax.lax.map(fd_one, basis)).reshape(occ.shape)
    close = np.isclose(g, fd, rtol=3e-2, atol=1.5e-3)
    if temperature > 0:
        assert close.all(), (np.argwhere(~close)[:5], g[~close], fd[~close])
    else:
        # t=0 subgradient: only argmin-tie voxels may disagree with FD
        assert close.mean() >= 0.94, (close.mean(), np.argwhere(~close)[:5])


def test_2d_and_1d_parity():
    rng = np.random.default_rng(21)
    for shape, aniso in (((15, 9), (2.0, 1.0)), ((23,), (3.0,))):
        labels = _blocky_labels(rng, shape, n_labels=4, blk=3)
        hard = api.edtsq(labels, anisotropy=aniso, black_border=True)
        sft = np.array(
            soft.multilabel_edtsq(jnp.asarray(labels), anisotropy=aniso,
                                  black_border=True)
        )
        np.testing.assert_array_equal(sft, hard)


def test_long_row_int32_link_residuals():
    """Rows past the int16 threshold (n > 16000) must take the int32
    residual-link branch of the hard VJP with identical values/grads.

    Uses the closed-form binary-heights pass (the kernel path would be the
    same encode/decode), 1-D so the volume stays small."""
    n = 16100
    rng = np.random.default_rng(3)
    occ = (rng.random(n) > 0.002).astype(np.float32)
    occ[0] = occ[-1] = 0.0
    lab = (occ > 0).astype(np.uint32)

    hard = api.edtsq(lab, anisotropy=(2.0,), black_border=False)
    d, vjp = jax.vjp(
        lambda o: soft.multilabel_edtsq(
            jnp.asarray(lab), o, (2.0,), black_border=False,
            barrier=float(4.0 * n * n), binary_occupancy=True),
        jnp.asarray(occ))
    np.testing.assert_array_equal(np.asarray(d), hard)

    (g,) = vjp(jnp.ones_like(d))
    g = np.asarray(g)
    assert np.isfinite(g).all()
    # every FOREGROUND voxel routes its unit cotangent to its winning
    # zero-height source with weight d(barrier*occ)/docc = barrier
    # (sources/boundary ties always beat the self-candidate here;
    # background voxels' occupancy is masked out of the height field, so
    # their self-win cotangents carry no occ gradient): gradient mass is
    # conserved as sum(g) == barrier * #foreground, all on background
    barrier = 4.0 * n * n
    assert (g[occ > 0] == 0).all()
    np.testing.assert_allclose(g.sum() / barrier, float((occ > 0).sum()),
                               rtol=1e-6)


def test_walled_minplus_w2_cotangent_includes_wall_wins():
    """d(out)/d(w2) at wall-won voxels is cnt^2 (out = w2 * cnt^2 there) —
    the VJP must credit it, not just the candidate-won o^2 term.

    Checked against finite differences of the walled pass on a row where
    some voxels are wall-won (barrier heights near a label boundary) and
    some candidate-won."""
    rng = np.random.default_rng(11)
    n = 24
    f = jnp.asarray(
        np.where(rng.random((3, n)) < 0.3, 0.0, 50.0).astype(np.float32))
    # walls a few voxels out on each side (finite counts everywhere)
    cnt = jnp.asarray(
        np.minimum(np.arange(1, n + 1), np.arange(n, 0, -1))[None, :]
        .repeat(3, 0).astype(np.int16))
    mhw = soft._make_minplus_hard_walled(False)

    def total(w2):
        return jnp.sum(mhw(f, w2, cnt))

    w2 = jnp.float32(1.7)
    out = mhw(f, w2, cnt)
    walls = soft._walls_from_counts(cnt, w2)
    assert bool(jnp.any(out == walls) and jnp.any(out < walls)), (
        "test workload must contain both wall-won and candidate-won voxels")
    g = float(jax.grad(total)(w2))
    eps = 1e-3
    fd = (float(total(jnp.float32(1.7 + eps)))
          - float(total(jnp.float32(1.7 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-3)


def test_precomputed_wall_counts_match_recompute():
    """wall_counts_for + wall_counts= must reproduce the in-call label
    analysis exactly — values AND occupancy gradients."""
    rng = np.random.default_rng(23)
    lab = jnp.asarray(rng.integers(0, 4, size=(10, 11, 12)).astype(np.uint32))
    occ = jnp.asarray(np.clip(rng.random((10, 11, 12)), 0.05, 1.0)
                      .astype(np.float32))
    kw = dict(anisotropy=(2.0, 1.0, 3.0), black_border=True, barrier=700.0)
    cnts = soft.wall_counts_for(lab, black_border=True)
    d_pre = soft.multilabel_edtsq(lab, occ, wall_counts=cnts, **kw)
    d_re = soft.multilabel_edtsq(lab, occ, **kw)
    np.testing.assert_array_equal(np.asarray(d_pre), np.asarray(d_re))
    g_pre = jax.grad(lambda o: jnp.sum(
        soft.multilabel_edtsq(lab, o, wall_counts=cnts, **kw)))(occ)
    g_re = jax.grad(lambda o: jnp.sum(
        soft.multilabel_edtsq(lab, o, **kw)))(occ)
    np.testing.assert_array_equal(np.asarray(g_pre), np.asarray(g_re))


def test_temperature_to_zero_converges_to_hard():
    """t -> 0 continuity: at temperature > 0 the wall clamp blends via
    logaddexp and the min via softmin, so the forward no longer equals
    hard edtsq — but it must CONVERGE to it as t -> 0, pinning the
    wall-at-distance-w rule (reference edt.hpp:99-103) in the smooth
    regime, not just at t = 0.

    Two properties: (a) the soft forward is a LOWER bound on the hard
    transform that increases monotonically toward it as t decreases
    (softmin and logaddexp-blend are both monotone in t), and (b) the
    t = 0.01 forward is within a softmin-gap bound ~ t * log(#candidates)
    of the hard result."""
    rng = np.random.default_rng(31)
    labels = _blocky_labels(rng, (12, 10, 9), n_labels=4, blk=3)
    kw = dict(anisotropy=(1.0, 2.0, 1.0), black_border=True)
    hard = np.array(
        soft.multilabel_edtsq(jnp.asarray(labels), temperature=0.0, **kw))
    temps = [1.0, 0.3, 0.1, 0.03, 0.01]
    outs = [np.array(soft.multilabel_edtsq(jnp.asarray(labels),
                                           temperature=t, **kw))
            for t in temps]
    prev = None
    for t, d in zip(temps, outs):
        # softmin of non-negative costs: lower bound on the hard min
        assert np.all(d <= hard + 1e-4), t
        if prev is not None:
            # monotone in t: smaller t -> closer to (larger than) prev
            assert np.all(d >= prev - 1e-4), t
        prev = d
    # quantitative convergence: gap < t * log(total candidates per voxel)
    # summed over 3 passes + wall blends; generous constant, tight order
    n_cand = float(np.prod(labels.shape))
    for t, d in zip(temps, outs):
        gap = np.max(hard - d)
        assert gap <= 6.0 * t * np.log(n_cand) + 1e-3, (t, gap)
    # and the error actually shrinks with t
    gaps = [np.max(hard - d) for d in outs]
    assert gaps[-1] < gaps[0] / 10
