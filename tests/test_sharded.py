"""Multi-device sharded execution on the 8-device virtual CPU mesh:
single-chip vs sharded allclose, sharded training step, dryrun entry."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edt_tpu.ops import compose
from edt_tpu.parallel import edtsq_sharded, sdf_sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple devices"
)


def _mesh(n):
    return jax.sharding.Mesh(np.asarray(jax.devices()[:n]), ("sp",))


@pytest.mark.parametrize("nshards", [2, 4, 8])
@pytest.mark.parametrize("black_border", [True, False])
def test_sharded_matches_single(nshards, black_border):
    labels = np.random.randint(0, 4, size=(16, 9, 16)).astype(np.uint32)
    single = compose.edtsq(
        jnp.asarray(labels), jnp.ones(3, jnp.float32), black_border
    )
    out = edtsq_sharded(
        jnp.asarray(labels), (1.0, 1.0, 1.0), black_border, mesh=_mesh(nshards)
    )
    s, o = np.array(single), np.array(out)
    finite = np.isfinite(s)
    assert np.array_equal(np.isfinite(o), finite)
    assert np.array_equal(o[finite], s[finite])


def test_sharded_anisotropic():
    labels = np.random.randint(0, 3, size=(8, 6, 8)).astype(np.uint32)
    single = compose.edtsq(
        jnp.asarray(labels), jnp.asarray((2.0, 3.0, 5.0), jnp.float32), True
    )
    out = edtsq_sharded(
        jnp.asarray(labels), (2.0, 3.0, 5.0), True, mesh=_mesh(4)
    )
    assert np.array_equal(np.array(single), np.array(out))


def test_sharded_sdf():
    labels = (np.random.rand(8, 5, 8) > 0.5).astype(np.uint8)
    mesh = _mesh(4)
    out = sdf_sharded(jnp.asarray(labels), (1.0, 1.0, 1.0), True, mesh=mesh)
    single = compose.sdf(jnp.asarray(labels), jnp.ones(3, jnp.float32), True)
    assert np.allclose(np.array(out), np.array(single))


@pytest.mark.parametrize("shape", [(7, 4, 8), (13, 9, 11), (5, 3, 6)])
@pytest.mark.parametrize("black_border", [True, False])
def test_sharded_arbitrary_shapes(shape, black_border):
    """Any shape shards (pad + crop), matching the single-device result
    bit-for-bit — parity with the reference's shape-agnostic API
    (edt.pyx:300-310)."""
    rng = np.random.default_rng(hash(shape) % 2**32)
    labels = rng.integers(0, 4, size=shape).astype(np.uint32)
    single = np.array(compose.edtsq(
        jnp.asarray(labels), jnp.ones(3, jnp.float32), black_border
    ))
    out = np.array(edtsq_sharded(
        jnp.asarray(labels), (1.0, 1.0, 1.0), black_border, mesh=_mesh(4)
    ))
    finite = np.isfinite(single)
    assert np.array_equal(np.isfinite(out), finite)
    assert np.array_equal(out[finite], single[finite])


@pytest.mark.parametrize("black_border", [True, False])
def test_sharded_binary_fast_path(black_border):
    """binary=True (no label collective, unmasked min-plus) must equal the
    masked multi-label result on a foreground mask."""
    rng = np.random.default_rng(7)
    mask = (rng.random((11, 6, 13)) > 0.4).astype(np.uint8)
    mesh = _mesh(4)
    masked = np.array(edtsq_sharded(
        jnp.asarray(mask), (1.0, 2.0, 3.0), black_border, mesh=mesh
    ))
    fast = np.array(edtsq_sharded(
        jnp.asarray(mask), (1.0, 2.0, 3.0), black_border, mesh=mesh,
        binary=True,
    ))
    finite = np.isfinite(masked)
    assert np.array_equal(np.isfinite(fast), finite)
    assert np.array_equal(fast[finite], masked[finite])


@pytest.mark.parametrize("black_border", [True, False])
def test_sharded_auto_anisotropy_order(black_border):
    """The auto wrapper transposes so the largest-pitch axis is the sharded
    one; results must match the single-device transform exactly."""
    from edt_tpu.parallel import edtsq_sharded_auto

    rng = np.random.default_rng(11)
    labels = rng.integers(0, 5, size=(10, 7, 9)).astype(np.uint32)
    anis = (30.0, 6.0, 13.0)
    single = np.array(compose.edtsq(
        jnp.asarray(labels), jnp.asarray(anis, jnp.float32), black_border
    ))
    out = np.array(edtsq_sharded_auto(
        jnp.asarray(labels), anis, black_border, mesh=_mesh(4)
    ))
    finite = np.isfinite(single)
    assert np.array_equal(np.isfinite(out), finite)
    assert np.allclose(out[finite], single[finite], rtol=1e-6)


def test_api_auto_shard_dispatch(monkeypatch):
    """api.edtsq auto-shards volumes past the single-chip ceiling when more
    than one device exists, transparently (same values, any shape)."""
    import edt_tpu as edt
    from edt_tpu import api

    rng = np.random.default_rng(3)
    labels = rng.integers(0, 4, size=(17, 9, 14)).astype(np.uint32)
    want = edt.edtsq(labels, anisotropy=(4.0, 1.0, 2.0), black_border=True)
    monkeypatch.setenv("EDT_TPU_SHARD_MIN_VOXELS", "1")
    assert api._shard_min_voxels() == 1
    got = edt.edtsq(labels, anisotropy=(4.0, 1.0, 2.0), black_border=True)
    assert np.array_equal(want, got)

    mask = rng.random((9, 12, 10)) > 0.5
    want_b = edt.edtsq(np.asarray(mask))
    monkeypatch.delenv("EDT_TPU_SHARD_MIN_VOXELS")
    got_b = edt.edtsq(np.asarray(mask))
    finite = np.isfinite(got_b)
    monkeypatch.setenv("EDT_TPU_SHARD_MIN_VOXELS", "1")
    want_b2 = edt.edtsq(np.asarray(mask))
    assert np.array_equal(np.isfinite(want_b2), finite)
    assert np.array_equal(want_b2[finite], want_b[finite])


def test_api_auto_shard_dispatch_voxel_graph(monkeypatch):
    """The NumPy API auto-shards voxel-graph volumes too (the 8x-memory
    variant hits the single-chip ceiling first — the gate is on the
    DOUBLED size), with identical values and the sharded-dispatch counter
    bumped."""
    import edt_tpu as edt
    from edt_tpu.utils.profiling import counters

    rng = np.random.default_rng(5)
    shape = (9, 6, 7)
    labels = rng.integers(0, 3, size=shape).astype(np.uint32)
    graph = rng.integers(0, 64, size=shape).astype(np.uint8)
    for black_border in (True, False):
        want = edt.edtsq(labels, voxel_graph=graph,
                         anisotropy=(2.0, 1.0, 1.0),
                         black_border=black_border)
        monkeypatch.setenv("EDT_TPU_SHARD_MIN_VOXELS", "1")
        counters.reset()
        got = edt.edtsq(labels, voxel_graph=graph,
                        anisotropy=(2.0, 1.0, 1.0),
                        black_border=black_border)
        assert counters.snapshot()["sharded_dispatches"] == 1
        monkeypatch.delenv("EDT_TPU_SHARD_MIN_VOXELS")
        finite = np.isfinite(want)
        assert np.array_equal(np.isfinite(got), finite)
        assert np.allclose(got[finite], want[finite])
    # F-order round trip through the sharded path
    monkeypatch.setenv("EDT_TPU_SHARD_MIN_VOXELS", "1")
    labf = np.asfortranarray(labels)
    gf = np.asfortranarray(graph)
    got_f = edt.edtsq(labf, voxel_graph=gf, anisotropy=(2.0, 1.0, 1.0),
                      black_border=True)
    monkeypatch.delenv("EDT_TPU_SHARD_MIN_VOXELS")
    want_f = edt.edtsq(labf, voxel_graph=gf, anisotropy=(2.0, 1.0, 1.0),
                       black_border=True)
    assert np.allclose(got_f, want_f)


@pytest.mark.parametrize("temperature", [0.0, 0.4])
def test_sharded_soft_grad(temperature):
    from edt_tpu.models import soft

    mesh = _mesh(4)
    occ = jnp.asarray(np.clip(np.random.rand(8, 4, 8), 0.05, 0.95).astype(np.float32))

    def run_sharded(o):
        import functools
        from jax.sharding import PartitionSpec as P

        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=P("sp"), out_specs=P("sp")
        )
        def f(o):
            d = soft.soft_edtsq(o, (1.0, 1.0, 1.0), black_border=True,
                                barrier=64.0, temperature=temperature,
                                axis_name="sp")
            return d

        return jnp.sum(f(o)) / o.size

    def run_single(o):
        return jnp.sum(
            soft.soft_edtsq(o, (1.0, 1.0, 1.0), black_border=True,
                            barrier=64.0, temperature=temperature)
        ) / o.size

    l1, l2 = run_sharded(occ), run_single(occ)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(run_sharded)(occ)
    g2 = jax.grad(run_single)(occ)
    assert np.allclose(np.array(g1), np.array(g2), rtol=1e-5, atol=1e-6)


def test_sharded_soft_grad_anisotropic_t_positive():
    """t > 0 sharded vs single-chip on an anisotropy where axis 0 is NOT
    the largest pitch: the rotated axis-0 pass runs at its natural
    ascending-pitch position, so the (order-dependent) softmin composition
    is identical to the single-chip path and values match to round-off."""
    import functools

    from jax.sharding import PartitionSpec as P

    from edt_tpu.models import soft

    mesh = _mesh(4)
    occ = jnp.asarray(
        np.clip(np.random.default_rng(23).random((8, 4, 8)), 0.05, 0.95)
        .astype(np.float32))
    kw = dict(black_border=True, barrier=80.0, temperature=0.5)
    aniso = (1.0, 1.0, 2.0)  # largest pitch on axis 2, not the sharded 0

    @functools.partial(jax.shard_map, mesh=mesh, in_specs=P("sp"),
                       out_specs=P("sp"))
    def f(o):
        return soft.soft_edtsq(o, aniso, axis_name="sp", **kw)

    d_s = np.array(f(occ))
    d_1 = np.array(soft.soft_edtsq(occ, aniso, **kw))
    np.testing.assert_allclose(d_s, d_1, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("temperature", [0.0, 0.5])
def test_sharded_multilabel_soft_matches_single(temperature):
    """Wall-faithful differentiable multi-label transform under sharding:
    values and occupancy gradients match the single-device path."""
    import functools

    from jax.sharding import PartitionSpec as P

    from edt_tpu.models import soft

    mesh = _mesh(4)
    rng = np.random.default_rng(17)
    shape = (8, 5, 8)
    labels = jnp.asarray(rng.integers(0, 3, size=shape).astype(np.uint32))
    occ = jnp.asarray(np.clip(rng.random(shape), 0.1, 0.95)
                      .astype(np.float32))
    kw = dict(anisotropy=(1.0, 1.0, 2.0), black_border=True, barrier=150.0,
              temperature=temperature)

    def run_sharded(lab, o):
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(P("sp"), P("sp")), out_specs=P("sp"))
        def f(lab, o):
            return soft.multilabel_edtsq(lab, o, axis_name="sp", **kw)

        return f(lab, o)

    # the rotated axis-0 pass runs at its natural ascending-pitch position
    # (edtsq_from_heights), so sharded and single-chip compose IDENTICALLY
    # — even at t > 0 where softmin composition is order-dependent — and
    # values must agree to f32 round-off at any temperature
    rtol, atol = 1e-5, 1e-5
    d_s = np.array(run_sharded(labels, occ))
    d_1 = np.array(soft.multilabel_edtsq(labels, occ, **kw))
    np.testing.assert_allclose(d_s, d_1, rtol=rtol, atol=atol)
    g_s = jax.grad(lambda o: jnp.sum(run_sharded(labels, o)))(occ)
    g_1 = jax.grad(lambda o: jnp.sum(
        soft.multilabel_edtsq(labels, o, **kw)))(occ)
    np.testing.assert_allclose(np.array(g_s), np.array(g_1), rtol=1e-3,
                               atol=2e-3)


@pytest.mark.parametrize("temperature", [0.0, 0.5])
def test_sharded_precomputed_wall_counts(temperature):
    """wall_counts_for(..., axis_name=...) + wall_counts= under shard_map
    must reproduce the in-call label analysis exactly (values AND
    occupancy gradients) — the fixed-segmentation training pattern
    (examples/optimize_occupancy.py) combined with sharding."""
    import functools

    from jax.sharding import PartitionSpec as P

    from edt_tpu.models import soft

    mesh = _mesh(4)
    rng = np.random.default_rng(29)
    shape = (8, 5, 8)
    labels = jnp.asarray(rng.integers(0, 3, size=shape).astype(np.uint32))
    occ = jnp.asarray(np.clip(rng.random(shape), 0.1, 0.95)
                      .astype(np.float32))
    kw = dict(anisotropy=(1.0, 1.0, 2.0), black_border=True, barrier=150.0,
              temperature=temperature)

    def run(lab, o, pre):
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(P("sp"), P("sp")), out_specs=P("sp"),
                           check_vma=True)
        def f(lab, o):
            counts = (soft.wall_counts_for(lab, black_border=True,
                                           axis_name="sp") if pre else None)
            return soft.multilabel_edtsq(lab, o, axis_name="sp",
                                         wall_counts=counts, **kw)

        return f(lab, o)

    d_pre = np.array(run(labels, occ, True))
    d_re = np.array(run(labels, occ, False))
    np.testing.assert_array_equal(d_pre, d_re)
    g_pre = jax.grad(lambda o: jnp.sum(run(labels, o, True)))(occ)
    g_re = jax.grad(lambda o: jnp.sum(run(labels, o, False)))(occ)
    np.testing.assert_array_equal(np.array(g_pre), np.array(g_re))


def test_sharded_vma_clean_w2_cotangent():
    """The min-plus custom VJPs must be vma-clean under check_vma=True
    (no check_vma=False escapes anywhere), and the w2 cotangent must be
    the cross-shard sum: soft._match_vma casts a replicated w2 to the
    data's vma before the custom_vjp, whose transpose is exactly the psum
    a replicated scalar's cotangent requires (round-3 MULTICHIP
    regression, VERDICT r3 item 1)."""
    import functools

    from jax import lax
    from jax.sharding import PartitionSpec as P

    from edt_tpu.models import soft

    mesh = _mesh(8)
    rng = np.random.default_rng(3)
    f = jnp.asarray(rng.random((16, 32)).astype(np.float32)) * 10.0
    cnt = soft._wall_counts(
        jnp.asarray(rng.integers(0, 3, size=(16, 32)).astype(np.uint32)),
        1, True)
    cost = jnp.asarray(rng.random((16, 32)).astype(np.float32))

    def pair(fn):
        def single(w2):
            return jnp.sum(fn(f, w2) * cost)

        def sharded(w2):
            @functools.partial(jax.shard_map, mesh=mesh,
                               in_specs=(P(), P("sp"), P("sp")),
                               out_specs=P(), check_vma=True)
            def inner(w2, fl, cl):
                return lax.psum(jnp.sum(fn(fl, w2) * cl), "sp")

            return inner(w2, f, cost)

        return single, sharded

    w2 = jnp.asarray(1.7, jnp.float32)
    cases = {
        "hard": lambda fl, w2: soft._minplus_hard(fl, w2),
        "soft": lambda fl, w2: soft._minplus_soft(fl, w2, 0.5),
    }
    for name, fn in cases.items():
        single, sharded = pair(fn)
        g1, g2 = jax.grad(single)(w2), jax.grad(sharded)(w2)
        assert np.allclose(np.array(g1), np.array(g2), rtol=1e-5), (
            name, g1, g2)

    # walled path: counts are sharded alongside f
    def single_w(w2):
        return jnp.sum(soft._make_minplus_hard_walled(False)(
            f, w2, cnt) * cost)

    def sharded_w(w2):
        @functools.partial(jax.shard_map, mesh=mesh,
                           in_specs=(P(), P("sp"), P("sp"), P("sp")),
                           out_specs=P(), check_vma=True)
        def inner(w2, fl, cl, cntl):
            d = soft._multilabel_pass(fl, cntl, jnp.sqrt(w2), 0.0)
            return lax.psum(jnp.sum(d * cl), "sp")

        return inner(w2, f, cost, cnt)

    g1, g2 = jax.grad(single_w)(w2), jax.grad(sharded_w)(w2)
    assert np.allclose(np.array(g1), np.array(g2), rtol=1e-5), (g1, g2)


def test_sharded_voxel_graph():
    from edt_tpu.parallel import edtsq_voxel_graph_sharded
    import edt_tpu as edt

    labels = np.ones((8, 6, 8), dtype=np.uint32)
    graph = np.full((8, 6, 8), 0b111111, dtype=np.uint8)
    graph[4, 3, 4] = 0b111110  # block +x out of one voxel
    single = edt.edtsq(labels, voxel_graph=graph, black_border=True)
    out = edtsq_voxel_graph_sharded(
        jnp.asarray(labels), jnp.asarray(graph), (1.0, 1.0, 1.0), True,
        mesh=_mesh(4),
    )
    assert np.allclose(np.array(out), single)


@pytest.mark.parametrize("shape", [(7, 5, 6), (9, 4, 7)])
@pytest.mark.parametrize("black_border", [True, False])
def test_sharded_voxel_graph_arbitrary_shapes(shape, black_border):
    """Voxel-graph sharding pads axis 0 before doubling; black_border's
    duplicated-tail-plane zeroing must hit the ORIGINAL volume's last
    doubled plane even when it lands inside an earlier shard."""
    from edt_tpu.parallel import edtsq_voxel_graph_sharded
    import edt_tpu as edt

    rng = np.random.default_rng(shape[0])
    labels = rng.integers(0, 2, size=shape).astype(np.uint32) + 1
    labels[rng.random(shape) < 0.15] = 0
    graph = rng.integers(0, 64, size=shape).astype(np.uint8)
    single = edt.edtsq(labels, voxel_graph=graph, black_border=black_border)
    out = np.array(edtsq_voxel_graph_sharded(
        jnp.asarray(labels), jnp.asarray(graph), (1.0, 1.0, 1.0),
        black_border, mesh=_mesh(4),
    ))
    finite = np.isfinite(single)
    assert np.array_equal(np.isfinite(out), finite)
    assert np.allclose(out[finite], single[finite])


def test_dryrun_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 16, 16, 16)
    ge.dryrun_multichip(min(8, len(jax.devices())))
