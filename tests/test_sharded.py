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


def test_indivisible_shape_raises():
    labels = jnp.zeros((7, 4, 8), jnp.uint32)
    with pytest.raises(ValueError):
        edtsq_sharded(labels, (1.0, 1.0, 1.0), False, mesh=_mesh(4))


def test_sharded_soft_grad():
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
                                barrier=64.0, axis_name="sp")
            return d

        return jnp.sum(f(o)) / o.size

    def run_single(o):
        return jnp.sum(
            soft.soft_edtsq(o, (1.0, 1.0, 1.0), black_border=True, barrier=64.0)
        ) / o.size

    l1, l2 = run_sharded(occ), run_single(occ)
    assert np.isclose(float(l1), float(l2), rtol=1e-6)
    g1 = jax.grad(run_sharded)(occ)
    g2 = jax.grad(run_single)(occ)
    assert np.allclose(np.array(g1), np.array(g2), rtol=1e-5, atol=1e-6)


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


def test_dryrun_entry():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 16, 16, 16)
    ge.dryrun_multichip(min(8, len(jax.devices())))
