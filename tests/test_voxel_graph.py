"""Voxel connectivity graph tests, mirroring reference
automated_test.py:736-789 (with corrected goldens for the wall case — the
reference's second assertion is `np.all(np.abs(dt - ans)) < eps`, which
collapses to a boolean comparison and never actually checks the matrix;
the golden below is the true output of the reference implementation)."""

import numpy as np
import pytest

import edt_tpu as edt

OMNI = 0b111111
NOXF = 0b111110  # +x blocked
NOXB = 0b111101  # -x blocked (ignored: only +x/+y/+z bits are consulted,
                 # like the reference, edt_voxel_graph.hpp:148-150)


def test_voxel_connectivity_graph_2d():
    labels = np.ones((5, 6), dtype=int)
    graph = np.full((5, 6), OMNI, dtype=np.uint8)

    dt = edt.edt(labels, voxel_graph=graph)
    assert np.all(dt == np.inf)

    dt = edt.edt(labels, voxel_graph=graph, black_border=True)
    assert np.all(
        dt
        == np.array(
            [
                [0.5, 0.5, 0.5, 0.5, 0.5, 0.5],
                [0.5, 1.5, 1.5, 1.5, 1.5, 0.5],
                [0.5, 1.5, 2.5, 2.5, 1.5, 0.5],
                [0.5, 1.5, 1.5, 1.5, 1.5, 0.5],
                [0.5, 0.5, 0.5, 0.5, 0.5, 0.5],
            ],
            dtype=np.float32,
        )
    )


def test_voxel_connectivity_graph_2d_wall():
    labels = np.ones((5, 6), dtype=int)
    graph = np.full((5, 6), OMNI, dtype=np.uint8)
    graph[2, 2] = NOXF
    graph[2, 3] = NOXB

    dt = edt.edt(labels, voxel_graph=graph, black_border=True)
    s5h = np.sqrt(5.0) / 2.0  # 1.118034: diagonal to the half-voxel wall
    ans = np.array(
        [
            [0.5, 0.5, 0.5, 0.5, 0.5, 0.5],
            [0.5, 1.5, s5h, s5h, 1.5, 0.5],
            [0.5, 1.5, 0.5, 0.5, 1.5, 0.5],
            [0.5, 1.5, s5h, s5h, 1.5, 0.5],
            [0.5, 0.5, 0.5, 0.5, 0.5, 0.5],
        ]
    )
    assert np.max(np.abs(dt - ans)) < 2e-6

    # F-order graph with C-order labels gives the same answer: the axis
    # mapping follows the *data* order (reference automated_test.py:787-789,
    # edt.pyx:294-298).
    graph_f = np.asfortranarray(graph)
    dtf = edt.edt(labels, voxel_graph=graph_f, black_border=True)
    assert np.max(np.abs(dtf - ans)) < 2e-6

    # With F-order *labels*, "x" (bit 0b1) becomes axis 0, so the same
    # bitfield gates the transposed direction — faithful to the reference's
    # order-dependent dispatch (edt.pyx:532-543).
    labels_f = np.asfortranarray(labels.T)
    graph_t = np.asfortranarray(graph.T)
    dtt = edt.edt(labels_f, voxel_graph=graph_t, black_border=True)
    assert np.max(np.abs(dtt - ans.T)) < 2e-6


def test_voxel_connectivity_graph_3d():
    labels = np.ones((4, 4, 4), dtype=np.uint32)
    graph = np.full((4, 4, 4), OMNI, dtype=np.uint8)

    dt = edt.edt(labels, voxel_graph=graph, black_border=True)
    # With an omni graph + black border, every voxel is min(i+1, s-i) - 0.5
    # voxels from the nearest face (border walls sit at the zeroed last odd
    # plane of the doubled grid, 0.5 voxel outside — see the 2D golden).
    idx = np.arange(4)
    per_axis = np.minimum(idx + 1, 4 - idx) - 0.5
    expected = np.minimum.reduce(
        np.meshgrid(per_axis, per_axis, per_axis, indexing="ij")
    )
    assert np.allclose(dt, expected)

    # Block all +z transit out of one voxel: its +z neighbor side gains a wall.
    graph2 = graph.copy()
    graph2[1, 1, 1] = OMNI & ~0b1  # block +x (x = last axis)
    dt2 = edt.edt(labels, voxel_graph=graph2, black_border=True)
    assert dt2[1, 1, 1] == 0.5
    assert dt2[1, 1, 2] <= dt[1, 1, 2]


def test_doubled_jnp_matches_numpy():
    import jax.numpy as jnp
    from edt_tpu.ops.voxel_graph import _doubled_3d, doubled_3d_jnp

    for black_border in (False, True):
        fg = (np.random.rand(5, 6, 7) > 0.3).astype(np.uint8)
        g = np.random.randint(0, 64, size=(5, 6, 7)).astype(np.uint8)
        a = _doubled_3d(fg, g, black_border)
        b = np.array(doubled_3d_jnp(jnp.asarray(fg), jnp.asarray(g), black_border))
        assert np.array_equal(a, b)


def test_voxel_graph_multilabel_foreground_only():
    # voxel graph path reduces labels to a foreground mask
    # (reference edt_voxel_graph.hpp:145: labels[loc] > 0)
    labels = np.ones((3, 3), dtype=np.uint32)
    labels[0, :] = 7
    graph = np.full((3, 3), OMNI, dtype=np.uint8)
    dt = edt.edt(labels, voxel_graph=graph, black_border=True)
    binary = edt.edt((labels > 0), voxel_graph=graph, black_border=True)
    assert np.array_equal(dt, binary)


def test_doubled_2d_jnp_matches_numpy():
    """Device and NumPy 2x upsamples agree (the 3-D pair has the same
    parity test; this covers the 2-D site table)."""
    import jax.numpy as jnp
    from edt_tpu.ops import voxel_graph as vg

    rng = np.random.default_rng(3)
    fg = (rng.random((13, 17)) > 0.4).astype(np.uint8)
    g = rng.integers(0, 64, size=(13, 17)).astype(np.uint8)
    for bb in (False, True):
        a = vg._doubled_2d(fg, g, bb)
        b = np.array(vg.doubled_2d_jnp(jnp.asarray(fg), jnp.asarray(g), bb))
        assert np.array_equal(a, b)


def test_voxel_graph_negative_float_labels_background():
    """Reference semantics: the voxel-graph foreground test is labels > 0
    on float inputs (edt_voxel_graph.hpp:141) — negative floats are
    background."""
    labels = np.array([[ -1.0, -1.0, 2.0, 2.0]], np.float32).reshape(2, 2)
    graph = np.full((2, 2), 0xFF, np.uint8)
    out = edt.edtsq(labels, voxel_graph=graph, black_border=True)
    assert np.all(out[labels < 0] == 0)


def test_voxel_graph_binary_negative_floats_stay_background():
    """binary=True must not flip negative float labels to foreground on the
    voxel-graph path (regression: the pre-dispatch `data != 0` reduction
    disagreed with the voxel-graph `labels > 0` foreground test)."""
    labels = np.array([[-1.0, -1.0, 2.0, 2.0]], np.float32).reshape(2, 2)
    graph = np.full((2, 2), 0xFF, np.uint8)
    plain = edt.edtsq(labels, voxel_graph=graph, black_border=True)
    binary = edt.edtsq(labels, voxel_graph=graph, black_border=True, binary=True)
    assert np.array_equal(plain, binary)
    assert np.all(binary[labels < 0] == 0)
