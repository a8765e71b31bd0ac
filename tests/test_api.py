"""API-surface tests: dtypes, orders, errors, sdf, each/runs/draw/erase/
transfer. Mirrors reference automated_test.py:17-60, 831-895 plus
edt.pyx:276-310 normalization semantics."""

import numpy as np
import pytest

import edt_tpu as edt
from edt_tpu.utils import host_reference as hr

INTEGER_TYPES = [np.uint8, np.uint16, np.uint32, np.uint64]
ALL_TYPES = [
    np.uint8, np.uint16, np.uint32, np.uint64,
    np.int8, np.int16, np.int32, np.int64,
    np.float32, np.float64, bool,
]


@pytest.mark.parametrize("dtype", ALL_TYPES)
def test_all_dtypes_2d(dtype):
    labels = np.zeros((7, 7), dtype=dtype)
    labels[1:4, 1:4] = 1
    labels[4:6, 4:6] = 2
    res = edt.edtsq(labels)
    oracle = hr.edtsq_host(labels.astype(np.float64) if dtype == np.float64 else labels,
                           (1.0, 1.0), False)
    assert res.dtype == np.float32
    assert np.array_equal(res, oracle), (res, oracle)


def test_negative_labels():
    labels = np.array([[-1, -1, 0], [0, 5, 5]], dtype=np.int32)
    res = edt.edtsq(labels, black_border=False)
    oracle = hr.edtsq_host(labels, (1.0, 1.0), False)
    assert np.array_equal(res, oracle)


def test_large_int64_labels():
    labels = np.array([[2**40, 2**40, 0], [0, 2**41, 2**41]], dtype=np.int64)
    res = edt.edtsq(labels, black_border=False)
    oracle = hr.edtsq_host(labels, (1.0, 1.0), False)
    assert np.array_equal(res, oracle)


def test_list_input():
    assert np.array_equal(
        edt.edtsq([0, 1, 1, 1, 0], black_border=True),
        np.array([0, 1, 4, 1, 0], dtype=np.float32),
    )


def test_empty():
    for shape in [(0,), (0, 3), (3, 0, 5)]:
        res = edt.edtsq(np.zeros(shape, dtype=np.uint8))
        assert res.shape == shape
        assert res.dtype == np.float32


def test_4d_raises():
    with pytest.raises(TypeError):
        edt.edtsq(np.zeros((2, 2, 2, 2), dtype=np.uint8))


def test_voxel_graph_1d_raises():
    with pytest.raises(TypeError):
        edt.edtsq(np.zeros(4, dtype=np.uint8), voxel_graph=np.zeros(4, np.uint8))


def test_noncontiguous_input():
    base = np.random.randint(0, 3, size=(12, 12), dtype=np.uint32)
    view = base[::2, ::2]
    assert not view.flags.c_contiguous
    res = edt.edtsq(view)
    assert np.array_equal(res, edt.edtsq(np.ascontiguousarray(view)))


def test_order_preserved():
    lab = np.random.randint(0, 2, size=(9, 10, 11)).astype(np.uint32)
    labf = np.asfortranarray(lab)
    rc = edt.edt(lab)
    rf = edt.edt(labf)
    assert rc.flags.c_contiguous
    assert rf.flags.f_contiguous
    assert np.array_equal(rc, rf)


def test_parallel_kwarg_accepted():
    lab = np.ones((4, 4), dtype=np.uint8)
    a = edt.edt(lab, parallel=1)
    b = edt.edt(lab, parallel=4)
    c = edt.edt(lab, parallel=-1)
    assert np.array_equal(a, b) and np.array_equal(a, c)


@pytest.mark.parametrize("dtype", INTEGER_TYPES)
def test_sdf(dtype):
    labels = np.zeros((9, 7), dtype=dtype)
    labels[3:6, 2:5] = 1
    ans = edt.edt(labels) - edt.edt(labels == 0)
    res = edt.sdf(labels)
    assert np.all(res == ans)


def test_sdfsq():
    labels = np.zeros((9, 7), dtype=np.uint32)
    labels[3:6, 2:5] = 1
    ans = edt.edtsq(labels) - edt.edtsq(labels == 0)
    res = edt.sdfsq(labels)
    assert np.all(res == ans)


def test_fixed_dim_entry_points():
    l1 = np.array([0, 1, 1, 0], dtype=np.uint8)
    assert np.array_equal(edt.edt1dsq(l1), edt.edtsq(l1))
    assert np.array_equal(edt.edt1d(l1), edt.edt(l1))
    l2 = np.random.randint(0, 3, size=(8, 9), dtype=np.uint32)
    assert np.array_equal(edt.edt2dsq(l2), edt.edtsq(l2))
    assert np.array_equal(edt.edt2d(l2), edt.edt(l2))
    l3 = np.random.randint(0, 3, size=(6, 7, 8), dtype=np.uint32)
    assert np.array_equal(edt.edt3dsq(l3), edt.edtsq(l3))
    assert np.array_equal(edt.edt3d(l3), edt.edt(l3))


# ---- run-length kit ----

@pytest.mark.parametrize("dtype", [np.uint8, np.uint32, np.float32])
@pytest.mark.parametrize("in_place", [True, False])
def test_each(dtype, in_place):
    labels = np.zeros((16, 16, 16), dtype=dtype)
    half = 8
    i = 1
    for x in range(2):
        for y in range(2):
            for z in range(2):
                labels[x*half:(x+1)*half, y*half:(y+1)*half, z*half:(z+1)*half] = i
                i += 1
    mdt = edt.edt(labels)
    count = 0
    for label, dt in edt.each(labels, mdt, in_place=in_place):
        single = (labels == label) * mdt
        assert np.all(single == dt), label
        if in_place:
            assert not dt.flags.writeable
        count += 1
    assert count == 8


@pytest.mark.parametrize("in_place", [True, False])
def test_each_random(in_place):
    labels = np.random.randint(0, 25, size=(13, 14, 15))
    mdt = edt.edt(labels)
    for label, dt in edt.each(labels, mdt, in_place=in_place):
        single = (labels == label) * mdt
        assert np.all(single == dt), label


def test_each_len():
    labels = np.zeros((4, 4), dtype=np.uint8)
    labels[0, :] = 1
    labels[2, :] = 2
    it = edt.each(labels, edt.edt(labels))
    assert len(it) == 2


def test_runs_draw_erase_transfer():
    labels = np.array([1, 1, 0, 2, 2, 2, 1], dtype=np.uint32)
    rns = edt.runs(labels)
    assert rns[1] == [(0, 2), (6, 7)]
    assert rns[0] == [(2, 3)]
    assert rns[2] == [(3, 6)]

    img = np.zeros(7, dtype=np.uint32)
    edt.draw(9, rns[2], img)
    assert np.array_equal(img, [0, 0, 0, 9, 9, 9, 0])
    edt.erase(rns[2], img)
    assert np.array_equal(img, np.zeros(7))

    src = np.arange(7, dtype=np.float32)
    dest = np.zeros(7, dtype=np.float32)
    edt.transfer(rns[1], src, dest)
    assert np.array_equal(dest, [0, 1, 0, 0, 0, 0, 6])


def test_runs_invalid():
    img = np.zeros(5, dtype=np.uint32)
    with pytest.raises(RuntimeError):
        edt.draw(1, [(3, 2)], img)
    with pytest.raises(RuntimeError):
        edt.draw(1, [(0, 9)], img)


def test_runs_forder():
    labels = np.asfortranarray(np.array([[1, 2], [1, 2]], dtype=np.uint32))
    rns = edt.runs(labels)
    # F-order memory: [1, 1, 2, 2]
    assert rns[1] == [(0, 2)]
    assert rns[2] == [(2, 4)]


def test_counters():
    from edt_tpu.utils.profiling import counters

    counters.reset()
    labels = np.random.randint(0, 3, size=(9, 10, 11)).astype(np.uint32)
    edt.edtsq(labels)
    snap = counters.snapshot()
    assert snap["transforms"] == 1
    assert snap["voxels"] == labels.size
    # past the ACTIVE device ceiling (platform dependent: 8192 on CPU,
    # 60000 with Pallas) -> host fallback; 1-D so the host path is instant
    from edt_tpu import api

    edt.edtsq(np.zeros(api._device_max_axis() + 8, np.uint32))
    assert counters.snapshot()["host_fallbacks"] == 1


def test_each_uses_native_rle_when_built():
    """Throughput guard for each(): typical (contiguous, supported-dtype)
    arrays must take the native C++ RLE path when it is built — falling
    off it silently is a ~10x extraction regression (README each() claim)."""
    from edt_tpu import rle

    if rle._native is None:
        pytest.skip("native RLE kit not built")
    labels = np.random.randint(0, 5, size=(16, 17, 18)).astype(np.uint32)
    flat = rle._flat_memory_order(labels)
    assert rle._use_native(flat)
    # the edtsq output fed to each() must stay on the native path too
    dt = edt.edtsq(labels)
    assert rle._use_native(rle._flat_memory_order(dt))


def test_each_device_matches_host_each():
    """Device-side masked extraction == the host RLE each(), label by
    label (the reference's dt * (labels == k) fallback, README.md:347)."""
    import edt_tpu.jax_api as edtj

    rng = np.random.default_rng(8)
    labels = rng.integers(0, 5, size=(9, 8, 7)).astype(np.uint32)
    dt = edt.edt(labels, anisotropy=(2.0, 1.0, 1.0))
    host = {k: img.copy() for k, img in edt.each(labels, dt)}
    dev = {int(k): np.array(img) for k, img in edtj.each_device(labels, dt)}
    assert set(dev) == set(host)
    for k in host:
        assert np.array_equal(dev[k], host[k]), k
    # explicit ids subset
    some = list(host)[:2]
    got = dict(edtj.each_device(labels, dt, ids=some))
    assert list(got) == some


def test_extract_labels_batched_matches_each():
    """extract_labels = ONE vmapped dispatch for all ids, slab k equal to
    extract_label(labels, dt, ids[k])."""
    import edt_tpu.jax_api as edtj

    rng = np.random.default_rng(9)
    labels = rng.integers(0, 6, size=(7, 9, 8)).astype(np.uint32)
    dt = edt.edt(labels, anisotropy=(1.0, 2.0, 1.0))
    ids = sorted(int(u) for u in np.unique(labels) if u)
    stack = np.asarray(edtj.extract_labels(labels, dt, ids))
    assert stack.shape == (len(ids), *labels.shape)
    host = {k: img.copy() for k, img in edt.each(labels, dt)}
    for k, slab in zip(ids, stack):
        assert np.array_equal(slab, host[k]), k


def test_reshape_stride_tricks():
    arr = np.arange(12, dtype=np.uint32).reshape(3, 4)
    flat = edt.reshape(arr, (12,))
    assert np.shares_memory(flat, arr)
    assert np.array_equal(flat, np.arange(12))
    arrf = np.asfortranarray(arr)
    flatf = edt.reshape(arrf, (12,))
    assert np.array_equal(flatf, arrf.ravel(order="F"))
    # explicit order that MISMATCHES contiguity reinterprets the raw
    # buffer (reference as_strided semantics, edt.pyx:871-879), no copy
    v = edt.reshape(arr, (4, 3), order="F")
    assert np.shares_memory(v, arr)
    itemsize = arr.itemsize
    ref = np.lib.stride_tricks.as_strided(
        arr, shape=(4, 3), strides=(itemsize, 4 * itemsize))
    assert np.array_equal(v, ref)
    vf = edt.reshape(arrf, (4, 3), order="C")
    reff = np.lib.stride_tricks.as_strided(
        arrf, shape=(4, 3), strides=(3 * itemsize, itemsize))
    assert np.shares_memory(vf, arrf)
    assert np.array_equal(vf, reff)


def test_pallas_masked_ceiling_row_on_device():
    """The masked Pallas path must survive a row at its derived VMEM
    ceiling (ADVICE r2: the old shared 60k constant let masked rows in
    the 30-60k range fail Mosaic VMEM allocation at runtime)."""
    import jax

    from edt_tpu import api

    if not api._use_pallas():
        pytest.skip("exercises the Pallas VMEM ceiling (TPU only)")
    n = api._DEVICE_MAX_AXIS_PALLAS_MASKED
    row = np.zeros(n, np.uint32)
    # multi-label segments every ~1000 voxels, sparse background
    row[:] = (np.arange(n) // 1000 % 7) + 1
    row[::5000] = 0
    data = np.stack([row, row])
    got = edt.edtsq(data, anisotropy=(1e9, 1.0))  # rows independent
    want = hr.edtsq_host(data, np.asarray((1e9, 1.0), np.float32), False)
    assert np.array_equal(got, want)


def test_off_tpu_long_axes_use_host_banded_path():
    """On non-TPU backends, axes past the jnp min-plus comfort zone must
    route to the vectorized host banded path (the jnp evaluation is
    O(n^2/row) — a 256-axis volume used to take minutes on CPU while the
    reference CPU does 512^3 in ~9 s). Values must equal the device
    composition exactly."""
    import jax
    import jax.numpy as jnp

    from edt_tpu import api
    from edt_tpu.ops import compose
    from edt_tpu.utils.profiling import counters

    if jax.default_backend() == "tpu":
        pytest.skip("off-TPU dispatch rule")
    assert api._device_max_axis() == api._DEVICE_MAX_AXIS_OFF_TPU
    rng = np.random.default_rng(2)
    labels = rng.integers(
        0, 4, size=(api._DEVICE_MAX_AXIS_OFF_TPU + 32, 16, 15)
    ).astype(np.uint32)
    counters.reset()
    got = edt.edtsq(labels, anisotropy=(2.0, 1.0, 1.5))
    assert counters.snapshot()["host_fallbacks"] == 1
    want = np.array(
        compose.edtsq(jnp.asarray(labels), jnp.asarray((2.0, 1.0, 1.5)),
                      False)
    )
    assert np.array_equal(got, want)


def test_binary_flag_respected_by_host_fallback():
    """binary=True must reduce to the foreground mask before dispatch —
    including the long-axis host fallback (regression: the fallback used
    to receive the raw labels and treat the 1|2 boundary as a wall)."""
    n = 8200  # > _DEVICE_MAX_AXIS
    row = np.ones(n, np.uint32)
    row[n // 2:] = 2
    row[0] = 0  # one background voxel so distances are finite
    data = np.stack([row, row])
    got = edt.binary_edtsq(data)
    want = edt.edtsq((data != 0).astype(np.uint8))
    assert np.array_equal(got, want)
    # the old bug made the 1|2 boundary a wall => distance 1 there
    mid = n // 2
    assert got[0, mid] > 1.0
