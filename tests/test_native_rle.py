"""Native (C++) RLE kit vs the NumPy fallback."""

import numpy as np
import pytest

from edt_tpu.native import build


@pytest.fixture(scope="module")
def native():
    build.build()
    from edt_tpu.native import rle_native

    return rle_native


def test_extract_matches_numpy(native):
    from edt_tpu.rle import _runs_numpy

    for dtype in (np.uint8, np.uint32, np.uint64, np.float32):
        flat = np.random.randint(0, 5, size=1000).astype(dtype)
        assert native.extract_runs(flat) == _runs_numpy(flat)


def test_extract_empty_and_single(native):
    assert native.extract_runs(np.zeros(0, np.uint32)) == {}
    assert native.extract_runs(np.array([7], np.uint32)) == {7: [(0, 1)]}


def test_fill_and_copy(native):
    img = np.zeros(10, np.float32)
    native.set_run_voxels(2.5, [(1, 4), (8, 10)], img)
    assert np.array_equal(img, [0, 2.5, 2.5, 2.5, 0, 0, 0, 0, 2.5, 2.5])
    src = np.arange(10, dtype=np.float32)
    dst = np.zeros(10, np.float32)
    native.transfer_run_voxels([(2, 5)], src, dst)
    assert np.array_equal(dst, [0, 0, 2, 3, 4, 0, 0, 0, 0, 0])


def test_invalid_runs_raise(native):
    img = np.zeros(5, np.float32)
    with pytest.raises(RuntimeError):
        native.set_run_voxels(1.0, [(4, 2)], img)
    with pytest.raises(RuntimeError):
        native.transfer_run_voxels([(0, 99)], img, img.copy())


def test_each_with_native_backend(native):
    # end-to-end through the public API once the .so exists
    import importlib

    import edt_tpu.rle as rle

    importlib.reload(rle)
    assert rle._native is not None
    labels = np.random.randint(0, 12, size=(17, 13, 11))
    dt = np.random.rand(17, 13, 11).astype(np.float32)
    for label, img in rle.each(labels, dt):
        assert np.array_equal((labels == label) * dt, img)
