"""Metamorphic / property tests, mirroring reference
automated_test.py:632-734, 791-829."""

import math

import numpy as np
import pytest

import edt_tpu as edt


def test_2d_even_anisotropy():
    labels = np.zeros((15, 15), dtype=bool, order="F")
    labels[2:12, 2:12] = True
    img = edt.edt(labels, anisotropy=(1, 1))
    for i in range(1, 150, 7):
        w = float(i)
        aimg = edt.edt(labels, anisotropy=(w, w))
        assert np.all(w * img == aimg), w


def test_3d_even_anisotropy():
    labels = np.zeros((15, 15, 15), dtype=bool, order="F")
    labels[2:12, 2:12, 5:10] = True
    img = edt.edt(labels, anisotropy=(1, 1, 1))
    for i in range(1, 150, 11):
        w = float(i)
        aimg = edt.edt(labels, anisotropy=(w, w, w))
        assert np.all(w * img == aimg), w


def _gen_lopsided(x, y, order):
    arr = np.zeros((x, y), dtype=np.uint32, order=order)
    arr[0:25, 5:50] = 3
    arr[25:50, 5:50] = 1
    arr[60:110, 5:50] = 2
    return arr


@pytest.mark.parametrize("size", [(150, 150), (150, 75), (75, 150)])
def test_2d_lopsided(size):
    cres = edt.edt(_gen_lopsided(size[0], size[1], "C"))
    fres = edt.edt(_gen_lopsided(size[0], size[1], "F"))
    assert np.all(cres[:] == fres[:])


@pytest.mark.parametrize("size", [(150, 150), (150, 75), (75, 150)])
def test_2d_lopsided_anisotropic(size):
    cres = edt.edt(_gen_lopsided(size[0], size[1], "C"), anisotropy=(2, 3))
    fres = edt.edt(_gen_lopsided(size[0], size[1], "F"), anisotropy=(2, 3))
    assert np.all(np.isclose(cres, fres))


def test_3d_lopsided():
    def gen(x, y, z, order):
        arr = np.zeros((x, y, z), dtype=np.uint32, order=order)
        arr[0:25, 5:50, 0:20] = 3
        arr[25:50, 5:50, 0:20] = 1
        arr[60:75, 5:50, 0:20] = 2
        return arr

    size = (75, 60, 23)
    cres = edt.edt(gen(*size, "C"))
    fres = edt.edt(gen(*size, "F"))
    assert np.all(np.isclose(cres, fres))


def test_all_inf():
    labels = np.ones((64, 64, 64), dtype=np.uint8)
    res = edt.edt(labels, black_border=False, anisotropy=(1, 1, 1))
    assert np.all(res == np.inf)


def test_numpy_anisotropy():
    labels = np.zeros(shape=(32, 32, 32), dtype=np.uint32)
    labels[1:-1, 1:-1, 1:-1] = 1
    resolution = np.array([4, 4, 40])
    edt.edtsq(labels, anisotropy=resolution)


def test_small_anisotropy():
    d = np.array([[True, True], [True, False]])
    res = edt.edt(d, anisotropy=[0.5, 0.5], black_border=False)
    assert np.all(np.isclose(res, [[np.sqrt(2) / 2, 0.5], [0.5, 0.0]]))


@pytest.mark.parametrize(
    "weight",
    [1e-7, 1e-5, 1e-3, 0.1, 1.0, 10.0, 1e3, 1e5, 1e7, 1e8],
)
def test_anisotropy_range(weight):
    img = np.ones((50, 47, 49), dtype=np.uint8)
    img[0, 0, 0] = 0
    res = edt.edt(img, anisotropy=(weight, weight, weight), black_border=False)
    sx = weight * (img.shape[0] - 1)
    sy = weight * (img.shape[1] - 1)
    sz = weight * (img.shape[2] - 1)
    max_val = res[49, 46, 48]
    expected = math.sqrt(sx * sx + sy * sy + sz * sz)
    assert math.isclose(expected, max_val, rel_tol=1e-6)


def test_nan_large_array():
    # exercises the long-axis host fallback (reference regression
    # automated_test.py:819-823)
    arr = np.ones((46342, 1))
    arr[0, 0] = 0
    res = edt.edt(arr)
    assert not np.any(np.isnan(res))


def test_isotropic_scaling_consistency_multilabel():
    labels = np.random.randint(0, 4, size=(20, 21, 22), dtype=np.uint32)
    base = edt.edtsq(labels)
    scaled = edt.edtsq(labels, anisotropy=(3.0, 3.0, 3.0))
    assert np.array_equal(9.0 * base, scaled)
