"""1-D golden tests, mirroring reference automated_test.py:17-146."""

import numpy as np
import pytest

import edt_tpu as edt

INTEGER_TYPES = [np.uint8, np.uint16, np.uint32, np.uint64]
TYPES_NO_BOOL = INTEGER_TYPES + [np.float32]
TYPES = TYPES_NO_BOOL + [bool]


@pytest.mark.parametrize("dtype", TYPES)
def test_one_d_simple(dtype):
    labels = np.array([0], dtype=dtype)
    assert np.all(edt.edt(labels, black_border=True) == labels)
    assert np.all(edt.edt(labels, black_border=False) == labels)

    labels = np.array([1], dtype=dtype)
    assert np.all(edt.edt(labels, black_border=True) == labels)
    assert np.all(edt.edt(labels, black_border=False) == np.array([np.inf]))

    labels = np.array([0, 1], dtype=dtype)
    assert np.all(edt.edt(labels, black_border=True) == labels)
    assert np.all(edt.edt(labels, black_border=False) == labels)

    labels = np.array([1, 0], dtype=dtype)
    assert np.all(edt.edt(labels, black_border=True) == labels)
    assert np.all(edt.edt(labels, black_border=False) == labels)

    labels = np.array([0, 1, 0], dtype=dtype)
    assert np.all(edt.edt(labels, black_border=True) == labels)
    assert np.all(edt.edt(labels, black_border=False) == labels)

    labels = np.array([0, 1, 1, 0], dtype=dtype)
    assert np.all(edt.edt(labels, black_border=True) == labels)
    assert np.all(edt.edt(labels, black_border=False) == labels)


def _cmp(labels, ans, black_border, types=TYPES, anisotropy=1.0):
    for dtype in types:
        la = np.array(labels, dtype=dtype)
        an = np.array(ans, dtype=np.float32)
        result = edt.edtsq(la, anisotropy=anisotropy, black_border=black_border)
        assert np.all(result == an), (dtype, result, an)


def test_one_d_black_border():
    _cmp([], [], True)
    _cmp([1], [1], True)
    _cmp([5], [1], True)
    _cmp([0, 1, 1, 1, 0], [0, 1, 4, 1, 0], True)
    _cmp([1, 1, 1, 1], [1, 4, 4, 1], True)
    _cmp([1, 1, 1, 1], [4, 16, 16, 4], True, anisotropy=2.0)
    _cmp(
        [1, 1, 1, 1, 1, 0, 2, 2, 2, 2, 2, 1, 1, 1, 1, 3],
        [1, 4, 9, 4, 1, 0, 1, 4, 9, 4, 1, 1, 4, 4, 1, 1],
        True,
        types=TYPES_NO_BOOL,
    )


def test_one_d():
    inf = np.inf
    _cmp([], [], False)
    _cmp([1], [inf], False)
    _cmp([5], [inf], False)
    _cmp([0, 1, 1, 1, 0], [0, 1, 4, 1, 0], False)
    _cmp([0, 1, 1, 1, 1], [0, 1, 4, 9, 16], False)
    _cmp([1, 1, 1, 1, 0], [16, 9, 4, 1, 0], False)
    _cmp([1, 1, 1, 1], [inf, inf, inf, inf], False)
    _cmp([1, 1, 1, 1], [inf, inf, inf, inf], False, anisotropy=2.0)
    _cmp(
        [1, 1, 1, 1, 1, 0, 2, 2, 2, 2, 2, 1, 1, 1, 1, 3],
        [25, 16, 9, 4, 1, 0, 1, 4, 9, 4, 1, 1, 4, 4, 1, 1],
        False,
        types=TYPES_NO_BOOL,
    )


def test_1d_scipy_comparison():
    from scipy import ndimage

    for _ in range(5):
        randos = np.random.randint(0, 2, size=(100,), dtype=np.uint32)
        labels = np.zeros((randos.shape[0] + 2,), dtype=np.uint32)
        labels[1:-1] = randos
        mlaedt_result = edt.edt(labels, black_border=True)
        mlaedt_result_nb = edt.edt(labels, black_border=False)
        scipy_result = ndimage.distance_transform_edt(labels)
        assert np.all(np.abs(scipy_result - mlaedt_result) < 1e-6)
        assert np.all(np.abs(scipy_result - mlaedt_result_nb) < 1e-6)
