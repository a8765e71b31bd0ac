"""2-D/3-D golden tests, mirroring reference automated_test.py:188-381,426-551."""

import numpy as np
import pytest

import edt_tpu as edt

INTEGER_TYPES = [np.uint8, np.uint16, np.uint32, np.uint64]
TYPES_NO_BOOL = INTEGER_TYPES + [np.float32]
TYPES = TYPES_NO_BOOL + [bool]
I = np.inf


def _cmp2(labels, ans, black_border, types=TYPES, anisotropy=(1.0, 1.0)):
    for dtype in types:
        la = np.array(labels, dtype=dtype)
        an = np.array(ans, dtype=np.float32)
        result = edt.edtsq(la, anisotropy=anisotropy, black_border=black_border)
        assert np.all(result == an), (dtype, result, an)


def test_two_d_ident_no_border():
    _cmp2([[]], [[]], False)
    _cmp2([[0]], [[0]], False)
    _cmp2([[1]], [[I]], False)
    _cmp2([[1, 0], [0, 1]], [[1, 0], [0, 1]], False)
    _cmp2([[1, 1], [1, 1]], [[I, I], [I, I]], False)
    _cmp2(
        [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        [[I, I, I, I, I], [I, I, I, I, I]],
        False,
    )


def test_two_d_ident_black_border():
    _cmp2([[]], [[]], True)
    _cmp2([[0]], [[0]], True)
    _cmp2([[1]], [[1]], True)
    _cmp2([[1, 1], [1, 1]], [[1, 1], [1, 1]], True)
    _cmp2([[1, 0], [0, 1]], [[1, 0], [0, 1]], True)
    _cmp2(
        [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        [[1, 1, 1, 1, 1], [1, 1, 1, 1, 1]],
        True,
    )


def test_two_d():
    _cmp2(
        np.ones((5, 5)),
        [
            [1, 1, 1, 1, 1],
            [1, 4, 4, 4, 1],
            [1, 4, 9, 4, 1],
            [1, 4, 4, 4, 1],
            [1, 1, 1, 1, 1],
        ],
        True,
    )
    _cmp2(
        np.ones((5, 5)),
        [
            [25, 25, 25, 25, 25],
            [36, 100, 100, 100, 36],
            [36, 144, 225, 144, 36],
            [36, 100, 100, 100, 36],
            [25, 25, 25, 25, 25],
        ],
        True,
        anisotropy=(5.0, 6.0),
    )
    labels = np.ones((5, 5))
    labels[2, 2] = 0
    _cmp2(
        labels,
        [
            [1, 1, 1, 1, 1],
            [1, 2, 1, 2, 1],
            [1, 1, 0, 1, 1],
            [1, 2, 1, 2, 1],
            [1, 1, 1, 1, 1],
        ],
        True,
    )
    labels = np.ones((5, 5))
    labels[2, 2] = 2
    _cmp2(
        labels,
        [
            [1, 1, 1, 1, 1],
            [1, 2, 1, 2, 1],
            [1, 1, 1, 1, 1],
            [1, 2, 1, 2, 1],
            [1, 1, 1, 1, 1],
        ],
        True,
        types=TYPES_NO_BOOL,
    )
    labels = np.ones((6, 6))
    labels[3:, :] = 2
    _cmp2(
        labels,
        [
            [1, 1, 1, 1, 1, 1],
            [1, 4, 4, 4, 4, 1],
            [1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1],
            [1, 4, 4, 4, 4, 1],
            [1, 1, 1, 1, 1, 1],
        ],
        True,
        types=TYPES_NO_BOOL,
    )
    labels = np.ones((6, 5), dtype=np.uint32)
    labels[3:, :] = 2
    _cmp2(
        labels,
        [
            [1, 1, 1, 1, 1],
            [1, 4, 4, 4, 1],
            [1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1],
            [1, 4, 4, 4, 1],
            [1, 1, 1, 1, 1],
        ],
        True,
        types=TYPES_NO_BOOL,
    )
    labels = np.ones((5, 6), dtype=np.uint32)
    labels[3:, :] = 2
    _cmp2(
        labels,
        [
            [1, 1, 1, 1, 1, 1],
            [1, 4, 4, 4, 4, 1],
            [1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1],
        ],
        True,
        types=TYPES_NO_BOOL,
    )
    labels = np.ones((7, 7), dtype=np.uint32)
    labels[0, :] = 0
    labels[1:3, :] = 1
    labels[3:, :] = 2
    labels[5, 5] = 3
    _cmp2(
        labels,
        [
            [0, 0, 0, 0, 0, 0, 0],
            [1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1],
            [1, 4, 4, 4, 2, 1, 1],
            [1, 4, 4, 4, 1, 1, 1],
            [1, 1, 1, 1, 1, 1, 1],
        ],
        True,
        types=TYPES_NO_BOOL,
    )


def _cmp3(labels, ans, black_border=True, types=TYPES, anisotropy=(1.0, 1.0, 1.0)):
    # The reference test writes the golden transposed (automated_test.py:440);
    # here goldens are written directly in array axis order.
    for dtype in types:
        la = np.array(labels, dtype=dtype)
        an = np.array(ans, dtype=np.float32)
        result = edt.edtsq(la, anisotropy=anisotropy, black_border=black_border)
        assert np.all(result == an), (dtype, result, an)


def test_three_d():
    _cmp3([[[]]], [[[]]])
    _cmp3([[[0]]], [[[0]]])
    _cmp3([[[1]]], [[[1]]])
    _cmp3([[[5]]], [[[1]]])

    ones = np.ones((3, 3, 3))
    center_ans = np.ones((3, 3, 3), dtype=np.float32)
    center_ans[1, 1, 1] = 4
    _cmp3(ones, center_ans)

    aniso_ans = 16 * np.ones((3, 3, 3), dtype=np.float32)
    aniso_ans[1, 1, 1] = 64
    _cmp3(ones, aniso_ans, anisotropy=(4, 4, 4))

    # anisotropy (6, 6, 5): min over axes of (steps * w)^2
    a = np.empty((3, 3, 3), dtype=np.float32)
    for i in range(3):
        for j in range(3):
            for k in range(3):
                dx = min(i + 1, 3 - i) * 6.0
                dy = min(j + 1, 3 - j) * 6.0
                dz = min(k + 1, 3 - k) * 5.0
                a[i, j, k] = min(dx, dy, dz) ** 2
    _cmp3(ones, a, anisotropy=(6, 6, 5))


def test_zero_trailing_2d():
    labels = np.array(
        [[
            [1, 1, 1, 0],
            [1, 1, 1, 1],
            [1, 1, 1, 1],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
        ]],
        dtype=np.uint8,
    )
    ans = np.array(
        [[
            [9, 4, 1, 0],
            [4, 4, 2, 1],
            [1, 1, 1, 1],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
            [0, 0, 0, 0],
        ]],
        dtype=np.uint8,
    )
    assert np.all(ans == edt.edtsq(labels))


def test_column_off_by_one():
    img = np.array([[1, 1], [2, 1]], dtype=np.int64, order="C")
    res = edt.edt(img)
    ans = np.array([[1, 1.41421], [1, 1]], dtype=np.float32)
    assert np.all(np.isclose(res, ans))
