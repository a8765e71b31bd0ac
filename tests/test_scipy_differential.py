"""Differential tests vs scipy.ndimage, mirroring reference
automated_test.py:383-424, 553-630, 702-721."""

import numpy as np
import pytest
from scipy import ndimage

import edt_tpu as edt


def compare_scipy_edt(labels, anisotropy=None, black_border=False):
    kwargs = {} if anisotropy is None else {"sampling": anisotropy}
    mlaedt = edt.edt(labels, anisotropy=anisotropy, black_border=black_border)
    sp = ndimage.distance_transform_edt(labels, **kwargs)
    assert np.all(np.abs(sp - mlaedt) < 1e-6), np.max(np.abs(sp - mlaedt))


def test_2d_scipy_comparison_black_border():
    for dtype in (np.uint8, np.uint64):
        randos = np.random.randint(0, 2, size=(3, 3), dtype=dtype)
        labels = np.zeros((5, 5), dtype=dtype)
        labels[1:-1, 1:-1] = randos
        compare_scipy_edt(labels)


def test_2d_scipy_comparison():
    for _ in range(5):
        for dtype in (np.uint32, bool):
            randos = np.random.randint(0, 2, size=(5, 5)).astype(dtype)
            labels = np.zeros((7, 7), dtype=dtype)
            labels[1:-1, 1:-1] = randos
            compare_scipy_edt(labels)


@pytest.mark.parametrize("order", ("C", "F"))
@pytest.mark.parametrize("dtype", (np.uint32, bool))
def test_3d_scipy_comparison(dtype, order):
    randos = np.random.randint(0, 2, size=(40, 40, 40)).astype(dtype)
    labels = np.zeros((42, 42, 42), dtype=dtype, order=order)
    labels[1:-1, 1:-1, 1:-1] = randos
    compare_scipy_edt(labels)


def test_non_mutation_2d():
    x = np.array(
        [
            [True, False, True, True],
            [False, True, True, True],
            [False, True, True, True],
            [True, True, True, True],
            [False, True, True, True],
        ],
        dtype=bool,
    )
    compare_scipy_edt(x)


def test_dots(numdots=5, N=100, radius=20):
    img = np.zeros((N, N), dtype=bool)
    locations = np.random.randint(0, N - 1, size=(numdots, 2))
    xx, yy = np.meshgrid(range(N), range(N), indexing="xy")
    for loc in locations:
        d = np.sqrt((xx - loc[0]) ** 2 + (yy - loc[1]) ** 2)
        img[d <= radius] = True
    img[:, 0] = 0
    img[0, :] = 0
    img[-1, :] = 0
    img[:, -1] = 0
    compare_scipy_edt(img)


def test_3d_anisotropic_scipy():
    randos = np.random.randint(0, 2, size=(30, 31, 32), dtype=np.uint32)
    labels = np.zeros((32, 33, 34), dtype=np.uint32)
    labels[1:-1, 1:-1, 1:-1] = randos
    res = edt.edt(labels, anisotropy=(6, 6, 30), black_border=False)
    sp = ndimage.distance_transform_edt(labels, sampling=(6, 6, 30))
    assert np.all(np.isclose(sp, res))


def test_3d_high_anisotropy():
    shape = (64, 64, 64)
    anisotropy = (1000000, 1200000, 40)
    labels = np.ones(shape, dtype=np.uint8)
    labels[0, 0, 0] = 0
    labels[-1, -1, -1] = 0
    resedt = edt.edt(labels, anisotropy=anisotropy, black_border=False)
    mx = np.max(resedt)
    assert np.isfinite(mx)
    resscipy = ndimage.distance_transform_edt(labels, sampling=anisotropy)
    assert np.all(np.isclose(resscipy, resedt))
