"""Binary fast path (bool inputs / binary_edt) vs the multi-label path."""

import numpy as np
import pytest

import edt_tpu as edt
from scipy import ndimage


@pytest.mark.parametrize("black_border", [True, False])
def test_bool_matches_uint8(black_border):
    vol = np.random.rand(20, 21, 22) > 0.5
    b = edt.edtsq(vol, black_border=black_border)
    m = edt.edtsq(vol.astype(np.uint8), black_border=black_border)
    finite = np.isfinite(m)
    assert np.array_equal(np.isfinite(b), finite)
    assert np.array_equal(b[finite], m[finite])


@pytest.mark.parametrize("black_border", [True, False])
def test_binary_edt_nonzero_foreground(black_border):
    labels = np.random.randint(0, 4, size=(15, 16, 17)).astype(np.uint32)
    b = edt.binary_edtsq(labels, black_border=black_border)
    ref = edt.edtsq(labels != 0, black_border=black_border)
    assert np.array_equal(b, ref)


def test_bool_vs_scipy():
    vol = np.zeros((30, 31, 32), dtype=bool)
    vol[1:-1, 1:-1, 1:-1] = np.random.rand(28, 29, 30) > 0.4
    res = edt.edt(vol)
    sp = ndimage.distance_transform_edt(vol)
    assert np.all(np.abs(res - sp) < 1e-6)


def test_binary_anisotropic():
    vol = np.zeros((12, 13, 14), dtype=bool)
    vol[2:10, 2:10, 2:10] = True
    res = edt.edtsq(vol, anisotropy=(2.0, 3.0, 5.0), black_border=True)
    from edt_tpu.utils import host_reference as hr

    oracle = hr.edtsq_host(vol, (2.0, 3.0, 5.0), True)
    assert np.array_equal(res, oracle)
