"""Device implementation vs the independent host oracle (exact FH scan)."""

import numpy as np
import pytest

import edt_tpu as edt
from edt_tpu.utils import host_reference as hr


@pytest.mark.parametrize("black_border", [True, False])
@pytest.mark.parametrize("nlabels", [1, 2, 6])
def test_device_vs_host_3d(black_border, nlabels):
    labels = np.random.randint(0, nlabels + 1, size=(14, 15, 16)).astype(np.uint32)
    dev = edt.edtsq(labels, black_border=black_border)
    host = hr.edtsq_host(labels, (1.0, 1.0, 1.0), black_border)
    assert np.array_equal(dev, host)


@pytest.mark.parametrize("black_border", [True, False])
def test_device_vs_host_anisotropic(black_border):
    labels = np.random.randint(0, 3, size=(12, 13, 14)).astype(np.uint32)
    dev = edt.edtsq(labels, anisotropy=(2.0, 3.0, 5.0), black_border=black_border)
    host = hr.edtsq_host(labels, (2.0, 3.0, 5.0), black_border)
    # integer-weight arithmetic is exact in f32 at these scales
    assert np.array_equal(dev, host)


@pytest.mark.parametrize("black_border", [True, False])
def test_device_vs_host_2d_fractional(black_border):
    labels = np.random.randint(0, 4, size=(33, 37)).astype(np.uint32)
    dev = edt.edtsq(labels, anisotropy=(0.7, 1.3), black_border=black_border)
    host = hr.edtsq_host(labels, (0.7, 1.3), black_border)
    finite = np.isfinite(host)
    assert np.all(np.isfinite(dev) == finite)
    assert np.allclose(dev[finite], host[finite], rtol=1e-5, atol=1e-6)
