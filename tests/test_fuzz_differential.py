"""Seeded fuzz: random shapes/dtypes/anisotropies/borders through the full
NumPy API vs the independent host oracle (exact FH scan)."""

import numpy as np
import pytest

import edt_tpu as edt
from edt_tpu.utils import host_reference as hr


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_api_vs_host_oracle(seed):
    rng = np.random.default_rng(seed)
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(1, 28)) for _ in range(ndim))
    dtype = rng.choice([np.uint8, np.int16, np.uint32, np.int64,
                        np.float32, np.bool_])
    nlabels = int(rng.integers(1, 6))
    labels = rng.integers(0, nlabels + 1, size=shape)
    if dtype == np.bool_:
        labels = labels > (nlabels // 2)
    labels = labels.astype(dtype)
    aniso = tuple(float(a) for a in rng.uniform(0.5, 8.0, size=ndim))
    bb = bool(rng.integers(0, 2))
    order = rng.choice(["C", "F"])
    data = np.asfortranarray(labels) if order == "F" else labels

    got = edt.edtsq(data, anisotropy=aniso, black_border=bb)
    # oracle compares label structure, so bool must reduce the same way
    oracle_in = data.astype(np.uint8) if dtype == np.bool_ else data
    want = hr.edtsq_host(np.ascontiguousarray(oracle_in), aniso, bb,
                         method="fh")
    fin = np.isfinite(want)
    assert np.array_equal(np.isfinite(got), fin), (seed, shape, dtype, bb)
    assert np.allclose(got[fin], want[fin], rtol=1e-5, atol=1e-5), (
        seed, shape, dtype, aniso, bb, order)
