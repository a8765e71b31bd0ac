"""AOT export/serving: serialized transforms must reproduce the live
jitted transform after a deserialize round trip."""

import numpy as np

import jax
import jax.numpy as jnp

from edt_tpu.ops import compose
from edt_tpu.utils import export as edt_export


def test_transform_serialize_roundtrip():
    rng = np.random.default_rng(5)
    labels = rng.integers(0, 4, size=(12, 13, 14)).astype(np.uint32)
    anis = (2.0, 1.0, 3.0)
    data = edt_export.serialize_transform(labels.shape, np.uint32,
                                          anisotropy=anis,
                                          black_border=True)
    assert isinstance(data, (bytes, bytearray)) and len(data) > 0
    run = edt_export.load(data)
    got = np.array(run(jnp.asarray(labels)))
    want = np.array(compose.edtsq(jnp.asarray(labels),
                                  jnp.asarray(anis, jnp.float32), True))
    np.testing.assert_array_equal(got, want)


def test_export_binary_sqrt_variant():
    rng = np.random.default_rng(6)
    mask = (rng.random((10, 11, 12)) > 0.5).astype(np.uint8)
    exp = edt_export.export_transform(mask.shape, np.uint8, binary=True,
                                      sqrt=True, black_border=True)
    run = edt_export.load(exp)
    got = np.array(run(jnp.asarray(mask)))
    want = np.sqrt(np.array(compose.edtsq(
        jnp.asarray(mask), jnp.ones(3, jnp.float32), True, binary=True)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_export_fn_generic_multilabel_grad():
    """Even the differentiable path exports: grad of the wall-faithful
    multilabel transform, fixed shapes, round-tripped."""
    from edt_tpu.models import soft

    rng = np.random.default_rng(7)
    shape = (8, 9, 10)
    lab = rng.integers(0, 3, size=shape).astype(np.uint32)
    occ = (lab != 0).astype(np.float32)

    def gfn(lab, occ):
        return jax.grad(lambda o: jnp.sum(soft.multilabel_edtsq(
            lab, o, (1.0, 1.0, 2.0), black_border=True, barrier=600.0,
            binary_occupancy=True)))(occ)

    exp = edt_export.export_fn(
        gfn, jax.ShapeDtypeStruct(shape, jnp.uint32),
        jax.ShapeDtypeStruct(shape, jnp.float32))
    run = edt_export.load(exp.serialize())
    got = np.array(run(jnp.asarray(lab), jnp.asarray(occ)))
    want = np.array(gfn(jnp.asarray(lab), jnp.asarray(occ)))
    np.testing.assert_array_equal(got, want)
