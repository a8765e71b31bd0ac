"""UNet3D model family: conv halo-exchange sharding must reproduce the
single-device network, and the sharded train step must match the
single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edt_tpu.models import unet3d

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 4, reason="needs multiple devices"
)


def _data(b=2, x=16, y=8, z=8, c=4, seed=3):
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((b, x, y, z, c)).astype(np.float32)
    target = (rng.standard_normal((b, x, y, z)) ** 2).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(target)


def test_apply_shapes_and_levels():
    params = unet3d.init_params(jax.random.PRNGKey(0), c_in=4, c0=8,
                                levels=2)
    assert unet3d.num_levels(params) == 2
    feats, _ = _data()
    out = unet3d.apply(params, feats)
    assert out.shape == feats.shape[:4]
    assert bool(jnp.all(jnp.isfinite(out)))
    # params are a pure float32 pytree (optimizer-ready, no static leaves)
    assert all(l.dtype == jnp.float32 for l in jax.tree.leaves(params))


def test_sharded_apply_matches_single():
    """Halo exchange over the sp axis == the unsharded 'SAME' conv: edge
    shards receive zero halos (the volume's zero padding), interior
    shards their neighbors' planes."""
    import functools

    from jax.sharding import Mesh, PartitionSpec as P

    params = unet3d.init_params(jax.random.PRNGKey(1), c_in=4, c0=8,
                                levels=2)
    feats, _ = _data()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))

    @functools.partial(jax.shard_map, mesh=mesh,
                       in_specs=(P(), P(None, "sp")),
                       out_specs=P(None, "sp"), check_vma=True)
    def sharded(params, feats):
        return unet3d.apply(params, feats, axis_name="sp")

    got = np.array(sharded(params, feats))
    want = np.array(unet3d.apply(params, feats))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_train_step_matches_single():
    import optax

    from jax.sharding import Mesh

    params = unet3d.init_params(jax.random.PRNGKey(2), c_in=4, c0=8,
                                levels=1)
    feats, target = _data(b=2, x=8, y=4, z=4)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)
    kw = dict(anisotropy=(1.0, 1.0, 1.0), temperature=0.3, barrier=50.0)

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(2, 2), ("dp", "sp"))
    step_s = unet3d.make_sharded_train_step(mesh, optimizer, **kw)
    p_s, _, loss_s = step_s(params, opt_state, feats, target)

    step_1 = unet3d.make_train_step(optimizer, **kw)
    p_1, _, loss_1 = step_1(params, opt_state, feats, target)

    assert np.isclose(float(loss_s), float(loss_1), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p_s), jax.tree.leaves(p_1)):
        np.testing.assert_allclose(np.array(a), np.array(b), rtol=1e-4,
                                   atol=1e-5)


def test_bf16_compute_smoke():
    params = unet3d.init_params(jax.random.PRNGKey(3), c_in=4, c0=8,
                                levels=1)
    feats, _ = _data(x=8, y=4, z=4)
    out = unet3d.apply(params, feats, compute_dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out)))
