"""DistanceFieldNet end-to-end: the flagship model trains (loss decreases)
and the sharded step agrees with the single-device step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edt_tpu.models import distance_net, soft


def test_train_step_decreases_loss():
    import optax

    key = jax.random.PRNGKey(0)
    params = distance_net.init_params(key, c_in=4, hidden=8)
    optimizer = optax.adam(3e-3)
    opt_state = optimizer.init(params)
    feats, target = distance_net.synthetic_batch(
        jax.random.PRNGKey(1), batch=2, shape=(8, 8, 8), c_in=4
    )
    # barrier comparable to the target distance scale — a barrier far above
    # the black-border wall cap leaves no gradient signal (the walls, which
    # are h-independent, win every softmin)
    step = distance_net.make_train_step(
        optimizer, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
        barrier=16.0,
    )
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, feats, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_sharded_step_matches_single_device():
    import optax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = jax.sharding.Mesh(devices, ("dp", "sp"))

    key = jax.random.PRNGKey(0)
    params = distance_net.init_params(key, c_in=4, hidden=8)
    optimizer = optax.sgd(1e-2)
    opt_state = optimizer.init(params)
    B, X, Y, Z, C = 2, 4, 4, 4, 4
    feats = jax.random.normal(key, (B, X, Y, Z, C), jnp.float32)
    target = jnp.zeros((B, X, Y, Z), jnp.float32)
    barrier = float(soft.default_barrier((X, Y, Z), (1.0, 1.0, 1.0)))

    step1 = distance_net.make_train_step(
        optimizer, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
        barrier=barrier,
    )
    p1, _, l1 = step1(params, opt_state, feats, target)

    stepN = distance_net.make_sharded_train_step(
        mesh, optimizer, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
        barrier=barrier,
    )
    pN, _, lN = stepN(params, opt_state, feats, target)

    assert np.isclose(float(l1), float(lN), rtol=1e-4)
    for k in params:
        assert np.allclose(np.array(p1[k]), np.array(pN[k]), atol=1e-5), k


def test_reduce_scatter_step_matches_psum_step():
    """The ZeRO-style reduce-scatter train step (sharded optimizer state,
    psum replaced by reduce_scatter(grads) + all_gather(params)) must
    produce the same parameters and loss as the replicated psum step."""
    import optax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")
    devices = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = jax.sharding.Mesh(devices, ("dp", "sp"))

    key = jax.random.PRNGKey(2)
    params = distance_net.init_params(key, c_in=4, hidden=8)
    optimizer = optax.adam(1e-2)
    B, X, Y, Z, C = 2, 4, 4, 4, 4
    feats = jax.random.normal(key, (B, X, Y, Z, C), jnp.float32)
    target = jnp.zeros((B, X, Y, Z), jnp.float32)
    # barrier at the loss's distance scale so gradients are non-trivial
    # (far above the wall cap they vanish and the comparison is vacuous)
    barrier = 12.0

    step_psum = distance_net.make_sharded_train_step(
        mesh, optimizer, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
        barrier=barrier,
    )
    p1, _, l1 = step_psum(params, optimizer.init(params), feats, target)

    step_rs = distance_net.make_sharded_train_step(
        mesh, optimizer, anisotropy=(1.0, 1.0, 1.0), temperature=0.3,
        barrier=barrier, grad_reduce_scatter=True, params_template=params,
    )
    opt_rs = distance_net.init_sharded_opt_state(mesh, optimizer, params)
    p2, opt_rs2, l2 = step_rs(params, opt_rs, feats, target)

    assert np.isclose(float(l1), float(l2), rtol=1e-5)
    for k in params:
        assert np.allclose(np.array(p1[k]), np.array(p2[k]), atol=1e-6), k

    # the sharded opt state's GLOBAL layout must equal the replicated
    # step's moments on the flat(param) layout — zero-init moments make a
    # dp/sp-major block permutation invisible in the params comparison
    # above, but not here after one step (mu = (1-b1) * grad != const)
    _, opt1, _ = step_psum(params, optimizer.init(params), feats, target)
    for ref, shd in zip(jax.tree.leaves(opt1), jax.tree.leaves(opt_rs2)):
        ref = np.asarray(ref)
        shd = np.asarray(shd)
        if ref.ndim == 0:
            assert np.allclose(ref, shd)
        else:
            assert np.allclose(ref.reshape(-1), shd[: ref.size], atol=1e-6)

    # second step consumes the returned (still-sharded) opt state
    p3, _, l3 = step_rs(p2, opt_rs2, feats, target)
    assert np.isfinite(float(l3)) and not np.allclose(
        np.array(p3["w1"]), np.array(p2["w1"]))
