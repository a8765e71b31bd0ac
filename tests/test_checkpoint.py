"""Checkpoint/resume of training state (edt_tpu.utils.checkpoint)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edt_tpu.utils import checkpoint as ckpt


def test_save_restore_roundtrip(tmp_path):
    import optax

    from edt_tpu.models import distance_net

    key = jax.random.PRNGKey(0)
    params = distance_net.init_params(key, c_in=4, hidden=8)
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    mgr = ckpt.Manager(str(tmp_path / "run"), max_to_keep=2)
    assert mgr.latest_step() is None
    mgr.save(0, {"params": params, "opt_state": opt_state})
    mgr.save(5, {"params": jax.tree.map(lambda p: p + 1.0, params),
                 "opt_state": opt_state})
    assert mgr.latest_step() == 5

    template = {"params": params, "opt_state": opt_state}
    restored = mgr.restore(template)
    for a, b in zip(jax.tree.leaves(restored["params"]),
                    jax.tree.leaves(jax.tree.map(lambda p: p + 1.0, params))):
        assert np.allclose(np.asarray(a), np.asarray(b))

    # restoring a specific earlier step works too
    restored0 = mgr.restore(template, step=0)
    for a, b in zip(jax.tree.leaves(restored0["params"]),
                    jax.tree.leaves(params)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_resume_continues_training(tmp_path):
    """Interrupted-training shape: save mid-run, restore, and the loss
    trajectory continues from the restored state."""
    import optax

    from edt_tpu.models import distance_net, soft

    shape = (8, 8, 8)
    key = jax.random.PRNGKey(1)
    params = distance_net.init_params(key, c_in=8, hidden=8)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)
    step = distance_net.make_train_step(optimizer, temperature=0.3,
                                        barrier=32.0)
    feats, target = distance_net.synthetic_batch(key, 1, shape)

    for _ in range(3):
        params, opt_state, _ = step(params, opt_state, feats, target)
    mgr = ckpt.Manager(str(tmp_path / "run"))
    mgr.save(3, {"params": params, "opt_state": opt_state})

    # "crash": fresh process state, restore, one more step
    restored = mgr.restore({"params": params, "opt_state": opt_state})
    p2, o2, loss_resumed = step(restored["params"], restored["opt_state"],
                                feats, target)
    p3, o3, loss_direct = step(params, opt_state, feats, target)
    assert np.isclose(float(loss_resumed), float(loss_direct), rtol=1e-6)
