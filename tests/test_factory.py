"""Optimizer / scheduler factory tests."""

import numpy as np

import jax.numpy as jnp

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.engine.factory import build_lr_schedule, build_optimizer


def test_constant_lr_default():
    cfg = make_cfg()
    assert build_lr_schedule(cfg) == cfg.optim.lr


def test_exponential_schedule():
    cfg = make_cfg()
    cfg.optim.scheduler = "exponential"
    cfg.optim.steps_per_epoch = 10
    sched = build_lr_schedule(cfg)
    np.testing.assert_allclose(sched(0), 1e-3)
    np.testing.assert_allclose(sched(10), 1e-3 * 0.95)
    np.testing.assert_allclose(sched(25), 1e-3 * 0.95**2)


def test_warmup_cosine_schedule():
    cfg = make_cfg()
    cfg.optim.scheduler = "warmup-cosine"
    cfg.optim.warmup_steps = 5
    cfg.optim.steps_per_epoch = 10
    sched = build_lr_schedule(cfg)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(5)), 1e-3, rtol=1e-5)


def test_torch_adam_semantics():
    """Weight decay folds into the gradient before Adam (L2, not AdamW)."""
    import optax

    cfg = make_cfg()
    cfg.optim.weight_decay = 0.1
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    # zero gradient: update must still be nonzero due to L2-in-grad
    updates, _ = tx.update({"w": jnp.zeros(3)}, state, params)
    assert float(jnp.abs(updates["w"]).sum()) > 0
    new = optax.apply_updates(params, updates)
    assert float(new["w"][0]) < 1.0  # decays toward zero


def test_grad_accumulation():
    """grad_acc_steps=2 applies the averaged update every 2nd micro-batch
    (reference grad-acc, base_trainer.py:173-176)."""
    import optax

    cfg = make_cfg()
    cfg.optim.grad_acc_steps = 2
    cfg.optim.weight_decay = 0.0
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    g = {"w": jnp.full(3, 0.5)}

    updates1, state = tx.update(g, state, params)
    assert float(jnp.abs(updates1["w"]).sum()) == 0.0  # accumulating
    updates2, state = tx.update(g, state, params)
    assert float(jnp.abs(updates2["w"]).sum()) > 0.0   # applied


def test_nonfinite_grad_skipped():
    import optax

    cfg = make_cfg()
    tx = build_optimizer(cfg)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.full(3, jnp.nan)}, state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(new["w"]), np.ones(3))