"""Fused PCT tail (concat -> 1024-linear -> BN stats -> min/max pool) parity.

The fused kernel (ops/pct_tail.py) replaces the reference tail semantics
(/root/reference/src/aligner/networks/pct.py:275-317: concat -> conv1024 ->
BatchNorm -> LeakyReLU(0.2) -> max over points) via the monotone-pool
identity. These tests prove, at f64 on the CPU interpret backend:

* op level: outputs and input/weight gradients equal the XLA fallback,
* model level: NaivePCT with ``fused='always'`` matches ``fused='never'``
  end-to-end (forward, batch_stats updates, parameter gradients) with f64
  parameters, in train and eval modes,
* the monotonicity reconstruction handles negative BN scales (w < 0 selects
  the min-pool branch).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgaligner_tpu.models.pct import NaivePCT
from sgaligner_tpu.ops.pct_tail import _unfused, pct_tail_fused


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _rand_inputs(rng, o=6, p=64, c=128, k=256):
    xs = [jnp.asarray(rng.normal(size=(o, p, c))) for _ in range(4)]
    w = jnp.asarray(rng.normal(size=(4 * c, k)) * 0.05)
    mask = jnp.asarray((rng.random(o) > 0.3).astype(np.float64))[:, None]
    return xs, w, mask


def test_tail_op_forward_matches_fallback():
    rng = np.random.default_rng(0)
    xs, w, mask = _rand_inputs(rng)
    got = pct_tail_fused(*xs, w, mask, True)
    want = _unfused(xs, w, mask)
    for name, a, b in zip(("pmax", "pmin", "ssum", "ssumsq"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-10, err_msg=name)


def test_tail_op_gradients_match_fallback():
    rng = np.random.default_rng(1)
    xs, w, mask = _rand_inputs(rng)

    def loss(fn):
        def f(x1, x2, x3, x4, w):
            outs = fn(x1, x2, x3, x4, w)
            # weight every output element differently so no grad path is
            # trivially zero
            return sum((o * (1.0 + jnp.arange(o.size).reshape(o.shape) % 5)
                        ).sum() for o in outs)
        return f

    g_f = jax.grad(loss(lambda *a: pct_tail_fused(*a, mask, True)),
                   argnums=(0, 1, 2, 3, 4))(*xs, w)
    g_u = jax.grad(loss(lambda *a: _unfused(list(a[:4]), a[4], mask)),
                   argnums=(0, 1, 2, 3, 4))(*xs, w)
    for i, (a, b) in enumerate(zip(g_f, g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10,
                                   err_msg=f"grad argnum {i}")


def _init_f64(model, pts, mask):
    vs = model.init(jax.random.key(0), pts, mask, train=False)
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, vs)


def test_naivepct_fused_tail_matches_unfused_train_and_eval():
    rng = np.random.default_rng(2)
    o, p = 6, 64
    pts = jnp.asarray(rng.normal(size=(o, p, 3)))
    mask = jnp.asarray([True, True, True, True, False, False])
    vs = _init_f64(NaivePCT(out_size=32, dtype=jnp.float64, fused="never"),
                   pts, mask)

    outs, stats = {}, {}
    for f in ("never", "always"):
        m = NaivePCT(out_size=32, dtype=jnp.float64, fused=f)
        y, mut = m.apply(vs, pts, mask, train=True,
                         rngs={"dropout": jax.random.key(1)},
                         mutable=["batch_stats"])
        outs[f], stats[f] = np.asarray(y), mut["batch_stats"]
        y_eval = m.apply(vs, pts, mask, train=False)
        outs[f + "_eval"] = np.asarray(y_eval)

    valid = np.asarray(mask)
    for suffix in ("", "_eval"):
        np.testing.assert_allclose(
            outs["never" + suffix][valid], outs["always" + suffix][valid],
            rtol=1e-9, atol=1e-9, err_msg=f"forward{suffix or ' train'}")
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(stats["never"]),
            jax.tree_util.tree_leaves_with_path(stats["always"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9, err_msg=str(pa))


def test_naivepct_fused_tail_gradients_match_unfused():
    rng = np.random.default_rng(3)
    o, p = 6, 64
    pts = jnp.asarray(rng.normal(size=(o, p, 3)))
    mask = jnp.asarray([True, True, True, False, False, False])
    vs = _init_f64(NaivePCT(out_size=32, dtype=jnp.float64, fused="never"),
                   pts, mask)

    def grads(f):
        m = NaivePCT(out_size=32, dtype=jnp.float64, fused=f)

        def loss(params):
            y, _ = m.apply({**vs, "params": params}, pts, mask, train=True,
                           rngs={"dropout": jax.random.key(1)},
                           mutable=["batch_stats"])
            y = jnp.where(mask[:, None], y, 0.0)
            return (y * (1.0 + jnp.arange(y.size).reshape(y.shape) % 7)).sum()

        return jax.grad(loss)(vs["params"])

    g_n, g_a = grads("never"), grads("always")
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g_n),
                               jax.tree_util.tree_leaves_with_path(g_a)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-8, atol=1e-8, err_msg=str(pa))


def test_negative_bn_scale_uses_min_pool():
    """Force a negative linear_bn scale: the fused epilogue must reproduce
    the unfused max(leaky(BN(z))) exactly (min-pool branch)."""
    rng = np.random.default_rng(4)
    o, p = 4, 32
    pts = jnp.asarray(rng.normal(size=(o, p, 3)))
    mask = jnp.asarray([True] * o)
    vs = _init_f64(NaivePCT(out_size=16, dtype=jnp.float64, fused="never"),
                   pts, mask)
    scale = vs["params"]["linear_bn"]["scale"]
    vs["params"]["linear_bn"]["scale"] = jnp.asarray(
        rng.choice([-1.0, 1.0], size=scale.shape) *
        (0.5 + rng.random(scale.shape)))

    ys = {}
    for f in ("never", "always"):
        m = NaivePCT(out_size=16, dtype=jnp.float64, fused=f)
        y, _ = m.apply(vs, pts, mask, train=True,
                       rngs={"dropout": jax.random.key(1)},
                       mutable=["batch_stats"])
        ys[f] = np.asarray(y)
    np.testing.assert_allclose(ys["never"], ys["always"],
                               rtol=1e-9, atol=1e-9)
