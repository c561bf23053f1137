"""Fused PCT embedding kernels (ops/pct_embed.py) parity at f64.

NaivePCT with ``fused='always'`` (interpret on CPU) must match the unfused
Dense+MaskedBatchNorm+relu embedding exactly: forward, batch-stats updates,
and parameter gradients — including the channel-first input layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgaligner_tpu.models.pct import NaivePCT
from sgaligner_tpu.ops.pct_embed import (_e1_unfused, _e2_unfused,
                                         embed_first_fused,
                                         embed_second_fused)


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_embed_ops_match_fallback():
    rng = np.random.default_rng(0)
    o, p, c = 6, 32, 128
    x_cf = jnp.asarray(rng.normal(size=(o, 3, p)))
    w0 = jnp.asarray(rng.normal(size=(3, c)) * 0.3)
    mask = jnp.asarray((rng.random(o) > 0.3).astype(np.float64))[:, None]
    got = embed_first_fused(x_cf, w0, mask, True)
    want = _e1_unfused(x_cf, w0, mask)
    for name, a, b in zip(("h0", "s1", "s2"), got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-10, err_msg=name)

    h0 = got[0]
    wf = jnp.asarray(rng.normal(size=(1, c)) * 0.5 + 1.0)
    bf = jnp.asarray(rng.normal(size=(1, c)) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(c, c)) * 0.1)
    got2 = embed_second_fused(h0, wf, bf, w1, mask, True)
    want2 = _e2_unfused(h0, wf, bf, w1, mask)
    for name, a, b in zip(("h1", "s1", "s2"), got2, want2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-9, err_msg=name)


def test_embed_op_gradients_match_fallback():
    rng = np.random.default_rng(1)
    o, p, c = 4, 16, 128
    x_cf = jnp.asarray(rng.normal(size=(o, 3, p)))
    w0 = jnp.asarray(rng.normal(size=(3, c)) * 0.3)
    mask = jnp.asarray(np.ones((o, 1)))
    h0 = embed_first_fused(x_cf, w0, mask, True)[0]
    wf = jnp.asarray(rng.normal(size=(1, c)) * 0.5 + 1.0)
    bf = jnp.asarray(rng.normal(size=(1, c)) * 0.1)
    w1 = jnp.asarray(rng.normal(size=(c, c)) * 0.1)

    def loss(fn):
        def f(h0, wf, bf, w1):
            outs = fn(h0, wf, bf, w1)
            return sum((a * (1.0 + jnp.arange(a.size).reshape(a.shape) % 5)
                        ).sum() for a in outs)
        return f

    g_f = jax.grad(loss(lambda *a: embed_second_fused(*a, mask, True)),
                   argnums=(0, 1, 2, 3))(h0, wf, bf, w1)
    g_u = jax.grad(loss(lambda *a: _e2_unfused(*a, mask)),
                   argnums=(0, 1, 2, 3))(h0, wf, bf, w1)
    for i, (a, b) in enumerate(zip(g_f, g_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9,
                                   err_msg=f"grad argnum {i}")

    # first-layer weight grad
    def l1(fn):
        def f(w0):
            outs = fn(w0)
            return sum((a * (1.0 + jnp.arange(a.size).reshape(a.shape) % 3)
                        ).sum() for a in outs)
        return f

    ga = jax.grad(l1(lambda w: embed_first_fused(x_cf, w, mask, True)))(w0)
    gb = jax.grad(l1(lambda w: _e1_unfused(x_cf, w, mask)))(w0)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-9, atol=1e-9)


def test_naivepct_fused_embedding_matches_unfused():
    rng = np.random.default_rng(2)
    o, p = 6, 32
    pts = jnp.asarray(rng.normal(size=(o, p, 3)))
    mask = jnp.asarray([True, True, True, True, False, False])
    m0 = NaivePCT(out_size=32, dtype=jnp.float64, fused="never")
    vs = m0.init(jax.random.key(0), pts, mask, train=False)
    vs = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float64)
        if jnp.issubdtype(a.dtype, jnp.floating) else a, vs)

    outs, stats, grads = {}, {}, {}
    for f in ("never", "always"):
        for cf in (False, True):
            m = NaivePCT(out_size=32, dtype=jnp.float64, fused=f,
                         channel_first=cf)
            inp = jnp.swapaxes(pts, 1, 2) if cf else pts
            y, mut = m.apply(vs, inp, mask, train=True,
                             rngs={"dropout": jax.random.key(1)},
                             mutable=["batch_stats"])
            outs[(f, cf)] = np.asarray(y)
            stats[(f, cf)] = mut["batch_stats"]

            def loss(params, m=m, inp=inp):
                y2, _ = m.apply({**vs, "params": params}, inp, mask,
                                train=True,
                                rngs={"dropout": jax.random.key(1)},
                                mutable=["batch_stats"])
                y2 = jnp.where(mask[:, None], y2, 0.0)
                return (y2 * (1.0 + jnp.arange(y2.size).reshape(y2.shape)
                              % 7)).sum()

            grads[(f, cf)] = jax.grad(loss)(vs["params"])

    base = ("never", False)
    for key in [("never", True), ("always", False), ("always", True)]:
        valid = np.asarray(mask)
        np.testing.assert_allclose(outs[base][valid], outs[key][valid],
                                   rtol=1e-9, atol=1e-9, err_msg=str(key))
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(stats[base]),
                jax.tree_util.tree_leaves_with_path(stats[key])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-9, atol=1e-9,
                                       err_msg=f"{key} stats {pa}")
        for (pa, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(grads[base]),
                jax.tree_util.tree_leaves_with_path(grads[key])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-7, atol=1e-7,
                                       err_msg=f"{key} grad {pa}")
