"""Fused Pallas PCT attention vs the unfused einsum path: values + gradients.

The fused op runs in interpret mode on the CPU test backend; numerics must
match the reference-semantics einsum formulation (SA: shared q/k, sqrt(da)
scale, transposed apply — reference pct.py:187-232; OA: no scale, double
normalization — pct.py:236-273).
"""

import numpy as np

import jax
import jax.numpy as jnp

from sgaligner_tpu.models.pct import SABlock, OABlock
from sgaligner_tpu.ops.pct_attention import pct_attention_fused


def _einsum_reference(x, wqk, wv, bv, scale, double_norm):
    q = x @ wqk
    v = x @ wv + bv
    energy = jnp.einsum("opd,oqd->opq", q, q)
    if scale:
        energy = energy / jnp.sqrt(float(wqk.shape[1]))
    a = jax.nn.softmax(energy, axis=-1)
    if double_norm:
        a = a / (1e-9 + a.sum(axis=1, keepdims=True))
    return jnp.einsum("opc,opq->oqc", v, a)


def _rand(shape, seed):
    return jnp.array(np.random.default_rng(seed).normal(size=shape),
                     jnp.float32)


def test_fused_attention_forward_matches_einsum():
    x = _rand((4, 16, 128), 0)
    wqk = 0.2 * _rand((128, 32), 1)
    wv = 0.2 * _rand((128, 128), 2)
    bv = 0.1 * _rand((128,), 3)
    for scale, double_norm in ((True, False), (False, True)):
        got = pct_attention_fused(x, wqk, wv, bv, scale, double_norm, True)
        want = _einsum_reference(x, wqk, wv, bv, scale, double_norm)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_fused_attention_gradients_match_autodiff():
    x = _rand((2, 16, 128), 4)
    wqk = 0.2 * _rand((128, 32), 5)
    wv = 0.2 * _rand((128, 128), 6)
    bv = 0.1 * _rand((128,), 7)
    cot = _rand((2, 16, 128), 8)

    for scale, double_norm in ((True, False), (False, True)):
        def loss_fused(x, wqk, wv, bv):
            return (pct_attention_fused(x, wqk, wv, bv, scale, double_norm,
                                        True) * cot).sum()

        def loss_ref(x, wqk, wv, bv):
            return (_einsum_reference(x, wqk, wv, bv, scale,
                                      double_norm) * cot).sum()

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, wqk, wv, bv)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, wqk, wv, bv)
        for a, b, name in zip(g_fused, g_ref, ("dx", "dwqk", "dwv", "dbv")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-5, atol=5e-5,
                err_msg=f"{name} (scale={scale}, double_norm={double_norm})")


def test_sa_block_fused_matches_unfused():
    """SABlock/OABlock with fused='always' (interpret on CPU) share the param
    tree with fused='never' and produce identical outputs and param grads."""
    x = _rand((4, 16, 128), 9)
    mask = jnp.array([True, True, True, False])

    for cls in (SABlock, OABlock):
        never = cls(128, fused="never")
        always = cls(128, fused="always")
        params = never.init(jax.random.key(0), x, mask, train=False)
        params_f = always.init(jax.random.key(0), x, mask, train=False)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_f))

        out_n = never.apply(params, x, mask, train=False)
        out_f = always.apply(params, x, mask, train=False)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                                   rtol=2e-5, atol=2e-5)

        def loss(p, mod):
            return (mod.apply(p, x, mask, train=False) ** 2).sum()

        g_n = jax.grad(loss)(params, never)
        g_f = jax.grad(loss)(params, always)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
            g_n, g_f)


def test_fused_attention_odd_object_count():
    """O not divisible by the preferred tiles still runs (t=1 grid)."""
    x = _rand((3, 8, 128), 10)
    wqk = 0.2 * _rand((128, 32), 11)
    wv = 0.2 * _rand((128, 128), 12)
    bv = jnp.zeros((128,), jnp.float32)
    got = pct_attention_fused(x, wqk, wv, bv, True, False, True)
    want = _einsum_reference(x, wqk, wv, bv, True, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


import pytest


@pytest.mark.parametrize("cls", [OABlock, SABlock])
def test_oa_block_fused_train_mode_stats_parity(cls):
    """SA/OA block fused vs unfused in TRAIN mode: the whole-block training
    op (pct_block_residual — kernel sums, internal batch-stat fold, in-VMEM
    epilogue backward) must reproduce the unfused masked batch-stats
    (values, running-stat updates and param grads)."""
    x = _rand((4, 16, 128), 13)
    mask = jnp.array([True, True, True, False])
    never = cls(128, fused="never")
    always = cls(128, fused="always")
    params = never.init(jax.random.key(0), x, mask, train=False)

    out_n, mut_n = never.apply(params, x, mask, train=True,
                               mutable=["batch_stats"])
    out_f, mut_f = always.apply(params, x, mask, train=True,
                                mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_n),
                               rtol=2e-5, atol=2e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
        mut_n["batch_stats"], mut_f["batch_stats"])

    def loss(p, mod):
        y, _ = mod.apply(p, x, mask, train=True, mutable=["batch_stats"])
        return (y.astype(jnp.float32) ** 2).sum()

    g_n = jax.grad(loss)(params, never)
    g_f = jax.grad(loss)(params, always)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        g_n, g_f)
