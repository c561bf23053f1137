"""Fused Pallas PointNet: value + gradient parity vs the jnp composition.

Runs in interpreter mode on CPU (tests/conftest.py forces the CPU backend);
the compiled TPU path is exercised by bench.py and the engine on hardware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgaligner_tpu.ops.pointnet_fused import pointnet_fused


def reference(x, w1, b1, w2, b2, w3, b3):
    x = jnp.swapaxes(x, 1, 2)  # channel-first input -> points-last math
    h = jax.nn.relu(x @ w1 + b1[0])
    h = jax.nn.relu(h @ w2 + b2[0])
    h = jax.nn.relu(h @ w3 + b3[0])
    return h.max(axis=1)


@pytest.fixture
def weights():
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.array(rng.normal(scale=0.5, size=s), jnp.float32)
    return dict(w1=mk(3, 64), b1=mk(1, 64), w2=mk(64, 128), b2=mk(1, 128),
                w3=mk(128, 256), b3=mk(1, 256))


def test_forward_parity(weights):
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(8, 3, 32)), jnp.float32)
    got = pointnet_fused(x, weights["w1"], weights["b1"], weights["w2"],
                         weights["b2"], weights["w3"], weights["b3"], True)
    want = reference(x, **weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(weights):
    rng = np.random.default_rng(2)
    x = jnp.array(rng.normal(size=(4, 3, 16)), jnp.float32)
    cot = jnp.array(rng.normal(size=(4, 256)), jnp.float32)

    def loss_fused(x, w1, b1, w2, b2, w3, b3):
        return (pointnet_fused(x, w1, b1, w2, b2, w3, b3, True) * cot).sum()

    def loss_ref(x, w1, b1, w2, b2, w3, b3):
        return (reference(x, w1, b1, w2, b2, w3, b3) * cot).sum()

    args = (x, weights["w1"], weights["b1"], weights["w2"], weights["b2"],
            weights["w3"], weights["b3"])
    # x gets a ZERO cotangent by design (points are data); weights must match
    g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    assert not np.asarray(g_fused[0]).any()
    for a, b in zip(g_fused[1:], g_ref[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_odd_object_count_tile(weights):
    # O=6 -> tile 3; O=7 -> tile 1; both must work
    rng = np.random.default_rng(3)
    for o in (6, 7):
        x = jnp.array(rng.normal(size=(o, 3, 8)), jnp.float32)
        got = pointnet_fused(x, weights["w1"], weights["b1"], weights["w2"],
                             weights["b2"], weights["w3"], weights["b3"], True)
        want = reference(x, **weights)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
