"""Standalone timing harness for the fused PCT attention kernel.

Times the fused op (fwd and fwd+bwd) and the whole-SA-block composition at
flagship shapes, with forced value readback (tunneled PJRT returns from
block_until_ready at dispatch). Use SGA_ATTN_TFWD / SGA_ATTN_TBWD to sweep
tiles.

Usage: python scripts/bench_pct_attention.py [O] [P] [C]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from sgaligner_tpu.ops.pct_attention import pct_attention_fused

O = int(sys.argv[1]) if len(sys.argv) > 1 else 320
P = int(sys.argv[2]) if len(sys.argv) > 2 else 512
C = int(sys.argv[3]) if len(sys.argv) > 3 else 128
DA = C // 4
DTYPE = jnp.bfloat16
REPS = 30


def timeit(fn, *args):
    out = fn(*args)  # compile
    leaves = [x for x in jax.tree_util.tree_leaves(out)]
    float(jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        float(jnp.asarray(leaves[0]).ravel()[0].astype(jnp.float32))
        best = min(best, (time.perf_counter() - t0) / REPS)
    return best * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(O, P, C)), DTYPE)
    wqk = jnp.asarray(rng.normal(size=(C, DA)) * 0.05, DTYPE)
    wv = jnp.asarray(rng.normal(size=(C, C)) * 0.05, DTYPE)
    bv = jnp.asarray(rng.normal(size=(C,)) * 0.05, DTYPE)

    @jax.jit
    def fwd(x, wqk, wv, bv):
        return pct_attention_fused(x, wqk, wv, bv, True, False)

    @jax.jit
    def fwdbwd(x, wqk, wv, bv):
        def loss(x, wqk, wv, bv):
            return pct_attention_fused(x, wqk, wv, bv, True, False).astype(
                jnp.float32).sum()
        return jax.grad(loss, argnums=(0, 1, 2, 3))(x, wqk, wv, bv)

    t_f = timeit(fwd, x, wqk, wv, bv)
    t_fb = timeit(fwdbwd, x, wqk, wv, bv)

    # FLOP model (MACs x2), fwd: qk-proj + v-proj + energy + apply
    mf = (P * C * DA + P * C * C + P * P * DA + P * P * C) * 2 * O
    print(f"O={O} P={P} C={C} da={DA} {np.dtype(DTYPE).name}")
    print(f"fwd      {t_f:7.3f} ms   {mf / t_f / 1e9:7.1f} TFLOP/s-equiv")
    print(f"fwd+bwd  {t_fb:7.3f} ms")


if __name__ == "__main__":
    main()
