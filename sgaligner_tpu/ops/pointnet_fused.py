"""Fused Pallas PointNet encoder: conv1x1 -> relu (x3) -> max-pool, one kernel.

The PointNet stack over a batch's objects is the hot op of the training step:
three per-point matmuls over ~1M points whose [1M, 64/128/256]-wide activations
XLA materializes in HBM between layers (matmul->matmul chains don't fuse). This
kernel tiles whole objects into VMEM and runs the full stack there.

Layout notes (the perf-critical part; measured on v5e, PERF.md):
* Points are CHANNEL-FIRST: ``[O, 3, P]``. A points-last array pads its 3-wide
  minor dim to 128 lanes in HBM tiling — 43x storage/DMA bloat that dominated
  earlier versions. Channel-first keeps P in lanes (dense) with only the
  3->8 sublane pad (2.7x), and the first layer contracts the 3-dim via
  ``dot_general`` with no in-kernel relayout; the resulting [T, P, 64] merges
  its leading dims for the rest of the stack (sublane-merge, free).
* NO input gradient: object point clouds are data, never differentiated — the
  VJP returns a zero cotangent for x (callers stop_gradient the points), which
  removes the dgrad-to-input matmul and a 43x-padded [O, P, 3] write from the
  backward kernel.
* Weight grads accumulate in f32 across sequential grid steps (revisited VMEM
  blocks); relu masks are kept as bools to bound live VMEM.

Semantics match the parity-mode PointNetfeat (conv->relu x3, global max over
points; BN discarded — reference pointnet.py:140-163). The max-pool gradient
routes to the (first) argmax element like ``torch.max`` — exactly what the
reference trains with; jnp's even tie-split differs only on measure-zero ties.
The argmax is only computed on the VJP forward, not the inference call.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stack_from_cf(x, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, t, p,
                   keep_masks=False):
    """Channel-first [T, 3, P] -> pre-relu h3 [T*P, C3] (+ masks/h's if asked)."""
    f32 = jnp.float32
    dt = x.dtype
    a1 = jax.lax.dot_general(x, w1_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=f32)      # [T, P, 64]
    a1 = a1.reshape(t * p, -1) + b1_ref[:].astype(f32)
    m1 = a1 > 0.0
    h1 = jnp.maximum(a1, 0.0).astype(dt)
    del a1
    a2 = jnp.dot(h1, w2_ref[:], preferred_element_type=f32) \
        + b2_ref[:].astype(f32)
    m2 = a2 > 0.0
    h2 = jnp.maximum(a2, 0.0).astype(dt)
    del a2
    a3 = jnp.dot(h2, w3_ref[:], preferred_element_type=f32) \
        + b3_ref[:].astype(f32)
    if keep_masks:
        return a3, (m1, h1, m2, h2)
    return a3, None


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                out_ref, *refs, t: int, p: int, with_argmax: bool):
    a3, _ = _stack_from_cf(x_ref[:], w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                           b3_ref, t, p)
    h3 = jnp.maximum(a3, 0.0).reshape(t, p, -1)
    out_ref[:] = jnp.max(h3, axis=1)
    if with_argmax:  # only the training path needs the max-pool routing index
        refs[0][:] = jnp.argmax(h3, axis=1).astype(jnp.int32)


def _bwd_kernel(x_ref, dout_ref, amax_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                w3_ref, b3_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref,
                db3_ref, *, t: int, p: int):
    f32 = jnp.float32
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dw1_ref, db1_ref, dw2_ref, db2_ref, dw3_ref, db3_ref):
            ref[:] = jnp.zeros_like(ref)

    x = x_ref[:]                                           # [T, 3, P]
    dt = x.dtype
    a3, (m1, h1, m2, h2) = _stack_from_cf(x, w1_ref, b1_ref, w2_ref, b2_ref,
                                          w3_ref, b3_ref, t, p,
                                          keep_masks=True)
    m3 = a3 > 0.0
    c3 = a3.shape[-1]

    # gradient routes to the argmax point of each (object, channel)
    pt_idx = jax.lax.broadcasted_iota(jnp.int32, (t, p, c3), 1)
    picked = pt_idx == amax_ref[:][:, None, :]
    dout = dout_ref[:].astype(f32)[:, None, :]
    g3 = jnp.where(picked, dout, 0.0).reshape(t * p, c3)
    g3 = jnp.where(m3, g3, 0.0).astype(dt)

    def dg(g, w_ref):  # g @ w.T without materializing the transpose
        return jax.lax.dot_general(g, w_ref[:], (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    def wg(h, g):      # h.T @ g likewise
        return jax.lax.dot_general(h, g, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    g2 = jnp.where(m2, dg(g3, w3_ref), 0.0).astype(dt)
    g1 = jnp.where(m1, dg(g2, w2_ref), 0.0).astype(dt)
    # no dx: points are data (callers stop_gradient them)

    dw3_ref[:] += wg(h2, g3)
    db3_ref[:] += g3.astype(f32).sum(axis=0, keepdims=True)
    dw2_ref[:] += wg(h1, g2)
    db2_ref[:] += g2.astype(f32).sum(axis=0, keepdims=True)
    # dw1[c, d] = sum_t X[t] @ g1[t]: batched matmul + batch-sum (Mosaic has
    # no double-contraction matmul)
    g1t = g1.reshape(t, p, -1)
    per_t = jax.lax.dot_general(x, g1t, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=f32)   # [T, 3, C1]
    dw1_ref[:] += per_t.sum(axis=0)
    db1_ref[:] += g1.astype(f32).sum(axis=0, keepdims=True)


def _pick_tile(o: int, p: int, itemsize: int, bwd: bool) -> int | None:
    """Objects per grid step. Caps are MEASURED compile/perf limits on v5e at
    P=512 channel-first (tile sweep in PERF.md): bf16 fwd peaks at 64x512 rows
    (128x512 regresses, larger bwd tiles OOM VMEM); f32 bwd exceeds VMEM at
    the minimum legal tile -> unfused fallback. The [T, C3] output block needs
    T % 8 == 0 (or T == O)."""
    if bwd:
        max_rows = 4096 if itemsize <= 2 else 0
    else:
        max_rows = 32768 if itemsize <= 2 else 8192
    for t in (64, 32, 16, 8):
        if o % t == 0 and t * p <= max_rows:
            return t
    if o <= 8 and o * p <= max_rows:
        return o
    return None


def _unfused(x, w1, b1, w2, b2, w3, b3):
    """XLA fallback; x channel-first [O, 3, P]."""
    xp = jnp.swapaxes(x, 1, 2)
    h = jnp.maximum(xp @ w1 + b1[0], 0.0)
    h = jnp.maximum(h @ w2 + b2[0], 0.0)
    h = jnp.maximum(h @ w3 + b3[0], 0.0)
    return h.max(axis=1)


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(6)]


def _forward(x, w1, b1, w2, b2, w3, b3, interpret, with_argmax=True):
    o, _, p = x.shape
    c3 = w3.shape[1]
    t = _pick_tile(o, p, x.dtype.itemsize, bwd=False)
    if t is None:
        return _unfused(x, w1, b1, w2, b2, w3, b3), None
    n_out = 2 if with_argmax else 1
    outs = pl.pallas_call(
        partial(_fwd_kernel, t=t, p=p, with_argmax=with_argmax),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(),
        ],
        out_specs=[pl.BlockSpec((t, c3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=([jax.ShapeDtypeStruct((o, c3), jnp.float32)]
                   + ([jax.ShapeDtypeStruct((o, c3), jnp.int32)]
                      if with_argmax else [])),
        interpret=interpret,
    )(x, w1, b1, w2, b2, w3, b3)
    out = outs[0]
    amax = outs[1] if with_argmax else None
    return out.astype(x.dtype), amax


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def pointnet_fused(x, w1, b1, w2, b2, w3, b3, interpret=False):
    """x: [O, 3, P] channel-first; weights [Cin, Cout]; biases [1, Cout].
    Returns [O, C3].

    The cotangent for x is ZERO by design (points are data) — callers must
    stop_gradient the points (models/pointnet.py does).
    """
    return _forward(x, w1, b1, w2, b2, w3, b3, interpret, with_argmax=False)[0]


def _fwd_rule(x, w1, b1, w2, b2, w3, b3, interpret):
    out, amax = _forward(x, w1, b1, w2, b2, w3, b3, interpret, with_argmax=True)
    return out, (x, w1, b1, w2, b2, w3, b3, amax)


def _bwd_rule(interpret, residuals, dout):
    x, w1, b1, w2, b2, w3, b3, amax = residuals
    o, _, p = x.shape
    c1, c2, c3 = w1.shape[1], w2.shape[1], w3.shape[1]
    f32 = jnp.float32
    t = _pick_tile(o, p, x.dtype.itemsize, bwd=True)
    if t is None or amax is None:
        def ref_fn(*a):
            return (_unfused(*a) * dout).sum()
        grads = jax.grad(ref_fn, argnums=tuple(range(1, 7)))(x, w1, b1, w2, b2,
                                                             w3, b3)
        return (jnp.zeros_like(x), *grads)

    grads = pl.pallas_call(
        partial(_bwd_kernel, t=t, p=p),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, c3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_weight_specs(),
        ],
        out_specs=[
            # weight/bias grads: same block every step -> sequential accumulate
            pl.BlockSpec((3, c1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c2, c3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, c1), f32),
            jax.ShapeDtypeStruct((1, c1), f32),
            jax.ShapeDtypeStruct((c1, c2), f32),
            jax.ShapeDtypeStruct((1, c2), f32),
            jax.ShapeDtypeStruct((c2, c3), f32),
            jax.ShapeDtypeStruct((1, c3), f32),
        ],
        interpret=interpret,
    )(x, dout, amax, w1, b1, w2, b2, w3, b3)

    dw1, db1, dw2, db2, dw3, db3 = grads
    return (jnp.zeros_like(x), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dw3.astype(w3.dtype), db3.astype(b3.dtype))


pointnet_fused.defvjp(_fwd_rule, _bwd_rule)
