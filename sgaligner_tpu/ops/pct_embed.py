"""Fused Pallas PCT embedding: the two conv+BN+relu input layers.

The NaivePCT embedding (reference pct.py:101-125: 2 x Conv1d(no bias) -> BN ->
ReLU) costs ~3.5 ms/step in XLA at B=32 pooled (profile in PERF.md): the
[O, P, 3] input is lane-padded 43x, and each BN needs a stats pass plus an
apply pass over the [O, P, 128] activations. Two kernels replace it:

* ``embed_first_fused(pts_cf, w0, mask)``: CHANNEL-FIRST [O, 3, P] input (the
  batch contract's native layout — the padded [O, P, 3] array never exists),
  one matmul contracting the 3-dim, outputs the raw pre-BN activation
  ``h0 [O, P, C]`` + masked BN partial sums.
* ``embed_second_fused(h0, wf0, bf0, w1, mask)``: applies the FOLDED BN affine
  + relu of layer 0 in its prologue (moments are reduced by the caller from
  the partial sums — models/pct.py::MaskedBatchNorm(moments=...)), then the
  second matmul, again emitting raw ``h1`` + partial sums. The caller applies
  fold1 + relu in one XLA pass feeding the SA stack.

Both carry custom VJPs in the house style (recompute per tile, f32 weight-grad
accumulators across the sequential grid, SMEM scalar object-mask). Points are
data: ``embed_first_fused`` returns a zero cotangent for them.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sgaligner_tpu.ops.pct_attention import _acc_dtype, _mask_rows


def _stats(h3, m2, acc):
    """Masked per-channel partial sums of [T, P, C] (mask [T, 1] in acc)."""
    zsum = jnp.sum(h3, axis=1, dtype=acc)
    zsq = jnp.sum(jnp.square(h3.astype(acc)), axis=1, dtype=acc)
    return (jnp.sum(zsum * m2, axis=0)[None],
            jnp.sum(zsq * m2, axis=0)[None])


# --------------------------- first layer ----------------------------------


def _e1_fwd_kernel(x_ref, w_ref, m_ref, h_ref, s1_ref, s2_ref, *, t, p):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    acc = s1_ref.dtype
    x = x_ref[:]                                      # [T, 3, P]
    h = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=acc)   # [T, P, C]
    h = h.astype(h_ref.dtype)
    h_ref[:] = h
    m2 = _mask_rows(m_ref, i * t, t, acc)
    s1, s2 = _stats(h, m2, acc)
    s1_ref[:] += s1
    s2_ref[:] += s2


def _e1_bwd_kernel(x_ref, w_ref, m_ref, dh_ref, ds1_ref, ds2_ref,
                   dw_ref, *, t, p):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    x = x_ref[:]
    acc = _acc_dtype(x.dtype)
    h = jax.lax.dot_general(x, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=acc).astype(x.dtype)
    m2 = _mask_rows(m_ref, i * t, t, acc)
    a1 = m2 * ds1_ref[:].astype(acc)
    a2 = m2 * ds2_ref[:].astype(acc)
    dz = (dh_ref[:].astype(acc) + a1[:, None, :]
          + 2.0 * h.astype(acc) * a2[:, None, :]).astype(x.dtype)
    # dw[3, C] = sum_t X[t] @ dz[t] (batched matmul + batch-sum)
    per_t = jax.lax.dot_general(x, dz, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=acc)   # [T, 3, C]
    dw_ref[:] += per_t.sum(axis=0)
    # no dx: points are data


def _e1_unfused(x_cf, w, mask):
    acc = _acc_dtype(x_cf.dtype)
    h = jnp.einsum("ocp,cd->opd", x_cf, w).astype(x_cf.dtype)
    hm = h * mask[:, :, None].astype(h.dtype)
    return (h, jnp.sum(hm, axis=(0, 1), dtype=acc)[None],
            jnp.sum(jnp.square(hm.astype(acc)), axis=(0, 1))[None])


def _pick_tile_e(o, p, c, itemsize, bwd):
    import os
    override = os.environ.get("SGA_EMB_TBWD" if bwd else "SGA_EMB_TFWD")
    if override:
        tt = int(override)
        return tt if o % tt == 0 else None
    # measured live sets (e2, bf16): fwd ~14 B/elem (h0, x0, pre/h f32, out),
    # bwd ~17 B/elem (+ dh, dz, dx0/g0 f32) — t=16 bwd hit 16.9 MB scoped
    per = p * c * (17 if bwd else 14) * max(itemsize // 2, 1)
    budget = 10 * 2**20
    for t in (16, 8, 4, 2, 1):
        if o % t == 0 and t * per <= budget:
            return t
    return None


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def embed_first_fused(x_cf, w, mask, interpret=False):
    """x_cf: [O, 3, P]; w: [3, C]; mask: [O, 1] (1.0 = valid).
    Returns (h0 [O, P, C] pre-BN, ssum [1, C], ssumsq [1, C])."""
    o, _, p = x_cf.shape
    c = w.shape[1]
    acc = _acc_dtype(x_cf.dtype)
    t = _pick_tile_e(o, p, c, x_cf.dtype.itemsize, bwd=False)
    if t is None:
        return _e1_unfused(x_cf, w, mask)
    return pl.pallas_call(
        partial(_e1_fwd_kernel, t=t, p=p),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c), x_cf.dtype),
            jax.ShapeDtypeStruct((1, c), acc),
            jax.ShapeDtypeStruct((1, c), acc),
        ],
        interpret=interpret,
    )(x_cf, w, mask.astype(jnp.float32).reshape(1, -1))


def _e1_fwd_rule(x_cf, w, mask, interpret):
    outs = embed_first_fused(x_cf, w, mask, interpret)
    return outs, (x_cf, w, mask)


def _e1_bwd_rule(interpret, residuals, cts):
    x_cf, w, mask = residuals
    dh, ds1, ds2 = cts
    o, _, p = x_cf.shape
    c = w.shape[1]
    acc = _acc_dtype(x_cf.dtype)
    t = _pick_tile_e(o, p, c, x_cf.dtype.itemsize, bwd=True)
    if t is None:
        def ref_fn(w):
            outs = _e1_unfused(x_cf, w, mask)
            return sum((a.astype(acc) * b.astype(acc)).sum()
                       for a, b in zip(outs, cts))
        dw = jax.grad(ref_fn)(w)
        return jnp.zeros_like(x_cf), dw, jnp.zeros_like(mask)

    dw = pl.pallas_call(
        partial(_e1_bwd_kernel, t=t, p=p),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, 3, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, c), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, c), acc),
        interpret=interpret,
    )(x_cf, w, mask.astype(jnp.float32).reshape(1, -1), dh, ds1, ds2)
    return jnp.zeros_like(x_cf), dw.astype(w.dtype), jnp.zeros_like(mask)


embed_first_fused.defvjp(_e1_fwd_rule, _e1_bwd_rule)


# --------------------------- second layer ----------------------------------


def _e2_fwd_kernel(h0_ref, wf_ref, bf_ref, w_ref, m_ref,
                   h_ref, s1_ref, s2_ref, *, t, p):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    acc = s1_ref.dtype
    h0 = h0_ref[:]
    tt, pp, c = h0.shape
    # fold0 + relu at f32: Mosaic rejects bf16 compares/max-vs-scalar
    pre = (h0.astype(acc) * wf_ref[:].astype(acc) + bf_ref[:].astype(acc))
    x0 = jnp.maximum(pre, 0.0).astype(h0.dtype)
    h = jax.lax.dot_general(x0.reshape(tt * pp, c), w_ref[:],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=acc)
    h = h.reshape(tt, pp, -1).astype(h_ref.dtype)
    h_ref[:] = h
    m2 = _mask_rows(m_ref, i * t, t, acc)
    s1, s2 = _stats(h, m2, acc)
    s1_ref[:] += s1
    s2_ref[:] += s2


def _e2_bwd_kernel(h0_ref, wf_ref, bf_ref, w_ref, m_ref,
                   dh_ref, ds1_ref, ds2_ref,
                   dh0_ref, dwf_ref, dbf_ref, dw_ref, *, t, p):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dwf_ref, dbf_ref, dw_ref):
            ref[:] = jnp.zeros_like(ref)

    h0 = h0_ref[:]
    acc = _acc_dtype(h0.dtype)
    tt, pp, c = h0.shape
    pre = (h0.astype(acc) * wf_ref[:].astype(acc) + bf_ref[:].astype(acc))
    x0 = jnp.maximum(pre, 0.0).astype(h0.dtype)
    x02 = x0.reshape(tt * pp, c)
    h = jax.lax.dot_general(x02, w_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=acc)
    h3 = h.reshape(tt, pp, -1).astype(h0.dtype)

    m2 = _mask_rows(m_ref, i * t, t, acc)
    a1 = m2 * ds1_ref[:].astype(acc)
    a2 = m2 * ds2_ref[:].astype(acc)
    dz = (dh_ref[:].astype(acc) + a1[:, None, :]
          + 2.0 * h3.astype(acc) * a2[:, None, :]).astype(h0.dtype)
    dz2 = dz.reshape(tt * pp, -1)

    dw_ref[:] += jax.lax.dot_general(x02, dz2, (((0,), (0,)), ((), ())),
                                     preferred_element_type=acc)
    dx0 = jax.lax.dot_general(dz2, w_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=acc).reshape(tt, pp, c)
    g0 = jnp.where(pre > 0.0, dx0, 0.0)                    # relu'
    dh0_ref[:] = (g0 * wf_ref[:].astype(acc)).astype(dh0_ref.dtype)
    dwf_ref[:] += jnp.sum(g0 * h0.astype(acc), axis=(0, 1))[None]
    dbf_ref[:] += jnp.sum(g0, axis=(0, 1))[None]


def _e2_unfused(h0, wf, bf, w, mask):
    acc = _acc_dtype(h0.dtype)
    x0 = jnp.maximum(h0 * wf + bf, 0.0)
    h = jnp.einsum("opc,cd->opd", x0, w).astype(h0.dtype)
    hm = h * mask[:, :, None].astype(h.dtype)
    return (h, jnp.sum(hm, axis=(0, 1), dtype=acc)[None],
            jnp.sum(jnp.square(hm.astype(acc)), axis=(0, 1))[None])


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def embed_second_fused(h0, wf, bf, w, mask, interpret=False):
    """h0: [O, P, C] raw layer-0 output; wf/bf: [1, C] folded BN affine (in
    h0's dtype); w: [C, C2]; mask: [O, 1]. Returns (h1, ssum, ssumsq)."""
    o, p, c = h0.shape
    c2 = w.shape[1]
    acc = _acc_dtype(h0.dtype)
    t = _pick_tile_e(o, p, max(c, c2), h0.dtype.itemsize, bwd=False)
    if t is None:
        return _e2_unfused(h0, wf, bf, w, mask)
    return pl.pallas_call(
        partial(_e2_fwd_kernel, t=t, p=p),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, p, c2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c2), h0.dtype),
            jax.ShapeDtypeStruct((1, c2), acc),
            jax.ShapeDtypeStruct((1, c2), acc),
        ],
        interpret=interpret,
    )(h0, wf, bf, w, mask.astype(jnp.float32).reshape(1, -1))


def _e2_fwd_rule(h0, wf, bf, w, mask, interpret):
    outs = embed_second_fused(h0, wf, bf, w, mask, interpret)
    return outs, (h0, wf, bf, w, mask)


def _e2_bwd_rule(interpret, residuals, cts):
    h0, wf, bf, w, mask = residuals
    dh, ds1, ds2 = cts
    o, p, c = h0.shape
    c2 = w.shape[1]
    acc = _acc_dtype(h0.dtype)
    t = _pick_tile_e(o, p, max(c, c2), h0.dtype.itemsize, bwd=True)
    if t is None:
        def ref_fn(h0, wf, bf, w):
            outs = _e2_unfused(h0, wf, bf, w, mask)
            return sum((a.astype(acc) * b.astype(acc)).sum()
                       for a, b in zip(outs, cts))
        grads = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(h0, wf, bf, w)
        return (*grads, jnp.zeros_like(mask))

    grads = pl.pallas_call(
        partial(_e2_bwd_kernel, t=t, p=p),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)],
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((t, p, c2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c), h0.dtype),
            jax.ShapeDtypeStruct((1, c), acc),
            jax.ShapeDtypeStruct((1, c), acc),
            jax.ShapeDtypeStruct((c, c2), acc),
        ],
        interpret=interpret,
    )(h0, wf, bf, w, mask.astype(jnp.float32).reshape(1, -1), dh, ds1, ds2)
    dh0, dwf, dbf, dw = grads
    return (dh0, dwf.astype(wf.dtype), dbf.astype(bf.dtype),
            dw.astype(w.dtype), jnp.zeros_like(mask))


embed_second_fused.defvjp(_e2_fwd_rule, _e2_bwd_rule)
