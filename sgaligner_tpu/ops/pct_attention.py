"""Fused Pallas PCT self-attention (the NaivePCT/SPCT hot op).

XLA cannot fuse matmul -> softmax -> matmul chains: the unfused PCT stack
materializes four ``[O, P, P]`` attention maps per step in HBM, forward AND
backward (268 MB each at O=512, P=512, bf16) — the released-config (PCT)
model was HBM-bound at 179 pairs/s (PERF.md). This kernel keeps the energy /
attention matrices entirely in VMEM per object block; HBM only sees ``x``,
``y`` and the tiny projection weights.

Reference semantics (/root/reference/src/aligner/networks/pct.py:187-232 SA,
:236-273 OA), quirks preserved exactly:

* ``q_conv.weight = k_conv.weight`` over the SAME input means q == k — the
  energy matrix is ``q qᵀ`` (symmetric), computed with ONE projection.
* softmax over the last energy axis; OA re-normalizes over the *row* axis
  (``attention / (1e-9 + attention.sum(dim=1))``) afterwards.
* the reference applies attention transposed — ``bmm(x_v, attention)`` means
  ``y[j] = Σ_i A[i, j] v[i]`` (columns, not rows).

The custom VJP recomputes the forward in-VMEM in the backward kernel (no
[O, P, P] residuals in HBM) and accumulates weight grads in f32 across the
sequential TPU grid, like ops/pointnet_fused.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _acc_dtype(dtype):
    """Accumulation dtype: f32 for bf16/f32 compute, f64 under x64 parity."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def _project(x, wqk, wv, bv):
    """x: [T, P, C] -> q [T, P, da], v [T, P, C] (f32). The projections run on
    the merged [T*P, C] view (sublane merge — free relayout on TPU); Mosaic
    only supports single-contraction matmuls, so keeping T*P as one dim also
    keeps every gradient matmul legal."""
    acc = _acc_dtype(x.dtype)
    t, p, c = x.shape
    x2 = x.reshape(t * p, c)
    q = jax.lax.dot_general(x2, wqk, (((1,), (0,)), ((), ())),
                            preferred_element_type=acc).astype(x.dtype)
    v = (jax.lax.dot_general(x2, wv, (((1,), (0,)), ((), ())),
                             preferred_element_type=acc)
         + bv.astype(acc)).astype(x.dtype)
    return q.reshape(t, p, -1), v.reshape(t, p, c)


def _attn_core(q, v, scale: bool, double_norm: bool):
    """(q, v) -> y, f32 accumulation. q doubles as k (shared projection of the
    same input), so the energy matrix E = q qᵀ is SYMMETRIC — which lets the
    transposed apply ``y[j] = Σ_i A[i, j] v[i]`` become a PLAIN matmul: the
    row-softmax transposed, Aᵀ[j, i] = exp(E[j, i] − m_i)/Z_i, is just the
    COLUMN-softmax of E (column-broadcast normalizers — no [P, P] transpose
    materialization / relayout on TPU)."""
    acc = _acc_dtype(q.dtype)
    e = jax.lax.dot_general(q, q, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=acc)          # [T, P, P]
    if scale:
        e = e / jnp.sqrt(acc(q.shape[-1]))
    # gt = Aᵀ: column-stable column-softmax (valid because e is symmetric).
    # exp/normalize run in the compute dtype (bf16 in production — matching
    # the unfused path's bf16 softmax) with f32 reductions: exp dominates the
    # kernel's VPU time and is 2x cheaper in bf16.
    m = jax.lax.stop_gradient(e.max(axis=1, keepdims=True))      # [T, 1, P]
    g = jnp.exp((e - m).astype(v.dtype))
    z = jnp.sum(g, axis=1, keepdims=True, dtype=acc)             # [T, 1, P]
    gt = g * (1.0 / z).astype(v.dtype)                           # [T, P, P]
    if double_norm:  # OA's "here" re-normalization (pct.py:265):
        # attention/(1e-9 + Σ_rows) on A ≡ dividing Aᵀ's ROWS by the same sums
        s = 1e-9 + jnp.sum(gt, axis=2, keepdims=True, dtype=acc)
        gt = gt * (1.0 / s).astype(v.dtype)
    return jax.lax.dot_general(gt, v, (((2,), (1,)), ((0,), (0,))),
                               preferred_element_type=acc)       # [T, P, C]


def _attn_math(x, wqk, wv, bv, scale: bool, double_norm: bool, out_dtype):
    q, v = _project(x, wqk, wv, bv)
    return _attn_core(q, v, scale, double_norm).astype(out_dtype)


def _fwd_kernel(x_ref, wqk_ref, wv_ref, bv_ref, y_ref, *, scale, double_norm):
    y_ref[:] = _attn_math(x_ref[:], wqk_ref[:], wv_ref[:], bv_ref[:],
                          scale, double_norm, y_ref.dtype)


def _bwd_kernel(x_ref, wqk_ref, wv_ref, bv_ref, dy_ref,
                dx_ref, dwqk_ref, dwv_ref, dbv_ref, *, scale, double_norm):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dwqk_ref, dwv_ref, dbv_ref):
            ref[:] = jnp.zeros_like(ref)

    x = x_ref[:]
    f32 = _acc_dtype(x.dtype)
    t, p, c = x.shape
    q, v = _project(x, wqk_ref[:], wv_ref[:], bv_ref[:])
    # autodiff only over the attention core: its transposes are batched
    # single-contraction matmuls Mosaic can lower (weight grads would be
    # double contractions — hand-written below on the merged [T*P, .] view)
    core = partial(_attn_core, scale=scale, double_norm=double_norm)
    _, vjp = jax.vjp(core, q, v)
    dq, dv = vjp(dy_ref[:].astype(f32))

    dq2 = dq.reshape(t * p, -1)
    dv2 = dv.reshape(t * p, c)
    x2 = x.reshape(t * p, c)
    dwqk_ref[:] += jax.lax.dot_general(x2, dq2, (((0,), (0,)), ((), ())),
                                       preferred_element_type=f32)
    dwv_ref[:] += jax.lax.dot_general(x2, dv2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dbv_ref[:] += dv2.sum(axis=0, keepdims=True)
    dx2 = (jax.lax.dot_general(dq2, wqk_ref[:], (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dv2, wv_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))
    dx_ref[:] = dx2.reshape(t, p, c).astype(dx_ref.dtype)


def _vmem_per_object(p: int, c: int, da: int, itemsize: int, bwd: bool) -> int:
    """Rough live-set estimate in bytes (the f32 energy matrix dominates;
    exp/normalize products are compute-dtype)."""
    fwd = (2 * p * c * itemsize           # x in, y out
           + p * p * 4 + p * p * itemsize  # e (f32), gt
           + p * (c + da) * itemsize)      # v, q
    if not bwd:
        return fwd
    # recompute + cotangents: dgt (f32), a second gt-sized buffer, dx/dv/dq
    return (fwd + p * p * 4 + p * p * itemsize
            + p * (2 * c + da) * itemsize)


def _pick_tile(o: int, p: int, c: int, da: int, itemsize: int,
               bwd: bool) -> int | None:
    import os
    override = os.environ.get("SGA_ATTN_TBWD" if bwd else "SGA_ATTN_TFWD")
    if override:  # perf-tuning escape hatch (tile sweeps)
        t = int(override)
        return t if o % t == 0 else None
    budget = 9 * 2**20 if bwd else 10 * 2**20
    per = _vmem_per_object(p, c, da, itemsize, bwd)
    for t in (16, 8, 4, 2, 1):
        if o % t == 0 and t * per <= budget:
            return t
    return None


def _unfused(x, wqk, wv, bv, scale, double_norm):
    return _attn_math(x, wqk, wv, bv, scale, double_norm, x.dtype)


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def pct_attention_fused(x, wqk, wv, bv, scale=True, double_norm=False,
                        interpret=False):
    """Fused SA (scale=True) / OA (scale=False, double_norm=True) attention.

    x: [O, P, C]; wqk: [C, da] (shared q/k, no bias); wv: [C, C]; bv: [C].
    Returns the attended features [O, P, C] — the caller applies trans/BN/
    residual (cheap XLA elementwise + one matmul).
    """
    o, p, c = x.shape
    t = _pick_tile(o, p, c, wqk.shape[1], x.dtype.itemsize, bwd=False)
    if t is None:
        return _unfused(x, wqk, wv, bv, scale, double_norm)
    return pl.pallas_call(
        partial(_fwd_kernel, scale=scale, double_norm=double_norm),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(),
        ],
        out_specs=pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((o, p, c), x.dtype),
        interpret=interpret,
    )(x, wqk, wv, bv[None])


def _fwd_rule(x, wqk, wv, bv, scale, double_norm, interpret):
    out = pct_attention_fused(x, wqk, wv, bv, scale, double_norm, interpret)
    return out, (x, wqk, wv, bv)


def _bwd_rule(scale, double_norm, interpret, residuals, dy):
    x, wqk, wv, bv = residuals
    o, p, c = x.shape
    da = wqk.shape[1]
    f32 = _acc_dtype(x.dtype)
    t = _pick_tile(o, p, c, da, x.dtype.itemsize, bwd=True)
    if t is None:
        def ref_fn(x, wqk, wv, bv):
            return (_unfused(x, wqk, wv, bv, scale, double_norm)
                    .astype(f32) * dy.astype(f32)).sum()
        return jax.grad(ref_fn, argnums=(0, 1, 2, 3))(x, wqk, wv, bv)

    dx, dwqk, dwv, dbv = pl.pallas_call(
        partial(_bwd_kernel, scale=scale, double_norm=double_norm),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *_weight_specs(),
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # weight grads: same block every step -> sequential accumulate
            pl.BlockSpec((c, da), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c), x.dtype),
            jax.ShapeDtypeStruct((c, da), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        interpret=interpret,
    )(x, wqk, wv, bv[None], dy)
    return (dx, dwqk.astype(wqk.dtype), dwv.astype(wv.dtype),
            dbv[0].astype(bv.dtype))


pct_attention_fused.defvjp(_fwd_rule, _bwd_rule)
