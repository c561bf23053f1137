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


def _qk_scale(wqk, scale: bool):
    """SA's 1/sqrt(da) energy scaling folded into the q/k weight: scaling W
    by da^-0.25 scales E = (xW)(xW)ᵀ by 1/sqrt(da) exactly — a [C, da]
    multiply instead of a [P, P] VPU pass per tile."""
    if not scale:
        return wqk
    da = wqk.shape[-1]
    return wqk * jnp.asarray(float(da) ** -0.25, wqk.dtype)


def _project(x, wqk, wv, bv, scale: bool):
    """x: [T, P, C] -> q [T, P, da], v [T, P, C] (f32). The projections run on
    the merged [T*P, C] view (sublane merge — free relayout on TPU); Mosaic
    only supports single-contraction matmuls, so keeping T*P as one dim also
    keeps every gradient matmul legal."""
    acc = _acc_dtype(x.dtype)
    t, p, c = x.shape
    x2 = x.reshape(t * p, c)
    q = jax.lax.dot_general(x2, _qk_scale(wqk, scale), (((1,), (0,)), ((), ())),
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
    materialization / relayout on TPU).

    The 1/sqrt(da) energy scale is folded into q by the CALLER (q·da^-0.25
    scales E by 1/sqrt(da) exactly) — one less [P, P] VPU pass here; ``scale``
    only survives in the signature for the unfused fallback path."""
    del scale  # folded into q upstream
    acc = _acc_dtype(q.dtype)
    e = jax.lax.dot_general(q, q, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=acc)          # [T, P, P]
    # gt = Aᵀ: column-stable column-softmax (valid because e is symmetric).
    # exp/normalize run in the compute dtype (bf16 in production — matching
    # the unfused path's bf16 softmax) with f32 reductions. (Casting e itself
    # to bf16 first was measured SLOWER: the standalone cast is an extra
    # [P, P] pass that Mosaic doesn't fold into the matmul output.)
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
    q, v = _project(x, wqk, wv, bv, scale)
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
    q, v = _project(x, wqk_ref[:], wv_ref[:], bv_ref[:], scale)
    # autodiff only over the attention core: its transposes are batched
    # single-contraction matmuls Mosaic can lower (weight grads would be
    # double contractions — hand-written below on the merged [T*P, .] view)
    core = partial(_attn_core, scale=scale, double_norm=double_norm)
    _, vjp = jax.vjp(core, q, v)
    dq, dv = vjp(dy_ref[:].astype(f32))

    dq2 = dq.reshape(t * p, -1)
    dv2 = dv.reshape(t * p, c)
    x2 = x.reshape(t * p, c)
    # q = x · (wqk · s): d wqk = s · xᵀ dq_s; dx gets the scaled weight
    wqk_s = _qk_scale(wqk_ref[:], scale)
    s = (jnp.asarray(float(wqk_s.shape[-1]) ** -0.25, f32)
         if scale else jnp.asarray(1.0, f32))
    dwqk_ref[:] += s * jax.lax.dot_general(x2, dq2, (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32)
    dwv_ref[:] += jax.lax.dot_general(x2, dv2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dbv_ref[:] += dv2.sum(axis=0, keepdims=True)
    dx2 = (jax.lax.dot_general(dq2, wqk_s, (((1,), (1,)), ((), ())),
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
    # budgets must stay UNDER the 16 MB default scoped-vmem limit
    # (_compiler_params returns None on purpose: raising vmem_limit_bytes
    # measured ~15% slower — double-buffering depth is traded away). Measured
    # sweet spots stay small anyway: t=4 fwd / t=4 bwd at P=512 (~14.7 MB).
    budget = 15 * 2**20 if bwd else 12 * 2**20
    per = _vmem_per_object(p, c, da, itemsize, bwd)
    for t in (8, 4, 2, 1):
        if o % t == 0 and t * per <= budget:
            return t
    return None


def _unfused(x, wqk, wv, bv, scale, double_norm):
    return _attn_math(x, wqk, wv, bv, scale, double_norm, x.dtype)


def _weight_specs():
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3)]


def _compiler_params(interpret):
    # Measured: raising vmem_limit_bytes to 100 MB costs ~15% fwd time (the
    # compiler trades double-buffering depth for the bigger scoped window);
    # the chosen tiles fit the 16 MB default, so keep it.
    del interpret
    return None


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
        compiler_params=_compiler_params(interpret),
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
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, wqk, wv, bv[None], dy)
    return (dx, dwqk.astype(wqk.dtype), dwv.astype(wv.dtype),
            dbv[0].astype(bv.dtype))


pct_attention_fused.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Block-fused variant: attention + trans projection + masked BN partial sums
# in ONE kernel. The SA/OA block's XLA glue (trans matmul read/write of the
# full [O, P, C] activation + the BatchNorm stats pass) measured ~3 ms per
# block at O=1280 — fusing it leaves a single XLA pass per block
# (BN-apply + residual + relu from the folded affine).
#
# SA (pct.py:187-232):  t_out = trans(attn(x));   out = x + relu(BN(t_out))
# OA (pct.py:236-273):  t_out = trans(x - attn(x)); out = x + relu(BN(t_out))
# The kernel returns (t_out, ssum, ssumsq) where ssum/ssumsq are the masked
# BN partial sums of t_out (mask: [O, 1], 1.0 = valid object); the caller
# folds the moments (models/pct.py::MaskedBatchNorm(moments=...)) and applies
# affine+residual+relu in one elementwise pass.
# ---------------------------------------------------------------------------


def _mask_rows(m_ref, start: int, t: int, acc):
    """Build this tile's [T, 1] object-mask vector from SMEM scalars.

    The mask cannot ride in VMEM blocks: a [T, 1] block violates the (8, 128)
    block-shape rule for T < 8, and a dynamic sublane slice of a whole-array
    ref needs 8-aligned offsets. SMEM scalar reads have no such constraints;
    T <= 8 selects are negligible. The SMEM array is LANE-major [1, O]:
    each SMEM *row* pads to 512 bytes, so a [O, 1] layout blows the 1 MB
    SMEM cap at O >= 2048 (hit at B=128 pooled serving; measured)."""
    rowi = jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0)
    m2 = jnp.zeros((t, 1), acc)
    for j in range(t):
        m2 = jnp.where(rowi == j, m_ref[0, start + j].astype(acc), m2)
    return m2


def _block_math(x, wqk, wv, bv, wt, bt, scale, double_norm, oa):
    """Full block forward (t_out in the compute dtype)."""
    acc = _acc_dtype(x.dtype)
    t, p, c = x.shape
    y = _attn_math(x, wqk, wv, bv, scale, double_norm, x.dtype)
    u = (x - y) if oa else y
    t_out = (jax.lax.dot_general(u.reshape(t * p, c), wt,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=acc)
             + bt.astype(acc)).astype(x.dtype)
    return t_out.reshape(t, p, c)


def _block_fwd_kernel(x_ref, wqk_ref, wv_ref, bv_ref, wt_ref, bt_ref, m_ref,
                      y_ref, ssum_ref, ssumsq_ref, *, scale, double_norm, oa):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ssum_ref[:] = jnp.zeros_like(ssum_ref)
        ssumsq_ref[:] = jnp.zeros_like(ssumsq_ref)

    t_out = _block_math(x_ref[:], wqk_ref[:], wv_ref[:], bv_ref[:],
                        wt_ref[:], bt_ref[:], scale, double_norm, oa)
    y_ref[:] = t_out
    acc = ssum_ref.dtype
    t3 = t_out.astype(acc)
    tt = t_out.shape[0]
    m2 = _mask_rows(m_ref, i * tt, tt, acc)             # [T, 1]
    ssum_ref[:] += jnp.sum(jnp.sum(t3, axis=1, dtype=acc) * m2, axis=0)[None]
    ssumsq_ref[:] += jnp.sum(jnp.sum(jnp.square(t3), axis=1, dtype=acc) * m2,
                             axis=0)[None]


def _block_bwd_kernel(x_ref, wqk_ref, wv_ref, bv_ref, wt_ref, bt_ref, m_ref,
                      dt_ref, dsum_ref, dsumsq_ref,
                      dx_ref, dwqk_ref, dwv_ref, dbv_ref, dwt_ref, dbt_ref,
                      *, scale, double_norm, oa):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dwqk_ref, dwv_ref, dbv_ref, dwt_ref, dbt_ref):
            ref[:] = jnp.zeros_like(ref)

    x = x_ref[:]
    f32 = _acc_dtype(x.dtype)
    t, p, c = x.shape
    x2 = x.reshape(t * p, c)

    # recompute forward through the core (with vjp) and trans
    q, v = _project(x, wqk_ref[:], wv_ref[:], bv_ref[:], scale)
    core = partial(_attn_core, scale=scale, double_norm=double_norm)
    y, vjp = jax.vjp(core, q, v)
    y = y.astype(x.dtype)
    u = (x - y) if oa else y
    u2 = u.reshape(t * p, c)
    t_out = (jax.lax.dot_general(u2, wt_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
             + bt_ref[:].astype(f32)).astype(x.dtype)

    # dz = dt + mask·(dssum + 2 t_out dssumsq)   (BN batch-stat path)
    m2 = _mask_rows(m_ref, i * t, t, f32)                       # [T, 1]
    a1 = m2 * dsum_ref[:].astype(f32)                           # [T, C]
    a2 = m2 * dsumsq_ref[:].astype(f32)                         # [T, C]
    dz3 = (dt_ref[:].astype(f32) + a1[:, None, :]
           + 2.0 * t_out.reshape(t, p, c).astype(f32) * a2[:, None, :])
    dz = dz3.reshape(t * p, c).astype(x.dtype)

    # through trans
    dwt_ref[:] += jax.lax.dot_general(u2, dz, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dbt_ref[:] += dz.astype(f32).sum(axis=0, keepdims=True)
    du = jax.lax.dot_general(dz, wt_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dy = (-du if oa else du).reshape(t, p, c)

    # through the attention core + projections
    dq, dv = vjp(dy.astype(f32))
    dq2 = dq.reshape(t * p, -1)
    dv2 = dv.reshape(t * p, c)
    wqk_s = _qk_scale(wqk_ref[:], scale)
    s = (jnp.asarray(float(wqk_s.shape[-1]) ** -0.25, f32)
         if scale else jnp.asarray(1.0, f32))
    dwqk_ref[:] += s * jax.lax.dot_general(x2, dq2, (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32)
    dwv_ref[:] += jax.lax.dot_general(x2, dv2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dbv_ref[:] += dv2.sum(axis=0, keepdims=True)
    dx2 = (jax.lax.dot_general(dq2, wqk_s, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dv2, wv_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))
    if oa:  # u = x - y: dx gets +du directly
        dx2 = dx2 + du
    dx_ref[:] = dx2.reshape(t, p, c).astype(dx_ref.dtype)


def _block_unfused(x, wqk, wv, bv, wt, bt, mask, scale, double_norm, oa):
    acc = _acc_dtype(x.dtype)
    t_out = _block_math(x, wqk, wv, bv, wt, bt, scale, double_norm, oa)
    tm = t_out * mask[:, :, None].astype(t_out.dtype)
    return (t_out,
            jnp.sum(tm, axis=(0, 1), dtype=acc)[None],
            jnp.sum(jnp.square(tm), axis=(0, 1), dtype=acc)[None])


def _block_vmem_per_object(p, c, da, itemsize, bwd):
    per = _vmem_per_object(p, c, da, itemsize, bwd)
    # + t_out (and dz/du in bwd)
    return per + p * c * (itemsize * (3 if bwd else 1) + (4 if bwd else 0))


def _block_pick_tile(o, p, c, da, itemsize, bwd):
    import os
    override = os.environ.get("SGA_BLK_TBWD" if bwd else "SGA_BLK_TFWD")
    if override:
        t = int(override)
        return t if o % t == 0 else None
    budget = 9 * 2**20 if bwd else 10 * 2**20
    per = _block_vmem_per_object(p, c, da, itemsize, bwd)
    for t in (8, 4, 2, 1):
        if o % t == 0 and t * per <= budget:
            return t
    return None


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def pct_block_fused(x, wqk, wv, bv, wt, bt, mask,
                    scale=True, double_norm=False, interpret=False):
    """Fused SA/OA block compute: returns ``(t_out, ssum, ssumsq)``.

    x: [O, P, C]; wqk [C, da]; wv [C, C]; bv [C]; wt [C, C]; bt [C];
    mask [O, 1] (1.0 = valid object, in x's dtype). ``double_norm=True``
    selects the OA residual direction (trans applied to x - attn(x)) and
    re-normalization. The caller applies BN-fold + residual + relu.
    """
    o, p, c = x.shape
    t = _block_pick_tile(o, p, c, wqk.shape[1], x.dtype.itemsize, bwd=False)
    if t is None:
        return _block_unfused(x, wqk, wv, bv, wt, bt, mask,
                              scale, double_norm, oa=double_norm)
    acc = _acc_dtype(x.dtype)
    return pl.pallas_call(
        partial(_block_fwd_kernel, scale=scale, double_norm=double_norm,
                oa=double_norm),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)],
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c), x.dtype),
            jax.ShapeDtypeStruct((1, c), acc),
            jax.ShapeDtypeStruct((1, c), acc),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, wqk, wv, bv[None], wt, bt[None], mask.astype(jnp.float32).reshape(1, -1))


def _block_fwd_rule(x, wqk, wv, bv, wt, bt, mask, scale, double_norm,
                    interpret):
    outs = pct_block_fused(x, wqk, wv, bv, wt, bt, mask,
                           scale, double_norm, interpret)
    return outs, (x, wqk, wv, bv, wt, bt, mask)


def _block_bwd_rule(scale, double_norm, interpret, residuals, cts):
    x, wqk, wv, bv, wt, bt, mask = residuals
    dt_out, dsum, dsumsq = cts
    o, p, c = x.shape
    da = wqk.shape[1]
    f32 = _acc_dtype(x.dtype)
    t = _block_pick_tile(o, p, c, da, x.dtype.itemsize, bwd=True)
    if t is None:
        def ref_fn(x, wqk, wv, bv, wt, bt):
            outs = _block_unfused(x, wqk, wv, bv, wt, bt, mask,
                                  scale, double_norm, oa=double_norm)
            return sum((a.astype(f32) * b.astype(f32)).sum()
                       for a, b in zip(outs, cts))
        grads = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4, 5))(
            x, wqk, wv, bv, wt, bt)
        return (*grads, jnp.zeros_like(mask))

    grads = pl.pallas_call(
        partial(_block_bwd_kernel, scale=scale, double_norm=double_norm,
                oa=double_norm),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)],
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, da), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c), x.dtype),
            jax.ShapeDtypeStruct((c, da), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, wqk, wv, bv[None], wt, bt[None], mask.astype(jnp.float32).reshape(1, -1),
      dt_out, dsum, dsumsq)
    dx, dwqk, dwv, dbv, dwt, dbt = grads
    return (dx, dwqk.astype(wqk.dtype), dwv.astype(wv.dtype),
            dbv[0].astype(bv.dtype), dwt.astype(wt.dtype),
            dbt[0].astype(bt.dtype), jnp.zeros_like(mask))


pct_block_fused.defvjp(_block_fwd_rule, _block_bwd_rule)


# --------------------------------------------------------------------------
# Whole-block training op: block + batch-stat BN fold + relu/residual
# epilogue in ONE custom VJP. The plain composition (pct_block_fused + XLA
# epilogue) pays ~1 ms/block of separate backward passes: XLA lowers the
# epilogue backward to a dt materialization pass, a per-channel reduction
# pass, and a residual-add pass — all over [O, P, C] arrays. Here the
# backward is two kernels: a reduction pass for the fold gradients (which
# MUST complete before dx — BN backward is inherently two-pass), and the
# existing block backward extended to derive the epilogue routing in-VMEM
# from the recomputed t_out (dt never exists in HBM; the residual add rides
# the dx write).
# --------------------------------------------------------------------------


def _fold_from_sums(bn_scale, bn_bias, ssum, ssumsq, count, eps):
    """EXACT MaskedBatchNorm train-mode fold math (models/pct.py) from the
    kernel's masked sums: w = scale/sqrt(var+eps), b = bias - mean*w."""
    sdt = jnp.promote_types(bn_scale.dtype, jnp.float32)
    mean = ssum[0].astype(sdt) / count
    var = jnp.maximum(ssumsq[0].astype(sdt) / count - jnp.square(mean), 0.0)
    w = bn_scale.astype(sdt) / jnp.sqrt(var + eps)
    b = bn_bias.astype(sdt) - mean * w
    return w, b


def _epi_sums_kernel(t_ref, wbn_ref, bbn_ref, dy_ref, dw_ref, db_ref,
                     *, t: int, p: int):
    """Fold-gradient reductions: dwbn = Σ g·t_out, dbbn = Σ g with
    g = dy·1{t_out·w + b > 0} — one pass over (t_out, dy)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    c = t_ref.shape[-1]
    t2 = t_ref[:].reshape(t * p, c)
    acc = dw_ref.dtype
    normed = t2 * wbn_ref[:].astype(t2.dtype) + bbn_ref[:].astype(t2.dtype)
    # f32 compare: Mosaic rejects bf16 vector compares (cast is exact)
    g = jnp.where(normed.astype(acc) > 0,
                  dy_ref[:].reshape(t * p, c).astype(acc), 0.0)
    dw_ref[:] += jnp.sum(g * t2.astype(acc), axis=0)[None]
    db_ref[:] += jnp.sum(g, axis=0)[None]


def _pick_tile_epi(o: int, p: int, c: int, itemsize: int) -> int | None:
    per = p * c * (2 * itemsize + 8)
    for t in (16, 8, 4, 2, 1):
        if o % t == 0 and t * per <= 12 * 2**20:
            return t
    return None


def _block_res_bwd_kernel(x_ref, wqk_ref, wv_ref, bv_ref, wt_ref, bt_ref,
                          m_ref, dxn_ref, wbn_ref, bbn_ref,
                          dsum_ref, dsumsq_ref,
                          dx_ref, dwqk_ref, dwv_ref, dbv_ref, dwt_ref,
                          dbt_ref, *, scale, double_norm, oa):
    """_block_bwd_kernel with the epilogue backward derived in-VMEM: instead
    of a dt cotangent, takes the NEXT layer's dxn + the fold (wbn, bbn) and
    recomputes the relu routing from the recomputed t_out; the residual add
    rides the dx write."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (dwqk_ref, dwv_ref, dbv_ref, dwt_ref, dbt_ref):
            ref[:] = jnp.zeros_like(ref)

    x = x_ref[:]
    f32 = _acc_dtype(x.dtype)
    t, p, c = x.shape
    x2 = x.reshape(t * p, c)

    # recompute forward through the core (with vjp) and trans
    q, v = _project(x, wqk_ref[:], wv_ref[:], bv_ref[:], scale)
    core = partial(_attn_core, scale=scale, double_norm=double_norm)
    y, vjp = jax.vjp(core, q, v)
    y = y.astype(x.dtype)
    u = (x - y) if oa else y
    u2 = u.reshape(t * p, c)
    t_out = (jax.lax.dot_general(u2, wt_ref[:], (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
             + bt_ref[:].astype(f32)).astype(x.dtype)        # [T*P, C]

    # epilogue backward in-VMEM: dt = dxn·1{t_out·w+b > 0}·w
    dxn2 = dxn_ref[:].reshape(t * p, c)
    normed = t_out * wbn_ref[:].astype(x.dtype) + bbn_ref[:].astype(x.dtype)
    g = jnp.where(normed.astype(f32) > 0, dxn2.astype(f32), 0.0)
    dt3 = (g * wbn_ref[:].astype(f32)).reshape(t, p, c)

    # dz = dt + mask·(dssum + 2 t_out dssumsq)   (BN batch-stat path)
    m2 = _mask_rows(m_ref, i * t, t, f32)                       # [T, 1]
    a1 = m2 * dsum_ref[:].astype(f32)                           # [T, C]
    a2 = m2 * dsumsq_ref[:].astype(f32)                         # [T, C]
    dz3 = (dt3 + a1[:, None, :]
           + 2.0 * t_out.reshape(t, p, c).astype(f32) * a2[:, None, :])
    dz = dz3.reshape(t * p, c).astype(x.dtype)

    # through trans
    dwt_ref[:] += jax.lax.dot_general(u2, dz, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dbt_ref[:] += dz.astype(f32).sum(axis=0, keepdims=True)
    du = jax.lax.dot_general(dz, wt_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=f32)
    dy = (-du if oa else du).reshape(t, p, c)

    # through the attention core + projections
    dq, dv = vjp(dy.astype(f32))
    dq2 = dq.reshape(t * p, -1)
    dv2 = dv.reshape(t * p, c)
    wqk_s = _qk_scale(wqk_ref[:], scale)
    s = (jnp.asarray(float(wqk_s.shape[-1]) ** -0.25, f32)
         if scale else jnp.asarray(1.0, f32))
    dwqk_ref[:] += s * jax.lax.dot_general(x2, dq2, (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32)
    dwv_ref[:] += jax.lax.dot_general(x2, dv2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
    dbv_ref[:] += dv2.sum(axis=0, keepdims=True)
    dx2 = (jax.lax.dot_general(dq2, wqk_s, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32)
           + jax.lax.dot_general(dv2, wv_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32))
    if oa:  # u = x - y: dx gets +du directly
        dx2 = dx2 + du
    # residual: x_next = x + relu(...), so dx += dxn (absorbed into the write)
    dx_ref[:] = (dx2 + dxn2.astype(f32)).reshape(t, p, c).astype(dx_ref.dtype)


def _block_residual_ref(x, wqk, wv, bv, wt, bt, bn_scale, bn_bias, mask,
                        count, scale, double_norm, eps):
    """Unfused reference composition (fallback autodiff path)."""
    t_out, ssum, ssumsq = _block_unfused(x, wqk, wv, bv, wt, bt, mask,
                                         scale, double_norm, oa=double_norm)
    w, b = _fold_from_sums(bn_scale, bn_bias, ssum, ssumsq, count, eps)
    x_next = x + jax.nn.relu(t_out * w.astype(t_out.dtype)
                             + b.astype(t_out.dtype))
    return x_next, ssum, ssumsq


@partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def pct_block_residual(x, wqk, wv, bv, wt, bt, bn_scale, bn_bias, mask,
                       count, scale=True, double_norm=False, eps=1e-5,
                       interpret=False):
    """Training-mode SA/OA block INCLUDING the batch-stat BN fold and the
    relu + residual epilogue. Returns ``(x_next, ssum, ssumsq)`` — the caller
    derives moments from the sums for the running-stat update only.

    mask: [O, 1] (1.0 = valid, x dtype); count: f32 scalar = valid rows
    (mask.sum() * P) — must match MaskedBatchNorm's count so the fold is
    bit-identical to the unfused path.
    """
    t_out, ssum, ssumsq = pct_block_fused(x, wqk, wv, bv, wt, bt, mask,
                                          scale, double_norm, interpret)
    w, b = _fold_from_sums(bn_scale, bn_bias, ssum, ssumsq, count, eps)
    x_next = x + jax.nn.relu(t_out * w.astype(t_out.dtype)
                             + b.astype(t_out.dtype))
    return x_next, ssum, ssumsq


def _block_res_fwd_rule(x, wqk, wv, bv, wt, bt, bn_scale, bn_bias, mask,
                        count, scale, double_norm, eps, interpret):
    t_out, ssum, ssumsq = pct_block_fused(x, wqk, wv, bv, wt, bt, mask,
                                          scale, double_norm, interpret)
    w, b = _fold_from_sums(bn_scale, bn_bias, ssum, ssumsq, count, eps)
    x_next = x + jax.nn.relu(t_out * w.astype(t_out.dtype)
                             + b.astype(t_out.dtype))
    return (x_next, ssum, ssumsq), (x, wqk, wv, bv, wt, bt, bn_scale,
                                    bn_bias, mask, count, t_out, ssum, ssumsq)


def _block_res_bwd_rule(scale, double_norm, eps, interpret, residuals, cts):
    (x, wqk, wv, bv, wt, bt, bn_scale, bn_bias, mask, count,
     t_out, ssum, ssumsq) = residuals
    dxn, dsum_ct, dsumsq_ct = cts
    o, p, c = x.shape
    da = wqk.shape[1]
    f32 = _acc_dtype(x.dtype)
    tb = _block_pick_tile(o, p, c, da, x.dtype.itemsize, bwd=True)
    te = _pick_tile_epi(o, p, c, x.dtype.itemsize)
    if tb is None or te is None or f32 != jnp.float32:
        # pure-jax fallback (also the f64 x64 parity path)
        def ref_fn(x, wqk, wv, bv, wt, bt, bn_scale, bn_bias):
            outs = _block_residual_ref(x, wqk, wv, bv, wt, bt, bn_scale,
                                       bn_bias, mask, count, scale,
                                       double_norm, eps)
            return sum((a.astype(f32) * b_.astype(f32)).sum()
                       for a, b_ in zip(outs, cts))
        grads = jax.grad(ref_fn, argnums=tuple(range(8)))(
            x, wqk, wv, bv, wt, bt, bn_scale, bn_bias)
        return (*grads, jnp.zeros_like(mask), jnp.zeros_like(count))

    fold = partial(_fold_from_sums, count=count, eps=eps)
    (wbn, bbn), fold_vjp = jax.vjp(
        lambda s_, b_, ss, sq: fold(s_, b_, ss, sq), bn_scale, bn_bias,
        ssum, ssumsq)
    wrow = wbn.astype(jnp.float32).reshape(1, c)
    brow = bbn.astype(jnp.float32).reshape(1, c)
    mrow = mask.astype(jnp.float32).reshape(1, -1)

    # pass A: fold-gradient reductions over (t_out, dxn)
    dwbn, dbbn = pl.pallas_call(
        partial(_epi_sums_kernel, t=te, p=p),
        grid=(o // te,),
        in_specs=[
            pl.BlockSpec((te, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((te, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(t_out, wrow, brow, dxn)
    d_scale, d_bias, dssum_f, dssumsq_f = fold_vjp(
        (dwbn[0].astype(wbn.dtype), dbbn[0].astype(bbn.dtype)))
    dsum_tot = (dssum_f.astype(jnp.float32)
                + dsum_ct.astype(jnp.float32))
    dsumsq_tot = (dssumsq_f.astype(jnp.float32)
                  + dsumsq_ct.astype(jnp.float32))

    # pass B: extended block backward
    grads = pl.pallas_call(
        partial(_block_res_bwd_kernel, scale=scale, double_norm=double_norm,
                oa=double_norm),
        grid=(o // tb,),
        in_specs=[
            pl.BlockSpec((tb, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(5)],
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tb, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, da), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((o, p, c), x.dtype),
            jax.ShapeDtypeStruct((c, da), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((1, c), f32),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, wqk, wv, bv[None], wt, bt[None], mrow, dxn, wrow, brow,
      dsum_tot, dsumsq_tot)
    dx, dwqk, dwv, dbv, dwt, dbt = grads
    return (dx, dwqk.astype(wqk.dtype), dwv.astype(wv.dtype),
            dbv[0].astype(bv.dtype), dwt.astype(wt.dtype),
            dbt[0].astype(bt.dtype), d_scale, d_bias,
            jnp.zeros_like(mask), jnp.zeros_like(count))


pct_block_residual.defvjp(_block_res_fwd_rule, _block_res_bwd_rule)


# --------------------------------------------------------------------------
# Inference-mode whole-block op: block + RUNNING-stat BN fold + relu/residual
# epilogue in ONE forward-only kernel. Unlike training (where the fold
# depends on batch statistics that only exist after every tile's sums
# complete — inherently two-pass), eval folds from running averages known
# up front, so the epilogue rides the kernel's output write: no t_out ever
# reaches HBM and no separate XLA epilogue pass runs. Serving profile
# motivation: ~4.8 ms of epilogue fusions in the B=64 eval step (PERF.md
# "Inference / serving — round 3").
# --------------------------------------------------------------------------


def _block_eval_kernel(x_ref, wqk_ref, wv_ref, bv_ref, wt_ref, bt_ref,
                       wbn_ref, bbn_ref, y_ref, *, scale, double_norm, oa):
    x = x_ref[:]
    acc = _acc_dtype(x.dtype)
    t_out = _block_math(x, wqk_ref[:], wv_ref[:], bv_ref[:],
                        wt_ref[:], bt_ref[:], scale, double_norm, oa)
    z = (t_out.astype(acc) * wbn_ref[:].astype(acc)
         + bbn_ref[:].astype(acc))
    y_ref[:] = (x.astype(acc) + jnp.maximum(z, 0.0)).astype(y_ref.dtype)


def _block_eval_ref(x, wqk, wv, bv, wt, bt, wbn, bbn, scale, double_norm):
    acc = _acc_dtype(x.dtype)
    t_out = _block_math(x, wqk, wv, bv, wt, bt, scale, double_norm,
                        oa=double_norm)
    z = t_out.astype(acc) * wbn.astype(acc) + bbn.astype(acc)
    return (x.astype(acc) + jnp.maximum(z, 0.0)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def pct_block_eval(x, wqk, wv, bv, wt, bt, wbn, bbn,
                   scale=True, double_norm=False, interpret=False):
    """Inference-mode SA/OA block: ``x + relu(t_out * wbn + bbn)`` in one
    kernel, where ``(wbn, bbn)`` is the BN affine folded from RUNNING stats
    (MaskedBatchNorm(return_fold=True) with train=False). The backward (a
    cold path — frozen-BN fine-tuning) differentiates the unfused reference
    composition."""
    o, p, c = x.shape
    t = _block_pick_tile(o, p, c, wqk.shape[1], x.dtype.itemsize, bwd=False)
    if t is None:
        return _block_eval_ref(x, wqk, wv, bv, wt, bt, wbn, bbn,
                               scale, double_norm)
    return pl.pallas_call(
        partial(_block_eval_kernel, scale=scale, double_norm=double_norm,
                oa=double_norm),
        grid=(o // t,),
        in_specs=[
            pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(7)],
        ],
        out_specs=pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((o, p, c), x.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x, wqk, wv, bv[None], wt, bt[None],
      wbn.astype(_acc_dtype(x.dtype)).reshape(1, c),
      bbn.astype(_acc_dtype(x.dtype)).reshape(1, c))


def _block_eval_fwd_rule(x, wqk, wv, bv, wt, bt, wbn, bbn,
                         scale, double_norm, interpret):
    out = pct_block_eval(x, wqk, wv, bv, wt, bt, wbn, bbn,
                         scale, double_norm, interpret)
    return out, (x, wqk, wv, bv, wt, bt, wbn, bbn)


def _block_eval_bwd_rule(scale, double_norm, interpret, residuals, dy):
    x, wqk, wv, bv, wt, bt, wbn, bbn = residuals
    _, vjp = jax.vjp(
        lambda *a: _block_eval_ref(*a, scale, double_norm),
        x, wqk, wv, bv, wt, bt, wbn, bbn)
    return vjp(dy)


pct_block_eval.defvjp(_block_eval_fwd_rule, _block_eval_bwd_rule)
