"""Fused Pallas PCT tail: concat(4 feats) -> 1024-linear -> BN stats -> pool.

The NaivePCT tail (reference /root/reference/src/aligner/networks/pct.py:275-317:
``concat -> conv1024 -> BatchNorm -> LeakyReLU(0.2) -> max over points``) is
HBM-bound in XLA: the concat ([O, P, 512]) and the [O, P, 1024] pre-/post-BN
activations are materialized in HBM (~1.5 GB of traffic per step at B=32),
then re-read by the BN stats pass, the normalize pass, and the max-pool.

This kernel never materializes any of them. Per VMEM tile it computes
``z = Σ_i x_i @ w_i`` (the concat-matmul as 4 full-K matmuls), and emits only

* ``pmax, pmin``: per-object per-channel max/min of z over points, and
* ``ssum, ssumsq``: masked BN partial sums (f32, accumulated across the grid).

The caller reconstructs the exact reference semantics with the monotonicity
identity: BN-normalize is an affine map per channel and LeakyReLU is
increasing, so

    max_p leaky(w·z_p + b) = leaky(w·max_p z + b)   if w > 0
                           = leaky(w·min_p z + b)   if w < 0

(exact, not approximate — even under bf16 rounding, since rounded
multiplication by a fixed w preserves monotonicity). The [O, P, 1024]
activation therefore never exists anywhere; HBM sees the four [O, P, C]
inputs and tiny [O, 1024] outputs.

The custom VJP recomputes z per tile and routes the pool gradients to the
argmax/argmin rows (first-index, like torch.max), recomputed in the backward
kernel — keeping the forward free of arg-reductions; the BN batch-statistic
gradient path flows through the ``ssum``/``ssumsq`` cotangents
(dz += mask · (dssum + 2 z dssumsq)), which is exactly BN's full backward once
the caller's moment arithmetic is under autodiff.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def _flag(name: str, default: str = "0") -> bool:
    """Experiment toggles, read at trace time (PERF.md tail-bwd ledger):
    SGA_TAIL_G_BF16 — build the routing gradient g in bf16 (probes whether
    the current Mosaic still rejects the i1->(16,128) predicate relayout;
    re-measured 2026-08-19: still "Invalid relayout" at the whole-block
    shape);
    SGA_TAIL_FWD_IDX — compute argmax/argmin in the FORWARD (where they
    share the pooling scan with max/min) and save the indices for the
    backward. Default ON: measured +6 pairs/s on the flagship bench
    (776.3 -> 782.4, non-overlapping windows); set =0 to opt out.

    NOTE: read at TRACE time — each toggle is captured when the vjp is first
    traced, so flipping the env var mid-process has no effect on already-
    compiled programs; set flags before the first forward/backward call."""
    return os.environ.get(name, default) == "1"


def _acc_dtype(dtype):
    """f32 accumulation/outputs; f64 under x64 parity runs."""
    return jnp.float64 if dtype == jnp.float64 else jnp.float32


def _z_tile(xs, w_ref, t: int, p: int, c: int):
    """z = concat(xs) @ w as 4 single-contraction matmuls; [T*P, K] in the
    compute dtype (f32 MXU accumulation), matching the unfused Dense."""
    k = w_ref.shape[1]
    acc = _acc_dtype(xs[0].dtype)
    z = jnp.zeros((t * p, k), acc)
    for i, x in enumerate(xs):
        z += jax.lax.dot_general(x.reshape(t * p, c), w_ref[i * c:(i + 1) * c],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=acc)
    return z.astype(xs[0].dtype)


def _fwd_kernel(x1_ref, x2_ref, x3_ref, x4_ref, w_ref, m_ref,
                pmax_ref, pmin_ref, ssum_ref, ssumsq_ref,
                amax_ref=None, amin_ref=None, *, t: int, p: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ssum_ref[:] = jnp.zeros_like(ssum_ref)
        ssumsq_ref[:] = jnp.zeros_like(ssumsq_ref)

    c = x1_ref.shape[-1]
    acc = ssum_ref.dtype
    z = _z_tile([x1_ref[:], x2_ref[:], x3_ref[:], x4_ref[:]], w_ref, t, p, c)
    # Mosaic arg-reductions only support f32; the cast is exact from bf16
    z3 = z.reshape(t, p, -1).astype(acc)
    pmax_ref[:] = jnp.max(z3, axis=1).astype(pmax_ref.dtype)
    pmin_ref[:] = jnp.min(z3, axis=1).astype(pmin_ref.dtype)
    if amax_ref is not None:
        amax_ref[:] = jnp.argmax(z3, axis=1).astype(jnp.int32)
        amin_ref[:] = jnp.argmin(z3, axis=1).astype(jnp.int32)

    # Reduce over points FIRST, then mask-weight per object: a [T,1,1] mask
    # broadcast over [T,P,K] needs sublane+lane broadcast at once, which
    # Mosaic doesn't support; [T,1]x[T,K] is a lane-only broadcast.
    m2 = m_ref[:].astype(acc)                         # [T, 1]
    zsum = jnp.sum(z3, axis=1, dtype=acc)             # [T, K]
    zsq = jnp.sum(jnp.square(z3), axis=1, dtype=acc)  # [T, K]
    ssum_ref[:] += jnp.sum(zsum * m2, axis=0)[None]
    ssumsq_ref[:] += jnp.sum(zsq * m2, axis=0)[None]


def _bwd_kernel(x1_ref, x2_ref, x3_ref, x4_ref, w_ref, m_ref,
                dpmax_ref, dpmin_ref, dsum_ref, dsumsq_ref,
                dx1_ref, dx2_ref, dx3_ref, dx4_ref, dw_ref,
                *, t: int, p: int, g_bf16: bool = False):
    return _bwd_body(x1_ref, x2_ref, x3_ref, x4_ref, w_ref, m_ref,
                     dpmax_ref, dpmin_ref, dsum_ref, dsumsq_ref,
                     None, None, dx1_ref, dx2_ref, dx3_ref, dx4_ref, dw_ref,
                     t=t, p=p, g_bf16=g_bf16)


def _bwd_kernel_idx(x1_ref, x2_ref, x3_ref, x4_ref, w_ref, m_ref,
                    dpmax_ref, dpmin_ref, dsum_ref, dsumsq_ref,
                    amax_ref, amin_ref,
                    dx1_ref, dx2_ref, dx3_ref, dx4_ref, dw_ref,
                    *, t: int, p: int, g_bf16: bool = False):
    return _bwd_body(x1_ref, x2_ref, x3_ref, x4_ref, w_ref, m_ref,
                     dpmax_ref, dpmin_ref, dsum_ref, dsumsq_ref,
                     amax_ref, amin_ref,
                     dx1_ref, dx2_ref, dx3_ref, dx4_ref, dw_ref,
                     t=t, p=p, g_bf16=g_bf16)


def _bwd_body(x1_ref, x2_ref, x3_ref, x4_ref, w_ref, m_ref,
              dpmax_ref, dpmin_ref, dsum_ref, dsumsq_ref,
              amax_ref, amin_ref,
              dx1_ref, dx2_ref, dx3_ref, dx4_ref, dw_ref,
              *, t: int, p: int, g_bf16: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    c = x1_ref.shape[-1]
    xs = [x1_ref[:], x2_ref[:], x3_ref[:], x4_ref[:]]
    dt = xs[0].dtype
    z = _z_tile(xs, w_ref, t, p, c)                     # recompute, [T*P, K]
    k = z.shape[-1]
    z3 = z.reshape(t, p, k)

    # pool routing: first-index argmax/argmin rows (torch.max semantics) —
    # recomputed here from z (Mosaic arg-reductions need f32), or read from
    # the forward-saved indices under SGA_TAIL_FWD_IDX
    acc = _acc_dtype(dt)
    if amax_ref is not None:
        amax = amax_ref[:]
        amin = amin_ref[:]
    else:
        zf = z3.astype(jnp.float32) if acc == jnp.float32 else z3
        amax = jnp.argmax(zf, axis=1).astype(jnp.int32)     # [T, K]
        amin = jnp.argmin(zf, axis=1).astype(jnp.int32)
    pt = jax.lax.broadcasted_iota(jnp.int32, (t, p, k), 1)
    # NOTE: g must stay f32 — building it in bf16 halves the live set but the
    # i1 predicate of the iota-compare is (8,128)-tiled and Mosaic cannot
    # relayout it to bf16's packed (16,128) select ("Invalid relayout",
    # measured round 3; re-confirmed round 4 at the whole-block
    # [16,512,1024] shape — retestable via SGA_TAIL_G_BF16=1)
    gdt = dt if g_bf16 else acc
    g = jnp.where(pt == amax[:, None, :],
                  dpmax_ref[:].astype(gdt)[:, None, :], jnp.array(0, gdt))
    g += jnp.where(pt == amin[:, None, :],
                   dpmin_ref[:].astype(gdt)[:, None, :], jnp.array(0, gdt))
    g = g.astype(acc)
    # BN batch-stat path: dz = mask · (dssum + 2 z dssumsq). Fold the mask
    # into per-object [T, K] coefficients first (lane-only broadcasts);
    # [T, 1, K] -> [T, P, K] is then a sublane-only broadcast.
    m2 = m_ref[:].astype(acc)                                  # [T, 1]
    a1 = m2 * dsum_ref[:].astype(acc)                          # [T, K]
    a2 = m2 * dsumsq_ref[:].astype(acc)                        # [T, K]
    # (computing z·a2 in bf16 before the f32 add measured step-NEUTRAL —
    # Mosaic already keeps the f32 product out of the live-set peak; the f32
    # form is kept for one less rounding in the gradient)
    g += a1[:, None, :] + 2.0 * z3.astype(acc) * a2[:, None, :]
    g2 = g.reshape(t * p, k).astype(dt)

    for j, (x, dx_ref) in enumerate(zip(xs, (dx1_ref, dx2_ref,
                                             dx3_ref, dx4_ref))):
        wj = w_ref[j * c:(j + 1) * c]
        dx_ref[:] = jax.lax.dot_general(
            g2, wj, (((1,), (1,)), ((), ())),
            preferred_element_type=acc).reshape(t, p, c).astype(dx_ref.dtype)
        dw_ref[j * c:(j + 1) * c] += jax.lax.dot_general(
            x.reshape(t * p, c), g2, (((0,), (0,)), ((), ())),
            preferred_element_type=acc)


def _unfused(xs, w, mask):
    """XLA fallback with identical outputs."""
    acc = _acc_dtype(xs[0].dtype)
    z = jnp.concatenate(xs, axis=-1) @ w                # [O, P, K]
    m = mask[:, :, None].astype(z.dtype)
    zm = z * m
    return (jnp.max(z, axis=1).astype(acc), jnp.min(z, axis=1).astype(acc),
            jnp.sum(zm, axis=(0, 1), dtype=acc)[None],
            jnp.sum(jnp.square(zm), axis=(0, 1), dtype=acc)[None])


def _pick_tile(o: int, p: int, k: int, itemsize: int, bwd: bool) -> int | None:
    import os
    override = os.environ.get("SGA_TAIL_TBWD" if bwd else "SGA_TAIL_TFWD")
    if override:
        tt = int(override)
        return tt if o % tt == 0 else None
    # live set ≈ 4 inputs + z (+ f32 g and dx's in bwd); [T, K] outputs need
    # T % 8 == 0 (sublane) unless T == O
    per = p * (4 * 128 * itemsize + k * itemsize)
    # two int32 [T, K] argmax/argmin blocks (SGA_TAIL_FWD_IDX default-on):
    # fwd outputs / bwd inputs
    per += 2 * k * 4
    if bwd:
        per += p * k * (4 + itemsize) + 4 * p * 128 * itemsize
    # bwd t=16 measured ~5% faster than t=8 at O=896 despite the bigger live
    # set (the 100 MB vmem raise covers it)
    budget = (90 if bwd else 24) * 2**20
    for t in (16, 8):
        if o % t == 0 and t * per <= budget:
            return t
    if o <= 8:
        return o
    return None


def _compiler_params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _forward(x1, x2, x3, x4, w, mask, interpret, save_idx=False):
    o, p, c = x1.shape
    k = w.shape[1]
    acc = _acc_dtype(x1.dtype)
    t = _pick_tile(o, p, k, x1.dtype.itemsize, bwd=False)
    if t is None:
        return _unfused([x1, x2, x3, x4], w, mask), False
    idx_specs, idx_shapes = [], []
    if save_idx:
        idx_specs = [pl.BlockSpec((t, k), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * 2
        idx_shapes = [jax.ShapeDtypeStruct((o, k), jnp.int32)] * 2
    outs = pl.pallas_call(
        partial(_fwd_kernel, t=t, p=p),
        grid=(o // t,),
        in_specs=[pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((t, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, k), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * 2 + idx_specs,
        out_shape=[jax.ShapeDtypeStruct((o, k), acc)] * 2
        + [jax.ShapeDtypeStruct((1, k), acc)] * 2 + idx_shapes,
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x1, x2, x3, x4, w, mask)
    return tuple(outs), True


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def pct_tail_fused(x1, x2, x3, x4, w, mask, interpret=False):
    """x_i: [O, P, C] SA-block outputs; w: [4C, K] (no bias); mask: [O, 1]
    (1.0 = valid object, dtype of x). Returns
    ``(pmax [O,K] f32, pmin [O,K] f32, ssum [1,K] f32, ssumsq [1,K] f32)``
    where ssum/ssumsq sum masked rows of z = concat(x) @ w over all O·P rows.
    """
    return _forward(x1, x2, x3, x4, w, mask, interpret)[0]


def _fwd_rule(x1, x2, x3, x4, w, mask, interpret):
    save_idx = _flag("SGA_TAIL_FWD_IDX", default="1")
    outs, kernel_ok = _forward(x1, x2, x3, x4, w, mask, interpret,
                               save_idx=save_idx)
    idx = outs[4:6] if (save_idx and kernel_ok) else None
    return outs[:4], (x1, x2, x3, x4, w, mask, kernel_ok, idx)


def _bwd_rule(interpret, residuals, cts):
    x1, x2, x3, x4, w, mask, kernel_ok, idx = residuals
    dpmax, dpmin, dsum, dsumsq = cts
    o, p, c = x1.shape
    k = w.shape[1]
    t = _pick_tile(o, p, k, x1.dtype.itemsize, bwd=True)
    if t is None or not kernel_ok:
        acc = _acc_dtype(x1.dtype)

        def ref_fn(x1, x2, x3, x4, w):
            outs = _unfused([x1, x2, x3, x4], w, mask)
            return sum((a.astype(acc) * b.astype(acc)).sum()
                       for a, b in zip(outs, cts))
        grads = jax.grad(ref_fn, argnums=(0, 1, 2, 3, 4))(x1, x2, x3, x4, w)
        return (*grads, jnp.zeros_like(mask))

    kern = _bwd_kernel_idx if idx is not None else _bwd_kernel
    idx_args = list(idx) if idx is not None else []
    idx_specs = ([pl.BlockSpec((t, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2
                 if idx is not None else [])
    grads = pl.pallas_call(
        partial(kern, t=t, p=p, g_bf16=_flag("SGA_TAIL_G_BF16")),
        grid=(o // t,),
        in_specs=[pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.VMEM),
           pl.BlockSpec((t, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((t, k), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)] * 2
        + [pl.BlockSpec((1, k), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)] * 2 + idx_specs,
        out_specs=[pl.BlockSpec((t, p, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * 4
        + [pl.BlockSpec((4 * c, k), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((o, p, c), x1.dtype)] * 4
        + [jax.ShapeDtypeStruct((4 * c, k), _acc_dtype(x1.dtype))],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(x1, x2, x3, x4, w, mask, dpmax, dpmin, dsum, dsumsq, *idx_args)
    dx1, dx2, dx3, dx4, dw = grads
    return (dx1, dx2, dx3, dx4, dw.astype(w.dtype), jnp.zeros_like(mask))


pct_tail_fused.defvjp(_fwd_rule, _bwd_rule)
