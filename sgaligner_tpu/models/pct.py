"""NaivePCT object encoder (flax.linen).

Equivalent of /root/reference/src/aligner/networks/pct.py:275-317 (the encoder the
released ground-truth config selects via ``modules: ['pct', ...]``): a 2-layer
point embedding, four stacked self-attention (SA) blocks, feature concat, a
1024-wide projection, global max-pool, and a 2-layer MLP head.

TPU notes:
* All Conv1d(k=1) become per-point Dense (MXU matmuls), channel-last.
* BatchNorm here is REAL in the reference (unlike PointNetfeat's discarded BN) —
  but our batch axis contains padded object slots, so plain BN would corrupt the
  statistics. ``MaskedBatchNorm`` computes moments over valid slots only.
* The SA block's quirks are preserved: q/k share one weight (pct.py:199), the
  softmax axis and the ``bmm(x_v, attention)`` contraction direction follow the
  reference exactly (pct.py:222-226) even though that attends over queries.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sgaligner_tpu.ops import kernel_mode


class _DenseParams(nn.Module):
    """Parameter container matching nn.Dense's {kernel[, bias]} tree — lets
    the fused attention path share one param tree (and torch-checkpoint
    mapping) with the unfused Dense path."""

    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.din, self.dout), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.dout,),
                        jnp.float32) if self.use_bias else None)
        return k, b


def _use_fused(flag: str) -> bool:
    return kernel_mode.use_fused(flag)


def _fused_block(x, mask, train, channels: int, dtype,
                 scale: bool, double_norm: bool) -> jnp.ndarray:
    """The whole SA/OA block via fused Pallas ops. Must be called from
    inside the module's compact scope (creates its params).

    TRAIN: one custom-VJP op (``pct_block_residual``) covers attention +
    trans + masked BN partial sums + batch-stat fold + relu/residual
    epilogue — its backward derives the epilogue routing in-VMEM, so the
    dt cotangent and the residual-add never hit HBM as separate XLA passes.
    The BN module is consulted for its (scale, bias) params up front and for
    the running-stat update afterwards.

    EVAL: one forward-only kernel (``pct_block_eval``) — the running-stat
    fold is known up front, so relu + residual ride the kernel's output
    write and t_out never reaches HBM."""
    from sgaligner_tpu.ops.pct_attention import (pct_block_eval,
                                                 pct_block_residual)

    da = channels // 4
    wqk, _ = _DenseParams(channels, da, use_bias=False, name="qk")()
    wv, bv = _DenseParams(channels, channels, name="v")()
    wt, bt = _DenseParams(channels, channels, name="trans")()
    interpret = kernel_mode.interpret()  # fused="always" in CPU tests

    p_pts = x.shape[1]
    kmask = mask.astype(dtype)[:, None]
    bn = MaskedBatchNorm(channels, name="after_norm")
    if train:
        count = jnp.maximum(mask.astype(jnp.float32).sum() * p_pts, 1.0)
        bn_scale, bn_bias = bn(x, mask[:, None], train, return_params=True)
        x_next, ssum, ssumsq = pct_block_residual(
            x.astype(dtype), wqk.astype(dtype), wv.astype(dtype),
            bv.astype(dtype), wt.astype(dtype), bt.astype(dtype),
            bn_scale, bn_bias, kmask, count,
            scale, double_norm, bn.epsilon, interpret)
        # running-stat update only (the op already applied the fold)
        mean = ssum[0] / count
        var = jnp.maximum(ssumsq[0] / count - jnp.square(mean), 0.0)
        bn(x, mask[:, None], train, moments=(mean, var, count),
           return_fold=True)
        return x_next

    # eval: running-stat fold (train=False ignores moments) applied in-kernel
    wbn, bbn = bn(x, mask[:, None], train, return_fold=True)
    return pct_block_eval(
        x.astype(dtype), wqk.astype(dtype), wv.astype(dtype),
        bv.astype(dtype), wt.astype(dtype), bt.astype(dtype),
        wbn, bbn, scale, double_norm, interpret)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with masked batch statistics (mask: valid rows)."""

    features: int
    momentum: float = 0.9  # torch default momentum 0.1 == flax-style 0.9 decay
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool,
                 moments: tuple | None = None, return_fold: bool = False,
                 return_params: bool = False):
        """x: [..., C]; mask broadcastable to x[..., 0] (True = valid).

        ``moments=(mean, var, count)`` (f32, per-channel) skips the stats
        pass over x — used by the fused-tail path, where the kernel already
        reduced the masked sums. ``return_fold=True`` returns the folded
        per-channel affine ``(w, b)`` instead of applying it (x is then only
        consulted for its dtype). ``return_params=True`` returns the raw
        ``(scale, bias)`` parameters without touching statistics — the
        whole-block fused training op (ops/pct_attention.py::
        pct_block_residual) computes the fold internally from its kernel's
        sums; a second call with ``moments=`` then performs the running-stat
        update."""
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(self.features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(self.features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (self.features,), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.dtype)
        if return_params:
            return scale, bias

        if moments is not None and train:
            mean, var, count = moments
            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        elif train:
            # One-pass moments with f32 ACCUMULATION over the (possibly bf16)
            # input — jnp.sum(dtype=f32) reduces without materializing an f32
            # upcast of the [O*P, C] activation (the PCT tail's activations
            # are 0.5 GB at B=8; a second (x-mean)² pass would re-read them).
            # (f64 under x64 parity runs, matching ops/pct_tail.py's sums.)
            f32 = jnp.promote_types(x.dtype, jnp.float32)
            m = mask.astype(x.dtype)[..., None]
            count = jnp.maximum(mask.astype(f32).sum()
                                * (x.size // (mask.size * self.features)), 1.0)
            red = tuple(range(x.ndim - 1))
            xm = x * m
            mean = jnp.sum(xm, red, dtype=f32) / count
            ex2 = jnp.sum(jnp.square(xm), red, dtype=f32) / count
            var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                # torch running_var uses the unbiased estimator
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        # normalize in the input dtype with per-channel scalars folded to one
        # multiply + one add (w = s/sqrt(var+eps); b = bias - mean*w),
        # computed at >= f32 (f64 under x64 parity runs)
        sdt = jnp.promote_types(x.dtype, jnp.float32)
        w = scale.astype(sdt) / jnp.sqrt(var.astype(sdt) + self.epsilon)
        b = bias.astype(sdt) - mean.astype(sdt) * w
        if return_fold:
            return w, b
        return x * w.astype(x.dtype) + b.astype(x.dtype)


class OABlock(nn.Module):
    """Offset-attention block — OA (pct.py:234-273), quirks included: shared
    q/k weight, softmax over the key axis then re-normalization over the QUERY
    axis (the reference's "here" comment), residual on trans(x - x_r)."""

    channels: int = 128
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"  # "auto" | "never" | "always" (Pallas attention)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        if _use_fused(self.fused):
            return _fused_block(x, mask, train, self.channels, self.dtype,
                                scale=False, double_norm=True)
        da = self.channels // 4
        qk = nn.Dense(da, use_bias=False, dtype=self.dtype, name="qk")
        x_q, x_k = qk(x), qk(x)
        x_v = nn.Dense(self.channels, dtype=self.dtype, name="v")(x)

        energy = jnp.einsum("opd,oqd->opq", x_q, x_k)  # no sqrt(da) scaling
        attention = nn.softmax(energy, axis=-1)
        attention = attention / (1e-9 + attention.sum(axis=1, keepdims=True))
        x_r = jnp.einsum("opc,opq->oqc", x_v, attention)
        x_r = nn.Dense(self.channels, dtype=self.dtype, name="trans")(x - x_r)
        x_r = MaskedBatchNorm(self.channels, name="after_norm")(
            x_r, mask[:, None], train)
        return x + nn.relu(x_r)


class SABlock(nn.Module):
    """Self-attention block — SA (pct.py:187-232), quirks included."""

    channels: int = 128
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"  # "auto" | "never" | "always" (Pallas attention)

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        """x: [O, P, C] (points = sequence axis). mask: [O] valid objects."""
        if _use_fused(self.fused):
            return _fused_block(x, mask, train, self.channels, self.dtype,
                                scale=True, double_norm=False)
        da = self.channels // 4
        # q and k share ONE weight matrix (pct.py:199: q_conv.weight = k_conv.weight)
        qk = nn.Dense(da, use_bias=False, dtype=self.dtype, name="qk")
        x_q = qk(x)                                  # [O, P, da]
        x_k = qk(x)                                  # same projection
        x_v = nn.Dense(self.channels, dtype=self.dtype, name="v")(x)

        energy = jnp.einsum("opd,oqd->opq", x_q, x_k) / jnp.sqrt(float(da))
        attention = nn.softmax(energy, axis=-1)      # softmax over q axis (quirk)
        # reference: x_s = bmm(x_v[B,C,N], attention[B,N,N]) -> out[:, :, j]
        # sums over the first attention index; channel-last equivalent:
        x_s = jnp.einsum("opc,opq->oqc", x_v, attention)
        x_s = nn.Dense(self.channels, dtype=self.dtype, name="trans")(x_s)
        x_s = MaskedBatchNorm(self.channels, name="after_norm")(x_s, mask[:, None], train)
        return x + nn.relu(x_s)


class NaivePCT(nn.Module):
    out_size: int = 256
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"
    # input layout: points-last [O, P, 3] (default) or CHANNEL-FIRST
    # [O, 3, P] — the batch contract's native layout; with the fused
    # embedding the 43x lane-padded [O, P, 3] array then never exists
    channel_first: bool = False

    @nn.compact
    def __call__(self, points: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """points: [O, P, 3] (or [O, 3, P] with channel_first);
        mask: [O] valid-object mask -> [O, out_size]."""
        pm = mask[:, None]

        if _use_fused(self.fused):
            x = self._fused_embedding(points, mask, pm, train)
        else:
            x = points.astype(self.dtype)
            if self.channel_first:
                x = jnp.swapaxes(x, 1, 2)
            # Embedding: 2 × (conv(no bias) + BN + relu) (pct.py:101-125)
            for i in range(2):
                x = nn.Dense(128, use_bias=False, dtype=self.dtype,
                             name=f"emb{i}")(x)
                x = MaskedBatchNorm(128, name=f"emb{i}_bn")(x, pm, train)
                x = nn.relu(x)

        feats = []
        for i in range(4):
            x = SABlock(128, dtype=self.dtype, fused=self.fused,
                        name=f"sa{i + 1}")(x, mask, train)
            feats.append(x)

        if _use_fused(self.fused):
            # Fused tail: concat + 1024-linear + BN stats + min/max pool in
            # one Pallas kernel; the [O, P, 1024] activation never exists
            # (see ops/pct_tail.py for the monotone-pool identity).
            from sgaligner_tpu.ops.pct_tail import pct_tail_fused

            w, _ = _DenseParams(4 * 128, 1024, use_bias=False, name="linear")()
            interpret = kernel_mode.interpret()
            kmask = mask.astype(self.dtype)[:, None]
            p_pts = feats[0].shape[1]
            pmax, pmin, ssum, ssumsq = pct_tail_fused(
                feats[0].astype(self.dtype), feats[1].astype(self.dtype),
                feats[2].astype(self.dtype), feats[3].astype(self.dtype),
                w.astype(self.dtype), kmask, interpret)
            count = jnp.maximum(mask.astype(jnp.float32).sum() * p_pts, 1.0)
            mean = ssum[0] / count
            var = jnp.maximum(ssumsq[0] / count - jnp.square(mean), 0.0)
            wbn, bbn = MaskedBatchNorm(1024, name="linear_bn")(
                pmax, pm, train, moments=(mean, var, count), return_fold=True)
            pooled = jnp.where(wbn > 0, pmax.astype(wbn.dtype),
                               pmin.astype(wbn.dtype)) * wbn + bbn
            x = nn.leaky_relu(pooled, 0.2).astype(self.dtype)  # [O, 1024]
        else:
            x = jnp.concatenate(feats, axis=-1)          # [O, P, 512]
            x = nn.Dense(1024, use_bias=False, dtype=self.dtype,
                         name="linear")(x)
            x = MaskedBatchNorm(1024, name="linear_bn")(x, pm, train)
            x = nn.leaky_relu(x, 0.2)
            x = jnp.max(x, axis=1)                       # [O, 1024]

        x = nn.Dense(512, use_bias=False, dtype=self.dtype, name="linear1")(x)
        x = MaskedBatchNorm(512, name="bn1")(x, mask, train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.out_size, dtype=self.dtype, name="linear2")(x)
        x = MaskedBatchNorm(self.out_size, name="bn2")(x, mask, train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x

    def _fused_embedding(self, points, mask, pm, train):
        """Both embedding conv+BN+relu layers via ops/pct_embed.py kernels:
        raw pre-BN activations + in-kernel masked stats; the BN folds are
        applied in the next kernel's prologue (layer 1) / one XLA pass
        (layer 2 output, feeding the SA stack)."""
        from sgaligner_tpu.ops.pct_embed import (embed_first_fused,
                                                 embed_second_fused)

        pts = points.astype(self.dtype)
        pts_cf = pts if self.channel_first else jnp.swapaxes(pts, 1, 2)
        interpret = kernel_mode.interpret()
        kmask = mask.astype(self.dtype)[:, None]
        p_pts = pts_cf.shape[2]
        count = jnp.maximum(mask.astype(jnp.float32).sum() * p_pts, 1.0)

        def fold(name, ssum, ssumsq, ref):
            mean = ssum[0] / count
            var = jnp.maximum(ssumsq[0] / count - jnp.square(mean), 0.0)
            w, b = MaskedBatchNorm(128, name=name)(
                ref, pm, train, moments=(mean, var, count), return_fold=True)
            return (w.astype(self.dtype)[None], b.astype(self.dtype)[None])

        w0, _ = _DenseParams(3, 128, use_bias=False, name="emb0")()
        h0, s0a, s0b = embed_first_fused(
            jax.lax.stop_gradient(pts_cf), w0.astype(self.dtype), kmask,
            interpret)
        wf0, bf0 = fold("emb0_bn", s0a, s0b, h0)

        w1, _ = _DenseParams(128, 128, use_bias=False, name="emb1")()
        h1, s1a, s1b = embed_second_fused(h0, wf0, bf0,
                                          w1.astype(self.dtype), kmask,
                                          interpret)
        wf1, bf1 = fold("emb1_bn", s1a, s1b, h1)
        return nn.relu(h1 * wf1 + bf1)


class SPCT(nn.Module):
    """SPCT (pct.py:319-351): NaivePCT's embedding + 4 offset-attention blocks;
    returns the per-point features plus their max/mean pools (the reference has
    no MLP head here — it is a feature extractor)."""

    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"

    @nn.compact
    def __call__(self, points: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False):
        x = points.astype(self.dtype)
        pm = mask[:, None]
        for i in range(2):
            x = nn.Dense(128, use_bias=False, dtype=self.dtype, name=f"emb{i}")(x)
            x = MaskedBatchNorm(128, name=f"emb{i}_bn")(x, pm, train)
            x = nn.relu(x)

        feats = []
        for i in range(4):
            x = OABlock(128, dtype=self.dtype, fused=self.fused,
                        name=f"sa{i + 1}")(x, mask, train)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)          # [O, P, 512]
        x = nn.Dense(1024, use_bias=False, dtype=self.dtype, name="linear")(x)
        x = MaskedBatchNorm(1024, name="linear_bn")(x, pm, train)
        x = nn.leaky_relu(x, 0.2)
        return x, jnp.max(x, axis=1), jnp.mean(x, axis=1)


class SGModule(nn.Module):
    """Sampling-and-grouping feature block — SG (pct.py:154-185)."""

    s: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, coords: jnp.ndarray,
                 mask: jnp.ndarray, train: bool):
        """features: [O, N, D]; coords: [O, N, 3] -> ([O, s, 3], [O, s, C])."""
        from sgaligner_tpu.ops.knn import sample_and_knn_group

        new_xyz, grouped = sample_and_knn_group(self.s, 32, coords, features)
        o, s, k, d = grouped.shape
        x = grouped.reshape(o * s, k, d)
        gm = jnp.broadcast_to(mask[:, None], (o, s)).reshape(o * s)
        for i in range(2):
            x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                         name=f"conv{i + 1}")(x)
            x = MaskedBatchNorm(self.out_channels, name=f"bn{i + 1}")(
                x, gm[:, None], train)
            x = nn.relu(x)
        x = jnp.max(x, axis=1).reshape(o, s, self.out_channels)
        return new_xyz, x


class FullPCT(nn.Module):
    """The full PCT (pct.py:353-395): NeighborEmbedding (FPS + KNN grouping,
    pct.py:127-152) + 4 offset-attention blocks + MLP head. The reference's
    CUDA ``pointnet2_ops`` FPS becomes the batched device kernel (ops/fps.py)."""

    out_size: int = 256
    samples: tuple[int, int] = (512, 256)
    dtype: jnp.dtype = jnp.float32
    fused: str = "auto"

    @nn.compact
    def __call__(self, points: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        xyz = points.astype(self.dtype)                  # [O, N, 3]
        pm = mask[:, None]
        x = xyz
        for i in range(2):
            x = nn.Dense(64, use_bias=False, dtype=self.dtype,
                         name=f"ne_conv{i + 1}")(x)
            x = MaskedBatchNorm(64, name=f"ne_bn{i + 1}")(x, pm, train)
            x = nn.relu(x)

        xyz1, x = SGModule(self.samples[0], 128, dtype=self.dtype,
                           name="sg1")(x, xyz, mask, train)
        _, x = SGModule(self.samples[1], 256, dtype=self.dtype,
                        name="sg2")(x, xyz1, mask, train)

        feats = [x]
        for i in range(4):
            x = OABlock(256, dtype=self.dtype, fused=self.fused,
                        name=f"oa{i + 1}")(x, mask, train)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)              # [O, s2, 1280]
        x = nn.Dense(1024, use_bias=False, dtype=self.dtype, name="linear")(x)
        x = MaskedBatchNorm(1024, name="linear_bn")(x, pm, train)
        x = nn.leaky_relu(x, 0.2)
        x = jnp.max(x, axis=1)

        x = nn.Dense(512, use_bias=False, dtype=self.dtype, name="linear1")(x)
        x = MaskedBatchNorm(512, name="bn1")(x, mask, train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        x = nn.Dense(self.out_size, dtype=self.dtype, name="linear2")(x)
        x = MaskedBatchNorm(self.out_size, name="bn2")(x, mask, train)
        x = nn.relu(x)
        x = nn.Dropout(0.5, deterministic=not train)(x)
        return x
