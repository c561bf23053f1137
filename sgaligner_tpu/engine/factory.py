"""Factories: model / optimizer / objective from a Config.

Mirrors the wiring of the reference entry points
(/root/reference/src/trainers/trainval_sgaligner.py:16-58 and trainval_eva.py):
model from ``cfg.modules``, Adam(lr=1e-3, weight_decay=1e-6) over model params
*plus* the Kendall loss-layer params (trainval_sgaligner.py:47-50), no LR
scheduler (the reference's is commented out, :55-56).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from sgaligner_tpu.core.config import Config
from sgaligner_tpu.models.eva import EVA
from sgaligner_tpu.models.sg_aligner import MultiModalEncoder


def build_model(cfg: Config, platform: str | None = None):
    """platform: the platform of the devices the model will RUN on (the mesh's),
    which can differ from jax.default_backend() — e.g. a virtual CPU mesh on a
    TPU box; Pallas kernels must be disabled there."""
    dtype = jnp.bfloat16 if cfg.tpu.compute_dtype == "bfloat16" else jnp.float32
    fused = getattr(cfg.tpu, "fused", "auto")
    if fused == "auto" and platform == "cpu":
        fused = "never"
    if cfg.model_name == "eva":
        return EVA(
            modules=tuple(cfg.modules),
            rel_dim=cfg.model.rel_dim,
            attr_dim=cfg.model.attr_dim,
            emb_dim=cfg.model.emb_dim,
            dropout=cfg.model.dropout,
            pointnet_bn_mode=cfg.model.pointnet_bn_mode,
            pointnet_fused=fused,
            dtype=dtype,
        )
    return MultiModalEncoder(
        modules=tuple(cfg.modules),
        rel_dim=cfg.model.rel_dim,
        attr_dim=cfg.model.attr_dim,
        emb_dim=cfg.model.emb_dim,
        pt_out_dim=cfg.model.pt_out_dim,
        hidden_units=tuple(cfg.model.hidden_units),
        heads=tuple(cfg.model.heads),
        dropout=cfg.model.dropout,
        pointnet_bn_mode=cfg.model.pointnet_bn_mode,
        pointnet_fused=fused,
        dtype=dtype,
        compact_slots=cfg.tpu.compact_slots,
    )


def build_lr_schedule(cfg: Config):
    """LR schedule per cfg.optim.scheduler.

    The reference trains at constant LR (its ExponentialLR is commented out,
    trainval_sgaligner.py:55-56); "exponential" applies
    ``lr * lr_decay^(epoch / lr_decay_steps)`` using ``steps_per_epoch`` as the
    epoch denominator, and "cosine"/"warmup-cosine" mirror the unused schedule
    helpers in the reference's utils/torch_util.py:110-145.
    """
    o = cfg.optim
    if o.scheduler in ("none", "", None):
        return o.lr
    if o.scheduler == "exponential":
        per = max(o.steps_per_epoch, 1) * max(o.lr_decay_steps, 1)
        return lambda step: o.lr * (o.lr_decay ** (step // per))
    total = max(o.steps_per_epoch, 1) * o.max_epoch
    if o.scheduler == "cosine":
        return optax.cosine_decay_schedule(o.lr, decay_steps=max(total, 1))
    if o.scheduler == "warmup-cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, o.lr, warmup_steps=max(o.warmup_steps, 1),
            decay_steps=max(total, o.warmup_steps + 1))
    raise ValueError(f"unknown scheduler {o.scheduler!r}")


def build_optimizer(cfg: Config) -> optax.GradientTransformation:
    """torch.optim.Adam semantics: L2 weight decay folded into the gradient
    *before* the Adam moments (unlike AdamW's decoupled decay)."""
    schedule = build_lr_schedule(cfg)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(schedule),
    )
    if cfg.optim.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, cfg.optim.grad_acc_steps)
    # Skip steps with non-finite grads (reference checks and skips,
    # base_trainer.py:184-192 / epoch_based_trainer.py:95-99).
    return optax.apply_if_finite(tx, max_consecutive_errors=10_000)


def loss_kind(cfg: Config) -> str:
    return "nca" if cfg.model_name == "eva" else "overall"
