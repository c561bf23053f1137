"""Training objectives: OverallLoss (SGAligner) and OverallNCALoss (EVA).

Functional assembly of the reference's loss stack
(/root/reference/src/aligner/losses.py:99-152, 175-205) over a padded PairBatch:

* per-modality ICL (intra-graph contrastive),
* per-modality IAL (inter-modal alignment vs the joint embedding),
* both groups combined by Kendall-style uncertainty layers whose ``log_vars``
  are trainable (CustomMultiLossLayer params joining the optimizer, see
  trainval_sgaligner.py:47-50),
* plus ICL on the joint embedding.

Loss parameters are a plain pytree ``{"ial_log_vars": [M], "icl_log_vars": [M]}``
living alongside the model params in the train state.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from sgaligner_tpu.ops.losses import (
    ial_loss,
    icl_loss,
    kendall_combine,
    l2_normalize,
    nca_loss,
)


def init_loss_params(num_modules: int) -> dict[str, jnp.ndarray]:
    return {
        "ial_log_vars": jnp.zeros((num_modules,), jnp.float32),
        "icl_log_vars": jnp.zeros((num_modules,), jnp.float32),
    }


def flat_loss_indices(batch: dict[str, Any]) -> dict[str, jnp.ndarray]:
    """Per-pair slot indices -> flat indices into the [B*2N] object axis."""
    b, two_n = batch["obj_mask"].shape
    offs = jnp.arange(b, dtype=jnp.int32)[:, None] * two_n

    def flat(idx_key, mask_key):
        return ((batch[idx_key] + offs).reshape(-1),
                batch[mask_key].reshape(-1))

    e1i, m_i = flat("e1i", "anchor_mask")
    e2i, _ = flat("e2i", "anchor_mask")
    e1j, m_j1 = flat("e1j", "e1j_mask")
    e2j, m_j2 = flat("e2j", "e2j_mask")
    return {"e1i": e1i, "e2i": e2i, "e1j": e1j, "e2j": e2j,
            "m_i": m_i, "m_j1": m_j1, "m_j2": m_j2}


def overall_loss(
    embs: dict[str, jnp.ndarray],
    batch: dict[str, Any],
    loss_params: dict[str, jnp.ndarray],
    modules: tuple[str, ...],
    zoom: float = 0.1,
) -> dict[str, jnp.ndarray]:
    """OverallLoss.forward (losses.py:114-152)."""
    ix = flat_loss_indices(batch)

    def icl(emb):
        return icl_loss(emb, ix["e1i"], ix["e2i"], ix["e1j"], ix["e2j"],
                        ix["m_i"], ix["m_j1"], ix["m_j2"])

    multi = len(modules) > 1

    total_align = jnp.float32(0.0)
    if multi:
        ial_losses = jnp.stack([
            ial_loss(embs[m], embs["joint"], ix["e1i"], ix["e2i"], ix["e1j"],
                     ix["e2j"], ix["m_i"], ix["m_j1"], ix["m_j2"])
            for m in modules
        ])
        total_align = kendall_combine(ial_losses, loss_params["ial_log_vars"]) * zoom

    icl_unimodal_each = jnp.stack([icl(embs[m]) for m in modules])
    if multi:
        icl_unimodal = kendall_combine(icl_unimodal_each, loss_params["icl_log_vars"])
    else:
        icl_unimodal = icl_unimodal_each[0]

    icl_multimodal = icl(embs["joint"]) if multi else jnp.float32(0.0)

    loss = total_align + icl_unimodal + icl_multimodal if multi else icl_unimodal
    return {
        "loss": loss,
        "icl_loss_unimodal": icl_unimodal,
        "icl_loss_multimodal": icl_multimodal,
        "ial_loss": total_align,
    }


def overall_nca_loss(
    embs: dict[str, jnp.ndarray],
    batch: dict[str, Any],
    alpha: float = 1.0,
    beta: float = 1.0,
    ep: float = 0.0,
) -> dict[str, jnp.ndarray]:
    """OverallNCALoss.forward (losses.py:186-205): NCA over every output head."""
    ix = flat_loss_indices(batch)
    mask = ix["m_i"]
    out: dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)
    for key, emb in embs.items():
        e = l2_normalize(emb, axis=-1)
        src = e[ix["e1i"]] * mask[:, None].astype(e.dtype)
        ref = e[ix["e2i"]] * mask[:, None].astype(e.dtype)
        out[key] = nca_loss(src, ref, mask, alpha=alpha, beta=beta, ep=ep)
        total = total + out[key]
    out["loss"] = total
    return out
