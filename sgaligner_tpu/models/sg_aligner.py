"""MultiModalEncoder — the SGAligner model (flax.linen).

Re-design of /root/reference/src/aligner/sg_aligner.py:37-137 over the padded
PairBatch contract: per-object multi-modal embeddings

* ``point`` / ``pct`` — object point-cloud encoder → Dense(emb_dim),
* ``gat``   — 2-layer graph attention over per-graph relative translations,
  run for ALL 2B graphs of the batch in one dense masked op (the reference
  python-loops per graph, sg_aligner.py:86-110) → Dense(emb_dim),
* ``rel`` / ``attr`` — Linear BoW embeddings (sg_aligner.py:54-55),
* ``joint`` — softmax-weighted concat of L2-normalized modal embeddings
  (MultiModalFusion, sg_aligner.py:23-35).

All embeddings are returned flattened to ``[B * 2N, D]`` to mirror the
reference's flat object axis (loss indices are flat).
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from sgaligner_tpu.models.pct import NaivePCT
from sgaligner_tpu.models.pointnet import PointNetEncoder
from sgaligner_tpu.models.structure import MultiGAT
from sgaligner_tpu.ops.losses import l2_normalize


class MultiModalFusion(nn.Module):
    """sg_aligner.py:23-35 — learned softmax weights over modalities."""

    modal_num: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, embs: list[jnp.ndarray]) -> jnp.ndarray:
        assert len(embs) == self.modal_num
        w = self.param("weight", nn.initializers.ones, (self.modal_num, 1), self.dtype)
        wn = nn.softmax(w, axis=0)
        parts = [wn[i] * l2_normalize(embs[i], axis=-1) for i in range(self.modal_num)]
        return jnp.concatenate(parts, axis=-1)


def compact_gather(batch: dict[str, Any], k: int):
    """Per-pair compaction indices: the first k slots after sorting valid
    slots first (stable argsort of ~mask — pure device compute, static shape).

    Real 3RScan pairs fill ~half their padded object slots; routing only the
    compacted slots through the point encoder (the step's dominant cost,
    PERF.md) cuts its work proportionally. Objects beyond k would be dropped —
    parallel.mesh.shard_batch validates the bound on the host.
    """
    obj_mask = batch["obj_mask"]
    order = jnp.argsort(~obj_mask, axis=1, stable=True)          # [B, 2N]
    idx = order[:, :k]                                           # [B, K]
    cmask = jnp.take_along_axis(obj_mask, idx, axis=1)           # [B, K]
    return idx, cmask


def compact_scatter(emb_c: jnp.ndarray, idx: jnp.ndarray, cmask: jnp.ndarray,
                    two_n: int) -> jnp.ndarray:
    """Scatter compacted per-object embeddings back to the full slot axis."""
    b, k = idx.shape
    d = emb_c.shape[-1]
    emb_c = emb_c.reshape(b, k, d) * cmask[..., None].astype(emb_c.dtype)
    flat_idx = (jnp.arange(b)[:, None] * two_n + idx).reshape(-1)
    out = jnp.zeros((b * two_n, d), emb_c.dtype)
    return out.at[flat_idx].add(emb_c.reshape(b * k, d))


class MultiModalEncoder(nn.Module):
    modules: Sequence[str] = ("point", "gat", "rel", "attr")
    rel_dim: int = 41
    attr_dim: int = 164
    emb_dim: int = 100
    pt_out_dim: int = 256
    hidden_units: Sequence[int] = (3, 128, 128)
    heads: Sequence[int] = (2, 2)
    dropout: float = 0.0
    pointnet_bn_mode: str = "parity"
    pointnet_fused: str = "auto"
    dtype: jnp.dtype = jnp.float32
    # 0 = off; otherwise route only this many (per pair) mask-compacted object
    # slots through the point encoder (see compact_gather)
    compact_slots: int = 0

    @nn.compact
    def __call__(self, batch: dict[str, Any], train: bool = False) -> dict[str, jnp.ndarray]:
        b, two_n = batch["obj_mask"].shape
        n = two_n // 2
        obj_mask = batch["obj_mask"].reshape(b * two_n)

        embs: dict[str, jnp.ndarray] = {}
        for module in self.modules:
            if module in ("point", "pct"):
                if "obj_points_pooled" in batch:
                    # batch-pooled compaction (data/batch.py::pool_compact):
                    # one flat real-object axis for the whole batch
                    compact = "pooled"
                    pts = batch["obj_points_pooled"]
                    enc_mask = batch["pooled_mask"]
                elif "obj_points_compact" in batch:
                    # host-compacted points: only real objects ship (batch.py)
                    compact = True
                    pts = batch["obj_points_compact"]
                    idx = batch["compact_idx"]
                    cmask = batch["compact_mask"]
                    enc_mask = cmask.reshape(-1)
                elif 0 < self.compact_slots < two_n:
                    # device-side compaction fallback (gather from obj_mask)
                    compact = True
                    idx, cmask = compact_gather(batch, self.compact_slots)
                    pts = jnp.take_along_axis(
                        batch["obj_points"], idx[:, :, None, None], axis=1)
                    enc_mask = cmask.reshape(-1)
                else:
                    compact = False
                    pts = batch["obj_points"]
                    enc_mask = obj_mask
                # channel-first [.., 3, P] from the batch contract
                pts = pts.astype(self.dtype).reshape(-1, 3, pts.shape[-1])
                if module == "point":
                    feat = PointNetEncoder(self.pt_out_dim, self.pointnet_bn_mode,
                                           dtype=self.dtype,
                                           fused=self.pointnet_fused,
                                           name="object_encoder")(
                        pts, train=train)
                else:
                    # channel-first straight through: with the fused embedding
                    # the 43x lane-padded [O, P, 3] array never materializes
                    feat = NaivePCT(self.pt_out_dim, dtype=self.dtype,
                                    fused=self.pointnet_fused,
                                    channel_first=True,
                                    name="object_encoder")(
                        pts, enc_mask, train=train)
                emb = nn.Dense(self.emb_dim, dtype=self.dtype,
                               name="object_embedding")(feat)
                if compact == "pooled":
                    emb = emb * batch["pooled_mask"][:, None].astype(emb.dtype)
                    emb = jnp.zeros((b * two_n, emb.shape[-1]), emb.dtype
                                    ).at[batch["pooled_flat_idx"]].add(emb)
                elif compact:
                    emb = compact_scatter(emb, idx, cmask, two_n)
            elif module == "gat":
                # [B, 2N, 3] -> [2B, N, 3]: graph g = pair*2 + side
                rel_pose = batch["rel_pose"].astype(self.dtype).reshape(2 * b, n, 3)
                node_mask = batch["obj_mask"].reshape(2 * b, n)
                adj = batch["adj"].reshape(2 * b, n, n)
                feat = MultiGAT(self.hidden_units, self.heads, self.dropout,
                                dtype=self.dtype, name="structure_encoder")(
                    rel_pose, adj, node_mask, train=train)
                feat = feat.reshape(b * two_n, -1)
                emb = nn.Dense(self.emb_dim, dtype=self.dtype,
                               name="structure_embedding")(feat)
            elif module == "rel":
                emb = nn.Dense(self.emb_dim, dtype=self.dtype,
                               name="meta_embedding_rel")(
                    batch["bow_rel"].astype(self.dtype)).reshape(b * two_n, -1)
            elif module == "attr":
                emb = nn.Dense(self.emb_dim, dtype=self.dtype,
                               name="meta_embedding_attr")(
                    batch["bow_attr"].astype(self.dtype)).reshape(b * two_n, -1)
            else:
                raise NotImplementedError(f"unknown module {module!r}")

            embs[module] = emb.reshape(b * two_n, -1)

        if len(self.modules) > 1:
            joint = MultiModalFusion(len(self.modules), dtype=self.dtype,
                                     name="fusion")([embs[m] for m in self.modules])
            embs["joint"] = joint
        return embs
