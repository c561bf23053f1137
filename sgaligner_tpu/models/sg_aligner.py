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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict[str, Any], train: bool = False) -> dict[str, jnp.ndarray]:
        b, two_n = batch["obj_mask"].shape
        n = two_n // 2
        obj_mask = batch["obj_mask"].reshape(b * two_n)

        embs: dict[str, jnp.ndarray] = {}
        for module in self.modules:
            if module in ("point", "pct"):
                pts = batch["obj_points"].astype(self.dtype).reshape(b * two_n, -1, 3)
                if module == "point":
                    feat = PointNetEncoder(self.pt_out_dim, self.pointnet_bn_mode,
                                           dtype=self.dtype, name="object_encoder")(
                        pts, train=train)
                else:
                    feat = NaivePCT(self.pt_out_dim, dtype=self.dtype,
                                    name="object_encoder")(pts, obj_mask, train=train)
                emb = nn.Dense(self.emb_dim, dtype=self.dtype,
                               name="object_embedding")(feat)
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
