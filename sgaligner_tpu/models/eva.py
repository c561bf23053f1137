"""EVA baseline model (flax.linen).

Equivalent of /root/reference/src/aligner/eva.py:9-96: same modality scheme as
MultiModalEncoder but with a GCN structure encoder (``n_units=[3, 200, 400]``), a
200-d PointNet, and *no* projection after the structure encoder (eva.py:72). The
reference's ``gcn`` branch mirrors the GAT python loop; here it is one dense op.
"""

from __future__ import annotations

from collections.abc import Sequence
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from sgaligner_tpu.models.pointnet import PointNetEncoder
from sgaligner_tpu.models.structure import MultiGCN
from sgaligner_tpu.models.sg_aligner import MultiModalFusion


class EVA(nn.Module):
    modules: Sequence[str] = ("point", "gcn", "rel", "attr")
    rel_dim: int = 41
    attr_dim: int = 164
    n_units: Sequence[int] = (3, 200, 400)
    emb_dim: int = 100
    pt_out_dim: int = 200
    dropout: float = 0.0
    pointnet_bn_mode: str = "parity"
    pointnet_fused: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: dict[str, Any], train: bool = False) -> dict[str, jnp.ndarray]:
        b, two_n = batch["obj_mask"].shape
        n = two_n // 2

        embs: dict[str, jnp.ndarray] = {}
        for module in self.modules:
            if module == "point":
                if "obj_points_pooled" in batch:
                    # batch-pooled compaction (data/batch.py::pool_compact) —
                    # same scatter contract as MultiModalEncoder's pooled path
                    pts = batch["obj_points_pooled"].astype(self.dtype)
                    pts = pts.reshape(-1, 3, pts.shape[-1])
                    feat = PointNetEncoder(self.pt_out_dim,
                                           self.pointnet_bn_mode,
                                           dtype=self.dtype,
                                           fused=self.pointnet_fused,
                                           name="object_encoder")(pts,
                                                                  train=train)
                    feat = feat * batch["pooled_mask"][:, None].astype(
                        feat.dtype)
                    emb = jnp.zeros((b * two_n, feat.shape[-1]), feat.dtype
                                    ).at[batch["pooled_flat_idx"]].add(feat)
                    embs[module] = emb
                    continue
                if "obj_points_compact" in batch:
                    from sgaligner_tpu.models.sg_aligner import compact_scatter

                    pts = batch["obj_points_compact"].astype(self.dtype)
                    pts = pts.reshape(-1, 3, pts.shape[-1])
                    feat = PointNetEncoder(self.pt_out_dim,
                                           self.pointnet_bn_mode,
                                           dtype=self.dtype,
                                           fused=self.pointnet_fused,
                                           name="object_encoder")(pts,
                                                                  train=train)
                    emb = compact_scatter(feat, batch["compact_idx"],
                                          batch["compact_mask"], two_n)
                    embs[module] = emb.reshape(b * two_n, -1)
                    continue
                pts = batch["obj_points"].astype(self.dtype)
                pts = pts.reshape(b * two_n, 3, pts.shape[-1])
                # EVA uses the raw 200-d PointNet feature, no projection (eva.py:75)
                emb = PointNetEncoder(self.pt_out_dim, self.pointnet_bn_mode,
                                      dtype=self.dtype,
                                      fused=self.pointnet_fused,
                                      name="object_encoder")(
                    pts, train=train)
            elif module == "gcn":
                rel_pose = batch["rel_pose"].astype(self.dtype).reshape(2 * b, n, 3)
                node_mask = batch["obj_mask"].reshape(2 * b, n)
                adj = batch["adj"].reshape(2 * b, n, n)
                emb = MultiGCN(self.n_units, self.dropout, dtype=self.dtype,
                               name="structure_encoder")(
                    rel_pose, adj, node_mask, train=train)
                emb = emb.reshape(b * two_n, -1)
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
            embs["joint"] = MultiModalFusion(len(self.modules), dtype=self.dtype,
                                             name="fusion")(
                [embs[m] for m in self.modules])
        return embs
