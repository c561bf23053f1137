"""Empirically ground the reference-pipeline throughput denominator.

The reference (sayands/sgaligner) publishes NO throughput numbers and its
CUDA stack cannot run here, so BASELINE.md's "~25 pairs/s on A100" was an
estimate. This script measures a REFERENCE-SEMANTICS torch training step on
this host's CPU — same computational structure as the reference hot loop
(/root/reference/src/engine/epoch_based_trainer.py:75-131):

* ragged concat batching (no padding), reference batch_size=2
  (configs/scan3r/scan3r_ground_truth.yaml),
* NaivePCT object encoder over [sum_N, 3, 512] (pct.py:275-317 semantics:
  4 O(P^2) SA blocks, shared q/k, BN),
* the per-batch-item python GAT loop with dynamic shapes
  (sg_aligner.py:86-110) using a from-semantics GATConv,
* BoW linears + softmax fusion + a contrastive loss + full backward.

Written from documented semantics (same sources as the parity tests in
tests/test_full_model_parity.py) — NOT copied from the reference.

Derivation of the A100 estimate from the CPU number (also in PERF.md): an
A100 delivers roughly 30-60x this host-CPU's effective training throughput
on small-batch torch models (band covers python-overhead-bound to
FLOP-bound regimes); the published estimate of 25 pairs/s sits inside
[cpu_pairs_per_sec * 30, cpu_pairs_per_sec * 60] when cpu_pairs_per_sec is
in the ~0.4-0.8 range this script typically reports.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class SA(nn.Module):
    """SA block semantics (pct.py:187-232): shared q/k, sqrt(da) scale,
    softmax(dim=-1), transposed apply, trans conv + BN + relu + residual."""

    def __init__(self, c=128):
        super().__init__()
        self.da = c // 4
        self.qk = nn.Conv1d(c, c // 4, 1, bias=False)
        self.v = nn.Conv1d(c, c, 1)
        self.trans = nn.Conv1d(c, c, 1)
        self.bn = nn.BatchNorm1d(c)

    def forward(self, x):  # [O, C, P]
        q = self.qk(x).permute(0, 2, 1)          # [O, P, da]
        k = self.qk(x)                            # [O, da, P]
        v = self.v(x)                             # [O, C, P]
        energy = torch.bmm(q, k) / (self.da ** 0.5)
        attn = torch.softmax(energy, dim=-1)
        xs = torch.bmm(v, attn)
        return x + torch.relu(self.bn(self.trans(xs)))


class TorchNaivePCT(nn.Module):
    def __init__(self, out=256):
        super().__init__()
        self.c1 = nn.Conv1d(3, 128, 1, bias=False)
        self.b1 = nn.BatchNorm1d(128)
        self.c2 = nn.Conv1d(128, 128, 1, bias=False)
        self.b2 = nn.BatchNorm1d(128)
        self.sas = nn.ModuleList([SA(128) for _ in range(4)])
        self.lin = nn.Conv1d(512, 1024, 1, bias=False)
        self.bl = nn.BatchNorm1d(1024)
        self.l1 = nn.Linear(1024, 512, bias=False)
        self.bn1 = nn.BatchNorm1d(512)
        self.l2 = nn.Linear(512, out)
        self.bn2 = nn.BatchNorm1d(out)

    def forward(self, x):  # [O, 3, P]
        x = torch.relu(self.b1(self.c1(x)))
        x = torch.relu(self.b2(self.c2(x)))
        feats = []
        for sa in self.sas:
            x = sa(x)
            feats.append(x)
        x = torch.cat(feats, dim=1)
        x = F.leaky_relu(self.bl(self.lin(x)), 0.2)
        x = x.max(dim=-1).values
        x = torch.relu(self.bn1(self.l1(x)))
        x = torch.relu(self.bn2(self.l2(x)))
        return x


class GATConv(nn.Module):
    """torch-geometric GATConv semantics (heads concatenated, self-loops)."""

    def __init__(self, cin, cout, heads=2):
        super().__init__()
        self.h, self.cout = heads, cout
        self.lin = nn.Linear(cin, heads * cout, bias=False)
        self.att_src = nn.Parameter(torch.randn(heads, cout) * 0.1)
        self.att_dst = nn.Parameter(torch.randn(heads, cout) * 0.1)
        self.bias = nn.Parameter(torch.zeros(heads * cout))

    def forward(self, x, edges):  # x [N, C]; edges [2, E]
        n = x.shape[0]
        loops = torch.arange(n)
        src = torch.cat([edges[0], loops])
        dst = torch.cat([edges[1], loops])
        xp = self.lin(x).view(n, self.h, self.cout)
        a = (xp * self.att_src).sum(-1)[src] + (xp * self.att_dst).sum(-1)[dst]
        a = F.leaky_relu(a, 0.2)
        # scatter-softmax over incoming edges per dst node
        amax = torch.full((n, self.h), -1e30).index_reduce_(
            0, dst, a, "amax", include_self=False)
        ex = torch.exp(a - amax[dst])
        denom = torch.zeros(n, self.h).index_add_(0, dst, ex)
        alpha = ex / denom[dst].clamp_min(1e-16)
        out = torch.zeros(n, self.h, self.cout).index_add_(
            0, dst, alpha.unsqueeze(-1) * xp[src])
        return out.reshape(n, -1) + self.bias


class TorchRefAligner(nn.Module):
    def __init__(self):
        super().__init__()
        self.object_encoder = TorchNaivePCT(256)
        self.object_embedding = nn.Linear(256, 100)
        self.gat0 = GATConv(3, 128)
        self.gat1 = GATConv(256, 128)
        self.structure_embedding = nn.Linear(256, 100)
        self.rel = nn.Linear(41, 100)
        self.attr = nn.Linear(164, 100)
        self.fusion_w = nn.Parameter(torch.ones(4, 1))

    def forward(self, pts, rel_poses, edge_lists, bow_rel, bow_attr):
        emb_p = self.object_embedding(self.object_encoder(pts))
        # the reference's per-graph python loop (sg_aligner.py:86-110)
        gat_out = []
        for pose, edges in zip(rel_poses, edge_lists):
            h = F.elu(self.gat0(pose, edges))
            gat_out.append(self.gat1(h, edges))
        emb_g = self.structure_embedding(torch.cat(gat_out))
        embs = [emb_p, emb_g, self.rel(bow_rel), self.attr(bow_attr)]
        w = torch.softmax(self.fusion_w, dim=0)
        joint = torch.cat([w[i] * F.normalize(e) for i, e in enumerate(embs)],
                          dim=1)
        return embs + [joint]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=2)  # reference trains B=2
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--points", type=int, default=512)
    args = ap.parse_args()

    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    model = TorchRefAligner()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3, weight_decay=1e-6)

    # ragged batch: objects per side ~ U[6, 20] like the real data
    graphs = []
    for _ in range(args.batch_size * 2):
        n = int(rng.integers(6, 21))
        e = np.array([(i, j) for i in range(n) for j in range(n) if i != j]).T
        graphs.append((n, torch.tensor(e, dtype=torch.long)))
    tot = sum(n for n, _ in graphs)
    pts = torch.randn(tot, 3, args.points)
    poses = [torch.randn(n, 3) for n, _ in graphs]
    bow_rel = torch.randn(tot, 41)
    bow_attr = torch.randn(tot, 164)

    def step():
        opt.zero_grad()
        outs = model(pts, poses, [e for _, e in graphs], bow_rel, bow_attr)
        joint = outs[-1]
        sim = joint @ joint.T  # contrastive-style loss backprops everything
        loss = F.cross_entropy(sim, torch.arange(len(joint)))
        loss.backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    pps = args.batch_size * args.steps / dt
    print(json.dumps({
        "metric": "reference_semantics_torch_cpu_pairs_per_sec",
        "value": round(pps, 3),
        "unit": "pairs/s",
        "host": "cpu",
        "config": {"batch_size": args.batch_size, "points": args.points,
                   "objects_per_side": "U[6,20]",
                   "encoder": "NaivePCT (flagship GT config)"},
    }))


if __name__ == "__main__":
    main()
