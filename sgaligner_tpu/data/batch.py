"""PairBatch — the static-shape data contract for scene-graph pairs.

The reference batches pairs by *concatenating* ragged per-pair tensors
(/root/reference/src/datasets/scan3r.py:179-209) and then python-loops over batch
items inside the model forward to slice per-graph node/edge ranges
(/root/reference/src/aligner/sg_aligner.py:86-110). That batching is hostile to XLA:
every batch has different shapes and the GAT runs 2*B separate dynamic-shape calls.

Here every scene-graph pair is padded into a fixed slot layout:

* Each pair owns ``2*N`` object slots (``N = max_objects``): slots ``[0, N)`` hold
  the source graph's objects, slots ``[N, 2N)`` the reference graph's.
* Graph structure is a dense boolean adjacency per graph (edges are near-dense in
  the data anyway: preprocessing completes the edge set with 'none' relations,
  /root/reference/preprocessing/scan3r/preprocess.py:176-182).
* Anchor/non-anchor index sets (e1i/e2i/e1j/e2j, the reference's contrastive
  loss inputs, scan3r.py:101-107) are padded index arrays + masks. Indices are
  *local* to the pair's 2N axis; flat indices into the whole batch are
  ``b * 2N + idx``.

Everything is a plain dict-of-arrays pytree → trivially shardable with
``jax.sharding`` along the leading pair axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import numpy as np


@dataclass(frozen=True)
class BatchSpec:
    """Static shape parameters of a PairBatch."""

    batch_size: int           # B — pairs per batch
    max_objects: int          # N — object slots per graph
    points_per_object: int    # P
    rel_dim: int = 41
    attr_dim: int = 164
    # Host-side object compaction: when > 0, point clouds ship as
    # obj_points_compact [compact_slots, P, 3] holding only REAL objects
    # (src then ref, in slot order) + a compact_idx slot map — the expensive
    # point encoder then never sees padded slots, and the padded [2N, P, 3]
    # array never exists (halves its HBM footprint at typical occupancy).
    # Must be >= the max real objects of any pair; pack_pair validates.
    compact_slots: int = 0

    @property
    def slots_per_pair(self) -> int:
        return 2 * self.max_objects

    @property
    def total_slots(self) -> int:
        return self.batch_size * self.slots_per_pair


# PairBatch fields (all numpy/jax arrays; leading dim B unless noted):
#   obj_points  [B, 2N, P, 3] f32 — per-object point clouds (centered)
#   obj_mask    [B, 2N]       bool — slot validity
#   bow_rel     [B, 2N, rel]  f32 — relationship BoW per object
#   bow_attr    [B, 2N, attr] f32 — attribute BoW per object
#   rel_pose    [B, 2N, 3]    f32 — relative translation to root object
#   adj         [B, 2, N, N]  bool — per-graph adjacency (directed, row=target?
#                                    see ops/gat.py: adj[g, i, j] == edge j->i)
#   e1i, e2i    [B, A]  int32 — anchor slot indices (src / ref side)
#   anchor_mask [B, A]  bool
#   e1j, e2j    [B, N]  int32 — non-anchor slot indices
#   e1j_mask, e2j_mask [B, N] bool
#   obj_ids     [B, 2N] int32 — original 3RScan object ids (0 = padding)
#   global_obj_ids [B, 2N] int32 — global category ids
#   n_src, n_ref [B] int32 — true object counts
#   overlap     [B] f32
PairBatch = dict[str, Any]


def empty_pair_sample(spec: BatchSpec) -> dict[str, np.ndarray]:
    """An all-padding single-pair sample (no leading batch dim)."""
    n, p = spec.max_objects, spec.points_per_object
    # points ship CHANNEL-FIRST [.., 3, P]: dense TPU tiling (a points-last
    # minor dim of 3 pads to 128 lanes in HBM — 43x bloat; see PERF.md)
    if spec.compact_slots > 0:
        points_fields = {
            "obj_points_compact": np.zeros((spec.compact_slots, 3, p),
                                           np.float32),
            "compact_idx": np.zeros((spec.compact_slots,), np.int32),
            "compact_mask": np.zeros((spec.compact_slots,), bool),
        }
    else:
        points_fields = {"obj_points": np.zeros((2 * n, 3, p), np.float32)}
    return {
        **points_fields,
        "obj_mask": np.zeros((2 * n,), bool),
        "bow_rel": np.zeros((2 * n, spec.rel_dim), np.float32),
        "bow_attr": np.zeros((2 * n, spec.attr_dim), np.float32),
        "rel_pose": np.zeros((2 * n, 3), np.float32),
        "adj": np.zeros((2, n, n), bool),
        "e1i": np.zeros((n,), np.int32),
        "e2i": np.zeros((n,), np.int32),
        "anchor_mask": np.zeros((n,), bool),
        "e1j": np.zeros((n,), np.int32),
        "e1j_mask": np.zeros((n,), bool),
        "e2j": np.zeros((n,), np.int32),
        "e2j_mask": np.zeros((n,), bool),
        "obj_ids": np.zeros((2 * n,), np.int32),
        "global_obj_ids": np.zeros((2 * n,), np.int32),
        "n_src": np.int32(0),
        "n_ref": np.int32(0),
        "overlap": np.float32(-1.0),
    }


def pack_pair(
    spec: BatchSpec,
    *,
    src_points: np.ndarray,      # [n_src, P, 3]
    ref_points: np.ndarray,      # [n_ref, P, 3]
    src_bow_rel: np.ndarray,     # [n_src, rel_dim]
    ref_bow_rel: np.ndarray,
    src_bow_attr: np.ndarray,    # [n_src, attr_dim]
    ref_bow_attr: np.ndarray,
    src_rel_pose: np.ndarray,    # [n_src, 3]
    ref_rel_pose: np.ndarray,
    src_edges: np.ndarray,       # [e_src, 2] local (s_idx, o_idx) pairs
    ref_edges: np.ndarray,
    e1i: np.ndarray,             # [a] anchor indices into src objects
    e2i: np.ndarray,             # [a] anchor indices into ref objects (local)
    e1j: np.ndarray,             # non-anchor src indices
    e2j: np.ndarray,             # non-anchor ref indices (local)
    src_obj_ids: np.ndarray | None = None,
    ref_obj_ids: np.ndarray | None = None,
    src_global_ids: np.ndarray | None = None,
    ref_global_ids: np.ndarray | None = None,
    overlap: float = -1.0,
) -> dict[str, np.ndarray]:
    """Pack one ragged scene-graph pair into the padded slot layout.

    All ``*_edges`` / ``e2i`` / ``e2j`` indices are local to their own graph;
    this function places the ref graph at slot offset N.
    """
    n = spec.max_objects
    n_src, n_ref = len(src_points), len(ref_points)
    if n_src > n or n_ref > n:
        raise ValueError(
            f"graph exceeds max_objects={n}: n_src={n_src}, n_ref={n_ref}; "
            f"raise cfg.tpu.max_objects"
        )
    a = len(e1i)
    if a > n:
        raise ValueError(f"too many anchors ({a} > {n})")

    out = empty_pair_sample(spec)
    src_points_cf = np.transpose(np.asarray(src_points), (0, 2, 1))
    ref_points_cf = np.transpose(np.asarray(ref_points), (0, 2, 1))
    if spec.compact_slots > 0:
        kc = spec.compact_slots
        if n_src + n_ref > kc:
            raise ValueError(
                f"pair has {n_src + n_ref} real objects > compact_slots={kc}")
        out["obj_points_compact"][:n_src] = src_points_cf
        out["obj_points_compact"][n_src : n_src + n_ref] = ref_points_cf
        out["compact_idx"][:n_src] = np.arange(n_src)
        out["compact_idx"][n_src : n_src + n_ref] = n + np.arange(n_ref)
        out["compact_mask"][: n_src + n_ref] = True
    else:
        out["obj_points"][:n_src] = src_points_cf
        out["obj_points"][n : n + n_ref] = ref_points_cf
    out["obj_mask"][:n_src] = True
    out["obj_mask"][n : n + n_ref] = True
    out["bow_rel"][:n_src] = src_bow_rel
    out["bow_rel"][n : n + n_ref] = ref_bow_rel
    out["bow_attr"][:n_src] = src_bow_attr
    out["bow_attr"][n : n + n_ref] = ref_bow_attr
    out["rel_pose"][:n_src] = src_rel_pose
    out["rel_pose"][n : n + n_ref] = ref_rel_pose

    # Dense adjacency: adj[g, tgt, src_node] — matches message flow s->o of the
    # reference edge list convention edges[:, 0]=subject, edges[:, 1]=object
    # (preprocess.py:184-193) fed to GATConv as edge_index=(source, target).
    for g, edges in ((0, src_edges), (1, ref_edges)):
        if len(edges):
            e = np.asarray(edges, np.int64)
            out["adj"][g, e[:, 1], e[:, 0]] = True

    out["e1i"][:a] = e1i
    out["e2i"][:a] = np.asarray(e2i) + n
    out["anchor_mask"][:a] = True
    j1 = len(e1j)
    out["e1j"][:j1] = e1j
    out["e1j_mask"][:j1] = True
    j2 = len(e2j)
    out["e2j"][:j2] = np.asarray(e2j) + n
    out["e2j_mask"][:j2] = True

    if src_obj_ids is not None:
        out["obj_ids"][:n_src] = src_obj_ids
    if ref_obj_ids is not None:
        out["obj_ids"][n : n + n_ref] = ref_obj_ids
    if src_global_ids is not None:
        out["global_obj_ids"][:n_src] = src_global_ids
    if ref_global_ids is not None:
        out["global_obj_ids"][n : n + n_ref] = ref_global_ids

    out["n_src"] = np.int32(n_src)
    out["n_ref"] = np.int32(n_ref)
    out["overlap"] = np.float32(overlap)
    return out


def collate(samples: list[dict[str, np.ndarray]]) -> PairBatch:
    """Stack padded single-pair samples into a batch (plain np.stack per leaf)."""
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def flat_index(batch: PairBatch, idx: np.ndarray, pair: np.ndarray) -> np.ndarray:
    """Convert per-pair slot indices to flat indices into [B*2N, ...] arrays."""
    two_n = batch["obj_mask"].shape[1]
    return pair * two_n + idx


def pad_batch_to(batch: PairBatch, target_b: int) -> PairBatch:
    """Pad the pair axis with empty pairs (for sharding-divisibility)."""
    b = batch["overlap"].shape[0]
    if b == target_b:
        return batch
    if b > target_b:
        raise ValueError(f"batch {b} > target {target_b}")
    out = {}
    for k, v in batch.items():
        pad = np.zeros((target_b - b,) + v.shape[1:], v.dtype)
        if k == "overlap":
            pad -= 1.0
        out[k] = np.concatenate([v, pad], axis=0)
    return out


def pool_compact(batch: PairBatch, bucket: int = 128) -> PairBatch:
    """Batch-POOLED object compaction: pack every real object of the whole
    batch into one flat ``[K, 3, P]`` array, K = total real objects rounded up
    to a bucket multiple (few jit variants via bucketing).

    Per-pair compaction (``compact_slots``) must bound the WORST pair; pooling
    exploits averaging across the batch instead — at typical 3RScan occupancy
    (~13 real of 32 slots per graph) the point encoder, the step's dominant
    cost, processes ~35% fewer object slots than even a tight per-pair bound
    (PERF.md). Replaces the points fields with:

    * ``obj_points_pooled`` [K, 3, P] — packed real objects (batch order),
    * ``pooled_flat_idx``   [K] int32 — flat slot index ``b * 2N + slot``,
    * ``pooled_mask``       [K] bool.

    NOT compatible with data-parallel ``shard_batch`` (K is not aligned with
    the pair axis); pool per-shard when running dp > 1.
    """
    two_n = batch["obj_mask"].shape[1]
    b = batch["obj_mask"].shape[0]
    if "obj_points_pooled" in batch:
        return batch
    if "obj_points_compact" in batch:
        cmask = np.asarray(batch["compact_mask"])
        flat = (np.arange(b)[:, None] * two_n
                + np.asarray(batch["compact_idx"]))[cmask]
        pooled = np.asarray(batch["obj_points_compact"])[cmask]
        drop = ("obj_points_compact", "compact_idx", "compact_mask")
    else:
        m = np.asarray(batch["obj_mask"])
        flat = (np.arange(b)[:, None] * two_n
                + np.arange(two_n)[None, :])[m]
        pooled = np.asarray(batch["obj_points"])[m]
        drop = ("obj_points",)

    r = len(flat)
    cap = b * two_n
    k = min(cap, max(bucket, -(-r // bucket) * bucket))
    out = {kk: v for kk, v in batch.items() if kk not in drop}
    pts = np.zeros((k,) + pooled.shape[1:], pooled.dtype)
    pts[:r] = pooled
    idx = np.zeros((k,), np.int32)
    idx[:r] = flat
    mask = np.zeros((k,), bool)
    mask[:r] = True
    out["obj_points_pooled"] = pts
    out["pooled_flat_idx"] = idx
    out["pooled_mask"] = mask
    return out


def pool_compact_sharded(batch: PairBatch, bucket: int = 128,
                         dp: int = 1) -> PairBatch:
    """Per-SHARD pooled compaction for data-parallel runs.

    Pools each contiguous block of ``B/dp`` pairs independently to one common
    bucket size K, then concatenates: row block ``[i*K, (i+1)*K)`` of the
    pooled fields references only pairs of shard i, so sharding every field
    along axis 0 over the "dp" mesh axis keeps the encoder's gather/scatter
    shard-local. ``pooled_flat_idx`` stays GLOBAL (``b * 2N + slot``) — the
    model is unchanged. The caller must pass the same ``dp`` as the mesh
    (loaders derive it from cfg.tpu.dp).
    """
    if dp <= 1:
        return pool_compact(batch, bucket)
    b = batch["obj_mask"].shape[0]
    if b % dp != 0:
        # ragged final val batch (drop_last=False): pad with empty pairs to a
        # dp multiple BEFORE pooling (the shard_batch path did the same via
        # pad_batch_to; raising here broke dp>1 validation — advisor r2)
        batch = pad_batch_to(batch, ((b + dp - 1) // dp) * dp)
        b = batch["obj_mask"].shape[0]
    two_n = batch["obj_mask"].shape[1]
    bs = b // dp
    shards = [pool_compact({k: v[i * bs:(i + 1) * bs]
                            for k, v in batch.items()}, bucket)
              for i in range(dp)]
    k = max(s["obj_points_pooled"].shape[0] for s in shards)

    def repad(s, i):
        kk = s["obj_points_pooled"].shape[0]
        pts = np.zeros((k,) + s["obj_points_pooled"].shape[1:],
                       s["obj_points_pooled"].dtype)
        pts[:kk] = s["obj_points_pooled"]
        idx = np.zeros((k,), np.int32)
        idx[:kk] = s["pooled_flat_idx"] + i * bs * two_n  # shard -> global
        mask = np.zeros((k,), bool)
        mask[:kk] = s["pooled_mask"]
        return pts, idx, mask

    parts = [repad(s, i) for i, s in enumerate(shards)]
    out = {kk: np.concatenate([s[kk] for s in shards])
           for kk in shards[0]
           if kk not in ("obj_points_pooled", "pooled_flat_idx",
                         "pooled_mask")}
    out["obj_points_pooled"] = np.concatenate([p[0] for p in parts])
    out["pooled_flat_idx"] = np.concatenate([p[1] for p in parts])
    out["pooled_mask"] = np.concatenate([p[2] for p in parts])
    return out


_POOLED_KEYS = ("obj_points_pooled", "pooled_flat_idx", "pooled_mask")


def stack_queue(batches: list[dict], dp: int = 1) -> dict:
    """Stack B-identical batches into one [Q, ...] serving-queue tree.

    The pooled-object axis K may differ per batch (bucket quantization); it is
    padded to the queue-wide max with masked-out rows. With ``dp > 1`` the
    batches came from ``pool_compact_sharded`` — rows ``[i*k, (i+1)*k)``
    belong to shard i, so padding happens PER SHARD BLOCK (a tail pad would
    shift shard boundaries and break the shard-local gather contract).
    Consumed by ``engine.train_step.make_serving_queue``; shard with
    ``parallel.mesh.shard_queue``.
    """
    out = {k: np.stack([np.asarray(b[k]) for b in batches])
           for k in batches[0] if k not in _POOLED_KEYS}
    if "obj_points_pooled" not in batches[0]:
        return out
    ks = [b["obj_points_pooled"].shape[0] for b in batches]
    for k in ks:
        if k % dp != 0:
            raise ValueError(
                f"pooled axis {k} not divisible by dp={dp}: build batches "
                "with pool_compact_sharded(dp=dp)")
    kmax = max(k // dp for k in ks)

    def pad_blocks(b):
        k = b["obj_points_pooled"].shape[0] // dp
        res = {}
        for key in _POOLED_KEYS:
            v = np.asarray(b[key]).reshape((dp, k) + b[key].shape[1:])
            pad = np.zeros((dp, kmax - k) + v.shape[2:], v.dtype)
            res[key] = np.concatenate([v, pad], axis=1).reshape(
                (dp * kmax,) + v.shape[2:])
        return res

    padded = [pad_blocks(b) for b in batches]
    for key in _POOLED_KEYS:
        out[key] = np.stack([p[key] for p in padded])
    return out
