"""Vectorized alignment metrics on padded pair batches.

The reference computes MRR / Hits@K / SGAR per batch item on the host with python
rank-list surgery (list.remove + .index; /root/reference/utils/alignment.py:3-57).
Here every metric is a masked comparison-count over the per-pair similarity matrix
— one XLA program for the whole batch, no host round-trip.

Rank semantics replicate numpy stable argsort exactly: rank of candidate t in row
r = 1 + #{k valid, k≠r : sim[r,k] < sim[r,t]} + #{k valid, k≠r : sim[r,k] ==
sim[r,t] and k < t}; the self column is removed from the list first, matching
``e1_idx_rank_list.remove(e1i_idx)`` (alignment.py:7). Slot indices are
order-isomorphic to the reference's ragged indices (src block before ref block),
so tie-breaking matches.
"""

from __future__ import annotations

import jax.numpy as jnp

from sgaligner_tpu.ops.losses import l2_normalize

BIG = 1e30


def cosine_sim_matrix(emb: jnp.ndarray, obj_mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pair cosine *distance* matrix: sim = 1 - ê·êᵀ (inference_align_reg.py:127).

    emb: [B, S, D]; obj_mask: [B, S]. Invalid rows/cols are set to +BIG so they
    rank after every valid candidate; the diagonal (self) is also +BIG.
    """
    e = l2_normalize(emb, axis=-1)
    sim = 1.0 - jnp.einsum("bsd,btd->bst", e, e)
    valid2 = obj_mask[:, :, None] & obj_mask[:, None, :]
    eye = jnp.eye(sim.shape[1], dtype=bool)[None]
    return jnp.where(valid2 & ~eye, sim, BIG)


def anchor_ranks(
    sim: jnp.ndarray,          # [B, S, S] from cosine_sim_matrix
    e1i: jnp.ndarray,          # [B, A]
    e2i: jnp.ndarray,          # [B, A]
    anchor_mask: jnp.ndarray,  # [B, A]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """1-based rank of each anchor's true match. Returns (ranks [B,A], mask)."""
    rows = jnp.take_along_axis(sim, e1i[:, :, None], axis=1)            # [B, A, S]
    tvals = jnp.take_along_axis(rows, e2i[:, :, None], axis=2)          # [B, A, 1]

    s = sim.shape[1]
    col = jnp.arange(s)[None, None, :]
    is_cand = rows < BIG / 2                                            # valid, non-self
    less = (rows < tvals) & is_cand
    tie_before = (rows == tvals) & (col < e2i[:, :, None]) & is_cand
    ranks = 1 + less.sum(-1) + tie_before.sum(-1)
    return ranks, anchor_mask


def mrr_from_ranks(ranks: jnp.ndarray, mask: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(sum of reciprocal ranks, count) — aggregate across batches on the host."""
    rr = jnp.where(mask, 1.0 / ranks, 0.0)
    return rr.sum(), mask.sum()


def hits_at_k_from_ranks(
    ranks: jnp.ndarray, mask: jnp.ndarray, ks: tuple[int, ...] = (1, 2, 3, 4, 5)
) -> dict[int, tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-k (correct, total) counts — compute_hits_k (alignment.py:13-25)."""
    total = mask.sum()
    return {k: (((ranks <= k) & mask).sum(), total) for k in ks}


def top1_predictions(
    sim: jnp.ndarray, e1i: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 candidate (and its sim) per anchor row; argmin ties → lowest index."""
    rows = jnp.take_along_axis(sim, e1i[:, :, None], axis=1)            # [B, A, S]
    pred = jnp.argmin(rows, axis=-1)
    pred_sim = jnp.min(rows, axis=-1)
    return pred, pred_sim


def sgar(
    sim: jnp.ndarray,          # [B, S, S]
    e1i: jnp.ndarray, e2i: jnp.ndarray,
    anchor_mask: jnp.ndarray,  # [B, A]
) -> dict[str, jnp.ndarray]:
    """Scene-graph alignment recall — compute_sgar (alignment.py:27-57).

    Per pair: sort anchors by predicted-match confidence (ascending sim), then
    mode '2' requires the 2 most-confident... (reference quirk: np.argsort of the
    raw sim list ascending, subset = first entries, i.e. the *most similar*
    predictions), '50' the first half, '100' all — recall 1.0 iff every anchor in
    the subset is matched correctly. Returns {mode: [B] float} (callers mask out
    pairs with zero anchors).
    """
    pred, pred_sim = top1_predictions(sim, e1i)
    correct = (pred == e2i) | ~anchor_mask                               # padding ok
    key = jnp.where(anchor_mask, pred_sim, BIG)                          # invalid last
    order = jnp.argsort(key, axis=-1, stable=True)
    correct_sorted = jnp.take_along_axis(correct, order, axis=-1)        # [B, A]
    prefix_ok = jnp.cumprod(correct_sorted.astype(jnp.int32), axis=-1)   # [B, A]

    n_valid = anchor_mask.sum(-1)                                        # [B]
    a = anchor_mask.shape[1]

    def all_first(m: jnp.ndarray) -> jnp.ndarray:
        # all(correct_sorted[:m]); m==0 -> 1.0 (empty subset has no mismatch)
        idx = jnp.clip(m - 1, 0, a - 1)
        val = jnp.take_along_axis(prefix_ok, idx[:, None], axis=-1)[:, 0]
        return jnp.where(m > 0, val, 1).astype(jnp.float32)

    return {
        "2": all_first(jnp.minimum(n_valid, 2)),
        "50": all_first(n_valid // 2),
        "100": all_first(n_valid),
    }


def alignment_score(
    sim: jnp.ndarray,          # [B, S, S]
    n_src: jnp.ndarray,        # [B]
    n_ref: jnp.ndarray,        # [B]
    max_objects: int,
) -> jnp.ndarray:
    """compute_alignment_score (alignment.py:79-89): fraction of src objects whose
    top-1 match lands on the ref side, normalized by n_ref. [B] float."""
    s = sim.shape[1]
    src_rows = sim[:, :max_objects, :]                                   # [B, N, S]
    pred = jnp.argmin(src_rows, axis=-1)                                 # [B, N]
    row_valid = jnp.arange(max_objects)[None, :] < n_src[:, None]
    aligned = (pred >= max_objects) & row_valid
    return aligned.sum(-1) / jnp.maximum(n_ref, 1)


def node_corr_candidates(
    sim: jnp.ndarray, max_objects: int, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k candidates per src object — compute_node_corrs (alignment.py:59-70).

    Returns (topk indices [B, N, k], keep mask [B, N, k]) where keep requires the
    candidate to be on the ref side (slot >= N) and finite. Host code maps slots
    to object ids.
    """
    src_rows = sim[:, :max_objects, :]
    # Ascending sim == descending similarity; stable sort matches numpy argsort.
    order = jnp.argsort(src_rows, axis=-1, stable=True)[:, :, :k]        # [B, N, k]
    vals = jnp.take_along_axis(src_rows, order, axis=-1)
    keep = (order >= max_objects) & (vals < BIG / 2)
    return order, keep
