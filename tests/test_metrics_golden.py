"""Golden tests: device metrics vs the reference's python rank-list surgery.

The goldens below implement the reference's exact algorithms
(/root/reference/utils/alignment.py:3-89, documented in SURVEY.md §2 item 24):
numpy stable argsort of each similarity row, ``list.remove(self)``, then index
arithmetic — including tie ordering. The vectorized device versions in
ops/metrics.py must agree element-for-element, including on crafted ties.
"""

import numpy as np

import jax.numpy as jnp

from sgaligner_tpu.align import alignment as host_align
from sgaligner_tpu.ops import metrics as M


def golden_rank_lists(sim_valid: np.ndarray) -> np.ndarray:
    """rank_list = argsort of each row (reference inference_align_reg.py:128)."""
    return np.argsort(sim_valid, axis=1, kind="stable")


def golden_mrr_hits(sim_valid, e1i, e2i, ks):
    rank_list = golden_rank_lists(sim_valid)
    rrs, hits = [], {k: 0 for k in ks}
    for i, r in enumerate(e1i):
        row = list(rank_list[r])
        row.remove(r)  # self removal (alignment.py:7)
        rank = row.index(e2i[i]) + 1
        rrs.append(1.0 / rank)
        for k in ks:
            hits[k] += int(e2i[i] in row[:k])
    return rrs, hits


def make_case(rng, n_src, n_ref, ties=False):
    n = n_src + n_ref
    emb = rng.normal(size=(n, 8))
    if ties:
        emb[1] = emb[0]              # duplicate rows -> exact sim ties
        emb[n_src + 1] = emb[n_src]
    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    sim = 1.0 - embn @ embn.T
    return emb.astype(np.float32), sim


def to_padded(emb, n_src, n_ref, n_max):
    """[n, d] valid-slot embedding -> padded [1, 2*n_max, d] + masks."""
    two_n = 2 * n_max
    out = np.zeros((1, two_n, emb.shape[1]), np.float32)
    out[0, :n_src] = emb[:n_src]
    out[0, n_max : n_max + n_ref] = emb[n_src:]
    mask = np.zeros((1, two_n), bool)
    mask[0, :n_src] = True
    mask[0, n_max : n_max + n_ref] = True
    return out, mask


def slot_of(i, n_src, n_max):
    return i if i < n_src else n_max + (i - n_src)


def test_ranks_match_reference_semantics():
    rng = np.random.default_rng(0)
    for ties in (False, True):
        n_src, n_ref, n_max = 6, 7, 10
        emb, sim_valid = make_case(rng, n_src, n_ref, ties=ties)
        e1i = np.array([0, 1, 2, 3])
        e2i = np.array([n_src, n_src + 1, n_src + 2, n_src + 3])
        rrs_gold, hits_gold = golden_mrr_hits(sim_valid, e1i, e2i, (1, 3, 5))

        padded, mask = to_padded(emb, n_src, n_ref, n_max)
        sim = M.cosine_sim_matrix(jnp.array(padded), jnp.array(mask))
        e1i_s = np.array([[slot_of(i, n_src, n_max) for i in e1i]])
        e2i_s = np.array([[slot_of(i, n_src, n_max) for i in e2i]])
        am = np.ones((1, 4), bool)
        ranks, _ = M.anchor_ranks(sim, jnp.array(e1i_s), jnp.array(e2i_s),
                                  jnp.array(am))
        got_rrs = (1.0 / np.asarray(ranks)[0]).tolist()
        np.testing.assert_allclose(got_rrs, rrs_gold, rtol=1e-9,
                                   err_msg=f"ties={ties}")
        hits = M.hits_at_k_from_ranks(ranks, jnp.array(am), (1, 3, 5))
        for k in (1, 3, 5):
            assert int(hits[k][0]) == hits_gold[k], f"k={k} ties={ties}"


def test_host_node_corrs_match_reference_semantics():
    """compute_node_corrs keeps top-k entries landing on the ref side
    (alignment.py:59-70); check against the rank-list construction."""
    rng = np.random.default_rng(1)
    n_src, n_ref, n_max = 5, 6, 8
    emb, sim_valid = make_case(rng, n_src, n_ref)

    # golden: rank list per src row with self removed, keep first k >= n_src
    rank_list = golden_rank_lists(sim_valid)
    k = 2
    golden = []
    for idx in range(n_src):
        row = list(rank_list[idx])
        row.remove(idx)
        for cand in row[:k]:
            if cand >= n_src:
                golden.append((idx, cand))

    padded, mask = to_padded(emb, n_src, n_ref, n_max)
    sim = np.asarray(M.cosine_sim_matrix(jnp.array(padded), jnp.array(mask)))
    got = host_align.compute_node_corrs(sim[0], n_src, n_max, k=k)
    got_valid_idx = [(a, n_src + (b - n_max)) for a, b in got]
    assert got_valid_idx == golden


def test_alignment_score_matches_reference():
    rng = np.random.default_rng(2)
    n_src, n_ref, n_max = 7, 5, 9
    emb, sim_valid = make_case(rng, n_src, n_ref)

    rank_list = golden_rank_lists(sim_valid)
    aligned = 0
    for idx in range(n_src):
        row = list(rank_list[idx])
        row.remove(idx)
        if row[0] >= n_src:
            aligned += 1
    golden = aligned / n_ref

    padded, mask = to_padded(emb, n_src, n_ref, n_max)
    sim = np.asarray(M.cosine_sim_matrix(jnp.array(padded), jnp.array(mask)))
    got = host_align.compute_alignment_score(sim[0], n_src, n_ref, n_max)
    np.testing.assert_allclose(got, golden)

    # device version agrees
    got_dev = M.alignment_score(jnp.array(sim), jnp.array([n_src]),
                                jnp.array([n_ref]), n_max)
    np.testing.assert_allclose(float(got_dev[0]), golden, rtol=1e-6)


def test_sgar_matches_reference():
    """compute_sgar (alignment.py:27-57): subsets of most-confident anchors."""
    rng = np.random.default_rng(3)
    n_src, n_ref, n_max = 6, 6, 8
    emb, sim_valid = make_case(rng, n_src, n_ref)
    e1i = np.arange(4)
    e2i = n_src + np.arange(4)

    rank_list = golden_rank_lists(sim_valid)
    pred, gt, conf = [], [], []
    for i, r in enumerate(e1i):
        row = list(rank_list[r])
        row.remove(r)
        pred.append(row[0])
        conf.append(sim_valid[r][row[0]])
        gt.append(e2i[i])
    order = np.argsort(conf, kind="stable")
    golden = {}
    for mode, m in (("2", 2), ("50", len(order) // 2), ("100", len(order))):
        subset = order[:m]
        golden[mode] = 0.0 if any(pred[j] != gt[j] for j in subset) else 1.0

    padded, mask = to_padded(emb, n_src, n_ref, n_max)
    sim = M.cosine_sim_matrix(jnp.array(padded), jnp.array(mask))
    e1i_s = np.array([[slot_of(i, n_src, n_max) for i in e1i]])
    e2i_s = np.array([[slot_of(i, n_src, n_max) for i in e2i]])
    got = M.sgar(sim, jnp.array(e1i_s), jnp.array(e2i_s),
                 jnp.ones((1, 4), bool))
    for mode in ("2", "50", "100"):
        assert float(got[mode][0]) == golden[mode], mode
