"""Batched multi-pair registration rounds for the learned backend.

The reference's evaluator registers pair-at-a-time in a python loop — the
per-node-correspondence GeoTransformer calls are its measured eval hot spot
(/root/reference/src/engine/registration_evaluator.py:144-165, SURVEY §3.2).
This module is the TPU-first replacement: one retry ROUND over a whole pair
set runs each device stage exactly once —

  1. ONE batched FPS over every cloud in the round (ops/fps.py is mask-exact,
     so batch-common padding gives identical superpoints),
  2. ONE vmapped matcher forward (GeoRegModel) over the pair axis,
  3. ONE vmapped fine Sinkhorn over the pair axis,
  4. ONE batched RANSAC hypothesis sweep over every pair's fine+coarse
     correspondence sets (reg/ransac.py::ransac_hypotheses_batch),
  5. ONE batched trimmed-ICP schedule over every surviving (pair, candidate)
     instance (reg/icp.py::icp_refine_stages_batch);

only the cheap greedy extraction, SE(3) NMS and KD-tree verification stay on
host. On a dispatch-latency-bound link (this box's tunneled PJRT pays ~45 ms
per call) this collapses ~10 dispatches per pair x attempt into ~5 per round.

Entry point: ``LearnedBackend.register_batch`` (reg/learned.py), which owns
the score-gated retry loop; ``register_round`` here is one attempt.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import numpy as np


@contextmanager
def _timed(backend, stage: str):
    """Accumulate wall-clock per pipeline stage into backend._stage_times
    when ``backend.profile_stages`` is set (scripts/reg_profile.py). Device
    stages sync via np.asarray inside the block, so their device time is
    included in the measured wall-clock."""
    if not getattr(backend, "profile_stages", False):
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        times = getattr(backend, "_stage_times", None)
        if times is None:
            times = backend._stage_times = {}
        times[stage] = times.get(stage, 0.0) + time.perf_counter() - t0


def _pow2(n: int, lo: int) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class _NNCache:
    """Per-pair 1-NN query structure over the ref cloud, built once and
    reused across every candidate verification of the round (same tree
    choice as utils/pointcloud.get_nearest_neighbor)."""

    def __init__(self, ref_points: np.ndarray):
        from sgaligner_tpu.utils.pointcloud import _native_kdtree, cKDTree

        self._tree = (_native_kdtree(ref_points)
                      if len(ref_points) > 5000 else None)
        if self._tree is None:
            self._ctree = cKDTree(ref_points)

    def distances(self, q: np.ndarray) -> np.ndarray:
        if self._tree is not None:
            d, _ = self._tree.query(np.atleast_2d(q))
            return d
        d, _ = self._ctree.query(q, k=1)
        return d


def _fit_score(nn: _NNCache, src_points: np.ndarray, est: np.ndarray,
               voxel_size: float) -> float:
    """Fraction of src points landing on ref within 2 voxels — candidate
    verification (wrong-consensus fits score ~0)."""
    moved = src_points @ est[:3, :3].T + est[:3, 3]
    return float((nn.distances(moved) < 2.0 * voxel_size).mean())


def _topk_nms_refine(tfs: np.ndarray, scores: np.ndarray,
                     src_corr: np.ndarray, ref_corr: np.ndarray,
                     threshold: float, k: int, min_inliers: int = 3,
                     rot_deg: float = 15.0, trans: float = 0.3,
                     refine_steps: int = 3) -> list[np.ndarray]:
    """Host half of find_rigid_transforms_topk over PRECOMPUTED hypotheses:
    greedy SE(3) non-max suppression by inlier score, then inlier-reweighted
    Kabsch refinement (host f64 — the corr sets are tens of points)."""
    from sgaligner_tpu.reg.learned import weighted_kabsch
    from sgaligner_tpu.reg.ransac import _se3_distinct

    out: list[np.ndarray] = []
    for i in np.argsort(-scores):
        if scores[i] < min_inliers:
            break
        tf = np.asarray(tfs[i], np.float64)
        if not _se3_distinct(tf, out, rot_deg, trans):
            continue
        for _ in range(refine_steps):
            res = np.linalg.norm(
                src_corr @ tf[:3, :3].T + tf[:3, 3] - ref_corr, axis=-1)
            w = (res < threshold).astype(np.float64)
            if w.sum() < 3:
                break
            tf = weighted_kabsch(src_corr.astype(np.float64),
                                 ref_corr.astype(np.float64), w)
        if _se3_distinct(tf, out, rot_deg, trans) or not out:
            out.append(tf)
        if len(out) >= k:
            break
    return out


def _prep_round(backend, pairs, seed, diversify_fps: bool = False,
                pair_ids=None):
    """Stage 1: host downsample + ONE batched FPS + host patch building.
    Returns [(src_prep, ref_prep)] per pair.

    ``diversify_fps`` (retry attempts): random FPS START per cloud. When the
    downsampled clouds fit under ``max_points`` the downsample is
    deterministic, so without this, retry attempts re-run the IDENTICAL
    superpoint placement and only the RANSAC keys change — measured on the
    real example scans, where superpoint luck is the dominant failure factor
    at low overlap. The first attempt keeps start 0 (the trained placement).

    ``pair_ids`` are the pairs' STABLE identities (``register_batch`` passes
    each pair's original batch index); per-cloud randomness is keyed on them,
    not on the position within the round, so a pair's retry stream does not
    depend on which other pairs are still active."""
    import jax.numpy as jnp

    from sgaligner_tpu.ops.fps import farthest_point_sample
    from sgaligner_tpu.reg.learned import _finish_prep

    if pair_ids is None:
        pair_ids = list(range(len(pairs)))
    # Across-round cache (reset per register_batch call): when voxel
    # downsampling leaves a cloud under max_points it consumes no rng and is
    # DETERMINISTIC across retry rounds — recomputing it (and the KD-tree
    # built over it in stage 6) every round is pure host waste on retries.
    # Oversized clouds still re-subsample per round (their rng is seeded per
    # attempt), preserving the existing retry stream exactly.
    cache = getattr(backend, "_round_cache", None)
    clouds = []
    with _timed(backend, "prep.downsample"):
        from sgaligner_tpu.reg.backend import voxel_downsample

        for (src_points, ref_points), pid in zip(pairs, pair_ids):
            # one rng per pair, consumed src-then-ref — the serial path order
            rng = np.random.default_rng(seed)
            for role, pts in ((0, src_points), (1, ref_points)):
                key = ("down", pid, role)
                if cache is not None and key in cache:
                    clouds.append(cache[key])
                    continue
                c = voxel_downsample(pts.astype(np.float32),
                                     backend.voxel_size)
                if len(c) > backend.max_points:
                    # consumed rng — per-round, never cached
                    c = c[rng.choice(len(c), backend.max_points,
                                     replace=False)]
                elif cache is not None:
                    cache[key] = c
                clouds.append(c)
    g = _pow2(len(clouds), 2)
    bucket = _pow2(max(len(c) for c in clouds), 256)
    pts_pad = np.zeros((g, bucket, 3), np.float32)
    valid = np.zeros((g, bucket), bool)
    starts = np.zeros((g,), np.int32)
    for i, c in enumerate(clouds):
        pts_pad[i, : len(c)] = c
        valid[i, : len(c)] = True
        if diversify_fps and len(c):
            # empty clouds keep start 0 and fall through to the
            # too-few-superpoints None path downstream
            starts[i] = np.random.default_rng(
                (seed, pair_ids[i // 2], i % 2, 17)).integers(len(c))
    with _timed(backend, "prep.fps"):
        sp_idx = np.asarray(farthest_point_sample(
            jnp.asarray(pts_pad), backend.n_super,
            start_idx=jnp.asarray(starts), mask=jnp.asarray(valid)))
    with _timed(backend, "prep.finish"):
        preps = [_finish_prep(c, sp_idx[i], backend.n_super, backend.patch_m)
                 for i, c in enumerate(clouds)]
    return [(preps[2 * i], preps[2 * i + 1]) for i in range(len(pairs))]


def register_round(backend, pairs, seed: int,
                   diversify_fps: bool = False,
                   pair_ids=None) -> list[dict | None]:
    """One registration attempt over ``pairs`` (list of (src, ref) arrays),
    every device stage batched. Returns one result dict (with fit_score) or
    None per pair. ``pair_ids`` (default: positional) key each pair's
    randomness so results don't depend on which other pairs share the round."""
    import jax

    from sgaligner_tpu.reg.learned import (
        extract_correspondences,
        extract_fine_correspondences,
        weighted_kabsch,
    )
    from sgaligner_tpu.reg.ransac import ransac_hypotheses_batch

    n_pairs = len(pairs)
    if n_pairs == 0:
        return []
    if pair_ids is None:
        pair_ids = list(range(n_pairs))
    preps = _prep_round(backend, pairs, seed, diversify_fps=diversify_fps,
                        pair_ids=pair_ids)

    # ---- stage 2: matcher forward, one vmapped dispatch (pad B to pow2 by
    # repeating pair 0; extras dropped on host)
    b = _pow2(n_pairs, 1)

    def stack(side, key):
        return np.stack([preps[min(i, n_pairs - 1)][side][key]
                         for i in range(b)])

    with _timed(backend, "matcher"):
        out = backend._apply_batch(
            stack(0, "sp"), stack(1, "sp"), stack(0, "inv"), stack(1, "inv"),
            stack(0, "eig"), stack(1, "eig"), stack(0, "pmask"),
            stack(1, "pmask"), stack(0, "mask"), stack(1, "mask"))
        out = jax.tree.map(np.asarray, out)

    # ---- stage 3: coarse extraction (host, per pair)
    with _timed(backend, "coarse_extract"):
        coarse = []
        for i in range(n_pairs):
            src, ref = preps[i]
            if src["mask"].sum() < 4 or ref["mask"].sum() < 4:
                coarse.append(None)
                continue
            coarse.append(extract_correspondences(
                {"log_assign": out["log_assign"][i]}, src, ref,
                backend.top_pairs))

    # ---- stage 4: fine Sinkhorn, one vmapped dispatch over pairs with
    # coarse correspondences
    fine_results: list[tuple | None] = [None] * n_pairs
    act = [i for i in range(n_pairs) if coarse[i] is not None]
    if backend.fine and act:
        bf = _pow2(len(act), 1)
        rows = act + [act[-1]] * (bf - len(act))
        pad_pairs = np.zeros((bf, backend.top_pairs, 2), np.int32)
        for r, i in enumerate(rows):
            idx_pairs = coarse[i][3]
            pad_pairs[r, : len(idx_pairs)] = idx_pairs
        with _timed(backend, "fine.device"):
            fla = np.asarray(backend._fine_assign_batch(
                out["src_pf"][rows], out["ref_pf"][rows],
                np.stack([preps[i][0]["pmask"] for i in rows]),
                np.stack([preps[i][1]["pmask"] for i in rows]),
                pad_pairs, out["fine_temp"][rows], out["fine_alpha"][rows]))
        with _timed(backend, "fine.extract"):
            for r, i in enumerate(rows[: len(act)]):
                fine = extract_fine_correspondences(
                    fla[r], pad_pairs[r], len(coarse[i][3]), preps[i][0],
                    preps[i][1], backend.fine_score_thresh)
                if (fine is not None
                        and len(fine[0]) >= backend.min_fine_corrs):
                    fine_results[i] = fine

    # ---- stage 5: RANSAC hypotheses over every (pair, corr-set) instance,
    # one batched dispatch. Each instance's PRNG key is derived from
    # (seed, stable pair id, role) via fold_in, so a pair's sampling stream
    # is independent of the batch composition and instances never share keys.
    instances = []   # (pair_idx, role, src_corr, ref_corr, thresh, corrs)
    for i in act:
        src_c, ref_c, scores, _ = coarse[i]
        fine = fine_results[i]
        if fine is not None:
            f_thresh = max(1.5 * backend.voxel_size, 0.075)
            instances.append((i, 0, fine[0], fine[1], f_thresh, fine))
        instances.append((i, 1, src_c, ref_c, backend.inlier_thresh,
                          (src_c, ref_c, scores)))
    hyps_per_pair: dict[int, list] = {i: [] for i in act}
    if instances:
        gi = _pow2(len(instances), 1)
        nc = _pow2(max(len(inst[2]) for inst in instances), 64)
        src_p = np.zeros((gi, nc, 3), np.float32)
        ref_p = np.zeros((gi, nc, 3), np.float32)
        mask_p = np.zeros((gi, nc), bool)
        thr = np.full((gi,), 0.03, np.float32)
        for r, (_, _role, sc, rc, t, _c) in enumerate(instances):
            src_p[r, : len(sc)] = sc
            ref_p[r, : len(rc)] = rc
            mask_p[r, : len(sc)] = True
            thr[r] = t
        base = jax.random.key(np.uint32(seed))
        keys = jax.numpy.stack(
            [jax.random.fold_in(jax.random.fold_in(base, pair_ids[inst[0]]),
                                inst[1])
             for inst in instances]
            + [base] * (gi - len(instances)))
        with _timed(backend, "ransac.device"):
            tfs, scores_h = ransac_hypotheses_batch(
                src_p, ref_p, mask_p, keys, thr, iters=1000)
            tfs = np.asarray(tfs)
            scores_h = np.asarray(scores_h)
        with _timed(backend, "ransac.nms"):
            for r, (i, _role, sc, rc, t, corrs) in enumerate(instances):
                for tf in _topk_nms_refine(tfs[r], scores_h[r], sc, rc, t,
                                           k=backend.hypotheses):
                    hyps_per_pair[i].append((tf, corrs))

    # ---- stage 6: pre-score (host KD-tree, cached per pair) and candidate
    # selection for the ICP budget
    with _timed(backend, "verify.tree_build"):
        cache = getattr(backend, "_round_cache", None)
        nns = {}
        for i in act:
            nn_key = ("nn", pair_ids[i])
            if cache is not None and ("down", pair_ids[i], 1) in cache:
                # ref cloud is deterministic across rounds -> tree reusable
                if nn_key not in cache:
                    cache[nn_key] = _NNCache(preps[i][1]["points"])
                nns[i] = cache[nn_key]
            else:
                nns[i] = _NNCache(preps[i][1]["points"])
    with _timed(backend, "verify.prescore"):
        cands: dict[int, list] = {}
        for i in act:
            hyps = hyps_per_pair[i]
            if not hyps:
                src_c, ref_c, scores, _ = coarse[i]
                hyps = [(weighted_kabsch(src_c, ref_c, scores),
                         (src_c, ref_c, scores))]
            hyps = sorted(
                hyps, key=lambda h: -_fit_score(nns[i], preps[i][0]["points"],
                                                h[0], backend.voxel_size))
            cands[i] = hyps[: backend.max_refine]

    # ---- stage 7: trimmed-ICP schedule over every (pair, candidate)
    # instance, one batched dispatch. Wide->tight trims: the wide pass pulls
    # a decimeter-off init into the basin; the tight pass stops non-overlap
    # points from biasing the translation.
    flat = [(i, c) for i in act for c in range(len(cands[i]))]
    if backend.refine_icp and flat:
        from sgaligner_tpu.reg.icp import icp_refine_stages_batch

        g2 = _pow2(len(flat), 1)
        sb = _pow2(max(len(preps[i][0]["points"]) for i, _ in flat), 64)
        rb = _pow2(max(len(preps[i][1]["points"]) for i, _ in flat), 64)
        src_p = np.zeros((g2, sb, 3), np.float32)
        ref_p = np.zeros((g2, rb, 3), np.float32)
        src_m = np.zeros((g2, sb), bool)
        ref_m = np.zeros((g2, rb), bool)
        inits = np.tile(np.eye(4, dtype=np.float32), (g2, 1, 1))
        # correspondence anchor springs per candidate (see reg/icp.py
        # docstring — the planar-sliding fix); weight-0 rows are padding
        frac = float(getattr(backend, "icp_anchor_frac", 0.15))
        pb = _pow2(max((len(cands[i][c][1][0]) for i, c in flat),
                       default=1), 16) if frac > 0 else 0
        if frac > 0:
            a_src = np.zeros((g2, pb, 3), np.float32)
            a_ref = np.zeros((g2, pb, 3), np.float32)
            a_w = np.zeros((g2, pb), np.float32)
        for r, (i, c) in enumerate(flat):
            sp, rp = preps[i][0]["points"], preps[i][1]["points"]
            src_p[r, : len(sp)] = sp
            ref_p[r, : len(rp)] = rp
            src_m[r, : len(sp)] = True
            ref_m[r, : len(rp)] = True
            inits[r] = np.asarray(cands[i][c][0], np.float32)
            if frac > 0:
                # anchor ONLY to the matches this candidate's init already
                # agrees with: at low overlap the raw corr set is majority
                # outliers and anchoring to its weighted consensus drags the
                # solution (measured: scene_2 0.3 band 21/32 -> 6/32 hits)
                cs, cr, cw = cands[i][c][1]
                init = np.asarray(cands[i][c][0], np.float64)
                res = np.linalg.norm(
                    cs @ init[:3, :3].T + init[:3, 3] - cr, axis=-1)
                gate = res < max(1.5 * backend.voxel_size, 0.075)
                a_src[r, : len(cs)] = cs
                a_ref[r, : len(cr)] = cr
                a_w[r, : len(cw)] = np.maximum(cw, 0.0) * gate
        trims = np.array([6.0, 2.0, 1.0], np.float32) * backend.voxel_size
        with _timed(backend, "icp.device"):
            anchors = ((a_src, a_ref, a_w) if frac > 0
                       else (None, None, None))
            refined = np.asarray(icp_refine_stages_batch(
                src_p, ref_p, src_m, ref_m, inits, trims, *anchors,
                anchor_frac=frac, iters=10))
        ests = {fc: np.asarray(refined[r], np.float64)
                for r, fc in enumerate(flat)}
    else:
        ests = {(i, c): np.asarray(cands[i][c][0], np.float64)
                for i, c in flat}

    # ---- stage 8: final verification, best candidate per pair
    results: list[dict | None] = [None] * n_pairs
    diag = bool(getattr(backend, "diag", False))
    t8 = time.perf_counter()
    for i in act:
        best = None
        rows = []
        for c in range(len(cands[i])):
            est = ests[(i, c)]
            score = _fit_score(nns[i], preps[i][0]["points"], est,
                               backend.voxel_size)
            if diag:
                rows.append({"est": est,
                             "init": np.asarray(cands[i][c][0], np.float64),
                             "fit_score": score})
            if best is None or score > best[0]:
                best = (score, est, cands[i][c][1])
        if best is None:
            continue
        score, est, (src_c, ref_c, scores) = best
        results[i] = {
            "estimated_transform": est,
            "src_corr_points": src_c,
            "ref_corr_points": ref_c,
            "corr_scores": scores,
            "fit_score": score,
        }
        if diag:
            results[i]["candidates"] = rows
    if getattr(backend, "profile_stages", False):
        times = getattr(backend, "_stage_times", None) or {}
        times["verify.final"] = (times.get("verify.final", 0.0)
                                 + time.perf_counter() - t8)
        backend._stage_times = times
    return results
