"""Failure-mode classification for the learned registration engine.

VERDICT r4 item 1b: use the per-candidate diagnostics (backend.diag,
reg/learned_batch.py stage 8) over the misses at low overlap to identify
which stage dominates — and fix THAT. Per miss pair, every retry round's
candidate set is collected and the miss is classified against gt:

  selection  — some candidate's FINAL (post-ICP) transform is a hit, but the
               fit_score argmax picked a different candidate. Fix: better
               verification scoring.
  icp        — some candidate's INIT lands inside the ICP basin
               (RRE < basin_deg, RTE < basin_m) but its refined transform is
               not a hit. Fix: ICP schedule/trims.
  generation — no candidate init anywhere near gt. Fix: matcher/superpoint
               coverage (training data, retries, more superpoints).

Usage:
  JAX_PLATFORMS=tpu,cpu python scripts/reg_diag.py --domain scene_2 \
      --overlaps 0.2 0.3 --pairs 16 --seeds 11000 22000
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EXAMPLE = "/root/reference/example_data"


def _rre_rte(gt, est):
    err = np.linalg.inv(gt) @ est
    rre = np.rad2deg(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                       -1, 1)))
    return rre, float(np.linalg.norm(err[:3, 3]))


def make_quads(domain, ov, n_pairs, seed):
    from sgaligner_tpu.reg.synthetic_pairs import make_pair, make_pair_from_cloud

    quads = []
    if domain in ("scene_1", "scene_2"):
        from sgaligner_tpu.utils.io import load_plydata_npy

        cloud = load_plydata_npy(os.path.join(EXAMPLE, domain, "data.npy"))
        for p in range(n_pairs):
            rng = np.random.default_rng((seed, int(ov * 100), p))
            quads.append(make_pair_from_cloud(rng, cloud, overlap=ov,
                                              noise=0.005, return_scene=True))
    else:
        for p in range(n_pairs):
            rng = np.random.default_rng((seed, int(ov * 100), p))
            quads.append(make_pair(rng, n_points=2048, overlap=ov,
                                   return_scene=True, kind=domain))
    return quads


def classify_pair(backend, src, ref, gt, hit_deg=5.0, hit_m=0.10,
                  basin_deg=15.0, basin_m=0.30):
    """Run all retry rounds with diagnostics; return (verdict, detail).

    verdict in {"hit", "selection", "icp", "generation"} — "hit" means the
    production retry policy itself would have succeeded."""
    from sgaligner_tpu.reg.learned_batch import register_round

    backend.diag = True
    try:
        cands, best = [], None
        for attempt in range(1 + backend.retries):
            outs = register_round(backend, [(src, ref)],
                                  seed=backend.seed + 1009 * attempt,
                                  diversify_fps=attempt > 0, pair_ids=[0])
            res = outs[0]
            if res is None:
                continue
            cands.extend(res.get("candidates", []))
            if best is None or res["fit_score"] > best["fit_score"]:
                best = res
            # production early-exit: good-enough pairs stop retrying
            if best["fit_score"] >= backend.retry_score_thresh:
                break
    finally:
        backend.diag = False
    if best is not None:
        rre, rte = _rre_rte(gt, best["estimated_transform"])
        if rre < hit_deg and rte < hit_m:
            return "hit", {}
    if not cands:
        return "generation", {"n_candidates": 0}
    final_errs = [_rre_rte(gt, c["est"]) for c in cands]
    init_errs = [_rre_rte(gt, c["init"]) for c in cands]
    hit_final = [e for e in final_errs if e[0] < hit_deg and e[1] < hit_m]
    if hit_final:
        return "selection", {"n_candidates": len(cands),
                             "best_final": min(final_errs)}
    in_basin = [e for e in init_errs if e[0] < basin_deg and e[1] < basin_m]
    if in_basin:
        return "icp", {"n_candidates": len(cands),
                       "best_init": min(init_errs),
                       "best_final": min(final_errs)}
    return "generation", {"n_candidates": len(cands),
                          "best_init": min(init_errs)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", type=str, default="checkpoints/geo_reg")
    ap.add_argument("--domain", type=str, default="scene_2")
    ap.add_argument("--overlaps", type=float, nargs="+", default=[0.2, 0.3])
    ap.add_argument("--pairs", type=int, default=16)
    ap.add_argument("--seeds", type=int, nargs="+", default=[11_000, 22_000])
    args = ap.parse_args(argv)

    from sgaligner_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from sgaligner_tpu.reg.learned import LearnedBackend

    backend = LearnedBackend(checkpoint=args.checkpoint)
    for ov in args.overlaps:
        tally = {"hit": 0, "selection": 0, "icp": 0, "generation": 0}
        details = []
        for seed in args.seeds:
            quads = make_quads(args.domain, ov, args.pairs, seed)
            for p, (src, ref, gt, _scene) in enumerate(quads):
                verdict, d = classify_pair(backend, src, ref, gt)
                tally[verdict] += 1
                if verdict != "hit":
                    details.append((seed, p, verdict, d))
                    print(f"  miss [{args.domain} ov={ov} seed={seed} "
                          f"pair={p}] {verdict}: {d}", flush=True)
        n = sum(tally.values())
        print(f"[{args.domain} ov={ov}] n={n}  " +
              "  ".join(f"{k}={v}" for k, v in tally.items()), flush=True)


if __name__ == "__main__":
    main()
