"""Held-out synthetic evaluation of the learned registration backend.

Produces the reference README table's metric set — CD / RRE / RTE / FMR / RR
(/root/reference/README.md:182-188, computed as in
/root/reference/src/engine/registration_evaluator.py:47-56) — plus
recall@(5 deg, 10 cm), on HELD-OUT synthetic pairs (seeds disjoint from
reg/train_geo.py's ``(seed, step)`` streams) swept across overlap bands.
This is the quality gate for the self-contained learned engine: the
reference's own numbers rest on real 3RScan data that is not available here,
so the synthetic sweep is the comparable in-repo signal (PARITY.md).

CLI: ``python -m sgaligner_tpu.reg.eval_geo --checkpoint checkpoints/geo_reg``
"""

from __future__ import annotations

import numpy as np

from sgaligner_tpu.reg.metrics import (
    compute_inlier_ratio,
    compute_modified_chamfer_distance,
    compute_registration_error,
    compute_registration_rmse,
)
from sgaligner_tpu.reg.synthetic_pairs import make_pair
from sgaligner_tpu.utils.pointcloud import apply_transform, get_nearest_neighbor


def gt_point_corrs(src, ref, gt, radius: float = 0.02):
    """GT correspondences between the crops (host numpy).

    Synthetic src/ref are crops of the SAME scene cloud, so overlap points
    coincide up to the added noise; NN within ``radius`` after warping src by
    gt recovers them (the compute_pcl_overlap role, reference
    inference_align_reg.py:170-171)."""
    src_w = apply_transform(src, gt)
    d, idx = get_nearest_neighbor(src_w, ref, return_index=True)
    sel = d < radius
    return src[sel], ref[idx[sel]]


def metrics_for_pair(out, src, ref, gt, scene, ir_thresh: float = 0.05,
                     rmse_thresh: float = 0.2):
    """Metric dict for one registered pair (None if the backend declined)."""
    if out is None:
        return None
    est = out["estimated_transform"]
    gt_src_c, gt_ref_c = gt_point_corrs(src, ref, gt)
    cd = compute_modified_chamfer_distance(src, ref, scene, est, gt)
    ir = compute_inlier_ratio(out["ref_corr_points"], out["src_corr_points"],
                              gt)
    rre, rte = compute_registration_error(gt, est)
    rmse = compute_registration_rmse(gt_ref_c, gt_src_c, est)
    return {
        "CD": cd, "IR": ir, "RRE": rre, "RTE": rte,
        "FMR": float(ir >= ir_thresh), "RR": float(rmse < rmse_thresh),
        "hit": float(rre < 5.0 and rte < 0.10),
        "n_corrs": len(out["corr_scores"]),
    }


def evaluate_pair(backend, src, ref, gt, scene, ir_thresh: float = 0.05,
                  rmse_thresh: float = 0.2):
    """Register + metric dict for one pair (None if the backend declines)."""
    return metrics_for_pair(backend.register(src, ref), src, ref, gt, scene,
                            ir_thresh, rmse_thresh)


def _register_all(backend, quads):
    """Register [(src, ref, gt, scene)] — one batched call when the backend
    supports it (LearnedBackend.register_batch: one device dispatch per
    stage per retry round for the whole band)."""
    if hasattr(backend, "register_batch"):
        return backend.register_batch([(s, r) for s, r, _, _ in quads])
    return [backend.register(s, r) for s, r, _, _ in quads]


def _evaluate_band(backend, quads, ov, verbose):
    outs = _register_all(backend, quads)
    rows, fails = [], 0
    for out, (src, ref, gt, scene) in zip(outs, quads):
        r = metrics_for_pair(out, src, ref, gt, scene)
        if r is None:
            fails += 1
        else:
            rows.append(r)
    # error means over REGISTERED-AND-HIT pairs ("typical" quality)
    return _aggregate(rows, fails, len(quads), ov, verbose)


def evaluate(backend, overlaps=(0.3, 0.4, 0.5, 0.6), n_pairs: int = 8,
             seed: int = 777_000, n_points: int = 2048,
             scene_kind: str = "patches", verbose: bool = True):
    """Sweep overlap bands; returns {overlap: {metric: mean}} (failed
    registrations count 0 toward FMR/RR/hit and are excluded from the
    error means)."""
    results = {}
    for ov in overlaps:
        quads = []
        for p in range(n_pairs):
            rng = np.random.default_rng((seed, int(ov * 100), p))
            quads.append(make_pair(rng, n_points=n_points, overlap=ov,
                                   return_scene=True, kind=scene_kind))
        results[ov] = _evaluate_band(backend, quads, ov, verbose)
    return results


def evaluate_cloud(backend, cloud, overlaps=(0.3, 0.4, 0.5, 0.6),
                   n_pairs: int = 8, seed: int = 555_000,
                   noise: float = 0.005, verbose: bool = True):
    """The same overlap-band sweep over crops of a PROVIDED cloud (e.g. the
    reference's real example_data scans) via ``make_pair_from_cloud`` —
    quality on real scan geometry rather than the synthetic generator."""
    from sgaligner_tpu.reg.synthetic_pairs import make_pair_from_cloud

    results = {}
    for ov in overlaps:
        quads = []
        for p in range(n_pairs):
            rng = np.random.default_rng((seed, int(ov * 100), p))
            quads.append(make_pair_from_cloud(
                rng, cloud, overlap=ov, noise=noise, return_scene=True))
        results[ov] = _evaluate_band(backend, quads, ov, verbose)
    return results


def _aggregate(rows, fails, n_pairs, ov, verbose):
    agg = {}
    for k in ("CD", "IR", "RRE", "RTE", "n_corrs"):
        vals = [r[k] for r in rows]
        agg[k] = float(np.mean(vals)) if vals else float("nan")
    n = max(n_pairs, 1)
    for k in ("FMR", "RR", "hit"):
        agg[k] = float(sum(r[k] for r in rows)) / n
    hits = [r for r in rows if r["hit"]]
    agg["RRE_hit"] = float(np.mean([r["RRE"] for r in hits])) if hits else float("nan")
    agg["RTE_hit"] = float(np.mean([r["RTE"] for r in hits])) if hits else float("nan")
    agg["hits"] = int(sum(r["hit"] for r in rows))
    agg["n"] = n_pairs
    agg["fails"] = fails
    if verbose:
        print(f"overlap {ov:.1f}: hit {agg['hits']}/{n_pairs}  "
              f"CD {agg['CD']:.4f}  RRE {agg['RRE']:.2f}deg  "
              f"RTE {agg['RTE'] * 100:.1f}cm  FMR {agg['FMR']:.2f}  "
              f"RR {agg['RR']:.2f}  "
              f"(hit-only RRE {agg['RRE_hit']:.2f} RTE "
              f"{agg['RTE_hit'] * 100:.1f}cm, corrs {agg['n_corrs']:.0f})",
              flush=True)
    return agg


def main(argv=None):
    import argparse

    from sgaligner_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", type=str, default="checkpoints/geo_reg")
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--seed", type=int, default=777_000)
    ap.add_argument("--overlaps", type=float, nargs="+",
                    default=[0.3, 0.4, 0.5, 0.6])
    ap.add_argument("--no_fine", action="store_true",
                    help="disable the fine point-matching stage (ablation)")
    ap.add_argument("--scene_kind", type=str, default="patches",
                    choices=["patches", "room", "mix", "patches+rough", "room+rough", "mix+rough"])
    ap.add_argument("--cloud", type=str, default=None,
                    help="structured data.npy scan: evaluate on crops of this"
                         " REAL cloud instead of synthetic scenes")
    args = ap.parse_args(argv)

    from sgaligner_tpu.reg.learned import LearnedBackend

    be = LearnedBackend(checkpoint=args.checkpoint, fine=not args.no_fine)
    if args.cloud:
        from sgaligner_tpu.utils.io import load_plydata_npy

        cloud = load_plydata_npy(args.cloud)
        evaluate_cloud(be, cloud, overlaps=tuple(args.overlaps),
                       n_pairs=args.pairs, seed=args.seed)
    else:
        evaluate(be, overlaps=tuple(args.overlaps), n_pairs=args.pairs,
                 seed=args.seed, scene_kind=args.scene_kind)


if __name__ == "__main__":
    main()
