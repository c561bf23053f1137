#!/usr/bin/env python
"""Per-stage wall-clock profile of the batched registration path.

VERDICT r4 item 7: 30.4 s / 16 pairs is still host-gated — profile one
sweep's host share before optimizing. Runs the SAME 16-pair benchmark as
the round-4 batched-vs-serial measurement (patches @ 0.3/0.4, seed 555,
PERF.md "Batched multi-pair registration") with
``backend.profile_stages`` on and prints the per-stage breakdown
(reg/learned_batch.py ``_timed`` blocks; device stages sync inside their
block, so their device time is included).

Usage: python scripts/reg_profile.py [--pairs 8] [--repeat 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_quads(n_pairs: int, overlaps, seed: int):
    from sgaligner_tpu.reg.synthetic_pairs import make_pair

    quads = []
    for ov in overlaps:
        for p in range(n_pairs):
            rng = np.random.default_rng((seed, int(ov * 100), p))
            quads.append(make_pair(rng, n_points=2048, overlap=ov,
                                   return_scene=True))
    return quads


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", type=str, default="checkpoints/geo_reg")
    ap.add_argument("--pairs", type=int, default=8, help="pairs per band")
    ap.add_argument("--overlaps", type=float, nargs="+", default=[0.3, 0.4])
    ap.add_argument("--seed", type=int, default=555)
    ap.add_argument("--repeat", type=int, default=2,
                    help="timed sweeps after the warmup sweep")
    args = ap.parse_args(argv)

    from sgaligner_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    from sgaligner_tpu.reg.eval_geo import metrics_for_pair
    from sgaligner_tpu.reg.learned import LearnedBackend

    backend = LearnedBackend(checkpoint=args.checkpoint)
    quads = make_quads(args.pairs, args.overlaps, args.seed)
    pairs = [(s, r) for s, r, _, _ in quads]

    # warmup (compiles); not timed
    t0 = time.perf_counter()
    backend.register_batch(pairs)
    print(f"warmup sweep (incl. compile): {time.perf_counter() - t0:.1f}s",
          flush=True)

    backend.profile_stages = True
    backend._stage_times = {}
    walls = []
    outs = None
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        outs = backend.register_batch(pairs)
        walls.append(time.perf_counter() - t0)
    hits = sum(
        int(metrics_for_pair(o, s, r, gt, scene)["hit"])
        for o, (s, r, gt, scene) in zip(outs, quads) if o is not None)
    total = np.mean(walls)
    print(f"\n{len(pairs)} pairs, {args.repeat} timed sweeps: "
          f"wall {total:.2f}s/sweep ({total / len(pairs):.3f}s/pair), "
          f"hits {hits}/{len(pairs)}")
    times = backend._stage_times
    accounted = sum(times.values())
    print(f"{'stage':>18}  {'s/sweep':>8}  {'share':>6}")
    for k in sorted(times, key=lambda k: -times[k]):
        v = times[k] / args.repeat
        print(f"{k:>18}  {v:8.3f}  {v / total:5.1%}")
    print(f"{'accounted':>18}  {accounted / args.repeat:8.3f}  "
          f"{accounted / args.repeat / total:5.1%}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
