#!/usr/bin/env python
"""Pin overlap-detection and mosaicking QUALITY tables (VERDICT r4 item 5).

The reference computes overlap-detection precision/recall/F1
(inference_find_overlapper.py:75-82) and mosaicking
accuracy/completion/P/R/F1 (utils/registration.py:131-143); our CLIs run
(full-chain dress rehearsal in tests/test_full_pipeline_chain.py) but no
quality level was pinned anywhere. This script produces both tables on the
TRACKED aligner benchmark:

  1. regenerates the held-out val workspace of the aligner quality benchmark
     (scripts/aligner_artifact.py contract, seed 2002) EXTENDED with an
     equal count of non-overlapping pairs (the reference's overlapper
     fileset recipe, gen_all_pairs_fileset.py:12-53) — the first 32 pairs
     regenerate bit-identically, so the tracked aligner_full snapshot is
     evaluated in-distribution;
  2. cli/inference_find_overlapper with the tracked snapshot + the learned
     registration backend — BOTH score types (alignment score +
     registration corr score);
  3. cli/inference_mosaicking with the same snapshot + backend over the
     val scan->subscan map.

Writes checkpoints/aligner_full/downstream.json (tracked; regression test
tests/test_downstream_quality.py) and prints both tables.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import os.path as osp
import sys

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "aligner_artifact", osp.join(REPO, "scripts", "aligner_artifact.py"))
artifact = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(artifact)

MAX_SCANS = 8  # mosaicking scan budget (reference truncates to 2,
               # inference_mosaicking.py:101)


def build_overlap_workspace(ws: str) -> None:
    """The aligner-benchmark val workspace + equal-count non-overlap pairs.

    make_synthetic_workspace consumes its rng pair-by-pair, so the first
    N_VAL_PAIRS overlapping pairs are BIT-IDENTICAL to the pinned benchmark
    val workspace; the non-overlap extension only appends."""
    from sgaligner_tpu.data.fixtures import make_synthetic_workspace

    make_synthetic_workspace(
        ws, split="val", n_pairs=artifact.N_VAL_PAIRS,
        n_nonoverlap_pairs=artifact.N_VAL_PAIRS, seed=artifact.VAL_SEED,
        **artifact.BENCH)


def write_cfg(path: str, root: str) -> str:
    text = artifact.write_cfg(path, root,
                              ["point", "gat", "rel", "attr"])
    # overlap/mosaicking need the registration backend; the tracked learned
    # checkpoint is the self-contained engine (reg/learned.py)
    with open(path) as f:
        base = f.read()
    base = base.replace("tpu:", "registration: True\n"
                        "reg_model:\n"
                        "  backend: learned\n"
                        "tpu:")
    with open(path, "w") as f:
        f.write(base)
    return path


def run_cli(main_fn, argv) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main_fn(argv)
    assert rc == 0
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", default="runs/downstream_quality")
    ap.add_argument("--snapshot",
                    default=osp.join(REPO, "checkpoints", "aligner_full"))
    ap.add_argument("--max_scans", type=int, default=MAX_SCANS)
    ap.add_argument("--skip_copy", action="store_true")
    args = ap.parse_args(argv)

    from sgaligner_tpu.cli.inference_find_overlapper import main as overlap_main
    from sgaligner_tpu.cli.inference_mosaicking import main as mosaick_main

    ws = osp.join(args.workdir, "ws")
    os.makedirs(ws, exist_ok=True)
    build_overlap_workspace(ws)
    cfg_path = write_cfg(osp.join(args.workdir, "cfg.yaml"), ws)
    out_root = osp.join(args.workdir, "out")

    overlap = run_cli(overlap_main, ["--config", cfg_path,
                                     "--snapshot", args.snapshot,
                                     "--output_root", out_root])
    print("overlap detection (n = {} + {} pairs):".format(
        artifact.N_VAL_PAIRS, artifact.N_VAL_PAIRS), flush=True)
    for key in ("aligner_overlapper", "registration_overlapper"):
        m = overlap[key]
        print(f"  {key:>26}: P {m['precision']:.3f}  R {m['recall']:.3f}  "
              f"F1 {m['f1_score']:.3f}", flush=True)

    mosaick = run_cli(mosaick_main, ["--config", cfg_path,
                                     "--snapshot", args.snapshot,
                                     "--output_root", out_root,
                                     "--max_scans", str(args.max_scans)])
    print(f"mosaicking (first {args.max_scans} scans):", flush=True)
    for key, m in mosaick.items():
        if not isinstance(m, dict):
            continue
        print("  " + key + ": " + "  ".join(
            f"{k} {v:.3f}" for k, v in m.items()), flush=True)

    result = {"contract": {"bench": artifact.BENCH,
                           "val_seed": artifact.VAL_SEED,
                           "n_val_pairs": artifact.N_VAL_PAIRS,
                           "n_nonoverlap_pairs": artifact.N_VAL_PAIRS,
                           "max_scans": args.max_scans},
              "overlap": overlap, "mosaicking": mosaick}
    if not args.skip_copy:
        dst = osp.join(args.snapshot, "downstream.json")
        with open(dst, "w") as f:
            json.dump(result, f, indent=2, default=float)
        print(f"tables -> {dst}")
    with open(osp.join(args.workdir, "downstream.json"), "w") as f:
        json.dump(result, f, indent=2, default=float)
    return 0


if __name__ == "__main__":
    from sgaligner_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    raise SystemExit(main())
