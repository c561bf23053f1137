#!/usr/bin/env bash
set -euo pipefail
CFG=${1:-configs/scan3r/scan3r_ground_truth.yaml}
SNAPSHOT=${2:-output/Scan3R/sgaligner/point_gat_rel_attr/snapshots/best_snapshot}
python -m sgaligner_tpu.cli.inference_align_reg --config "$CFG" --snapshot "$SNAPSHOT"
