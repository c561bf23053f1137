#!/usr/bin/env bash
set -euo pipefail
CFG=${1:-configs/scan3r/scan3r_ground_truth.yaml}
python -m sgaligner_tpu.cli.trainval_sgaligner --config "$CFG"
