#!/usr/bin/env bash
# Full offline pipeline: raw 3RScan -> subscans -> preprocessed graphs
# (reference scripts/generate_subscans_scan3r_gt.sh equivalent)
set -euo pipefail
CFG=${1:-configs/scan3r/scan3r_ground_truth.yaml}

python -m sgaligner_tpu.cli.generate_subscans --config "$CFG" --split train
python -m sgaligner_tpu.cli.generate_subscans --config "$CFG" --split val

python -m sgaligner_tpu.cli.preprocess --config "$CFG" --split train
python -m sgaligner_tpu.cli.preprocess --config "$CFG" --split val
