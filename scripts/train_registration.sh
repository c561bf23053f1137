#!/usr/bin/env bash
# Train the self-contained learned registration backend on synthetic rigid
# pairs and write the checkpoint consumed by `reg_model.backend: learned`.
set -e
cd "$(dirname "$0")/.."
python -m sgaligner_tpu.reg.train_geo --steps "${1:-1600}" \
    --out "${2:-checkpoints/geo_reg}"
