"""Throughput benchmark: subscan pairs aligned per second per chip (training).

Runs the flagship 4-modality SGAligner training step (forward + OverallLoss +
grads + Adam) at reference-realistic shapes (512 points/object, up to 32 objects
per subscan graph) on whatever accelerator jax selects, and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6). The
``vs_baseline`` denominator is an *estimate* of the reference PyTorch pipeline on
an A100: its forward python-loops 2×batch_size GATConv calls with dynamic shapes
per step (reference sg_aligner.py:86-110) and trains at batch_size=2-4; we
estimate 25 pairs/s. Marked as an estimate until an empirical A100 measurement
exists; the relative number is informational, the absolute pairs/s is the metric.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

A100_PYTORCH_PAIRS_PER_SEC_ESTIMATE = 25.0

BATCH_SIZE = 32          # pairs per step (the TPU path scales batch freely)
MAX_OBJECTS = 32
POINTS_PER_OBJECT = 512
WARMUP_STEPS = 5
BENCH_STEPS = 60


def main() -> None:
    from sgaligner_tpu.core.config import make_cfg
    from sgaligner_tpu.data.batch import BatchSpec
    from sgaligner_tpu.data.synthetic import make_synthetic_batch
    from sgaligner_tpu.engine.factory import build_model, build_optimizer
    from sgaligner_tpu.engine.train_step import create_train_state, make_train_step
    from sgaligner_tpu.ops.objective import init_loss_params

    cfg = make_cfg(model_name="sgaligner", modules=["point", "gat", "rel", "attr"])
    cfg.tpu.max_objects = MAX_OBJECTS
    cfg.tpu.points_per_object = POINTS_PER_OBJECT
    # production config: bf16 compute (f32 params/accum), fused Pallas PointNet
    cfg.tpu.compute_dtype = "bfloat16"

    spec = BatchSpec(batch_size=BATCH_SIZE, max_objects=MAX_OBJECTS,
                     points_per_object=POINTS_PER_OBJECT)
    batch = {k: jax.device_put(np.asarray(v))
             for k, v in make_synthetic_batch(spec, seed=0).items()}

    model = build_model(cfg)
    tx = build_optimizer(cfg)
    state = create_train_state(model, tx, batch, init_loss_params(4),
                               jax.random.key(0))
    step = make_train_step(model, tx, tuple(cfg.modules))

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch)
    float(jax.device_get(metrics["loss"]))

    # NOTE: time with an actual value readback, not block_until_ready — under
    # tunneled/remote PJRT backends block_until_ready can return at dispatch
    # time. Steps are chained through the donated state, so fetching the final
    # loss forces every step in the window to complete.
    t0 = time.perf_counter()
    for _ in range(BENCH_STEPS):
        state, metrics = step(state, batch)
    float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH_SIZE * BENCH_STEPS / dt
    print(json.dumps({
        "metric": "train_subscan_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_PYTORCH_PAIRS_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
