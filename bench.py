"""Throughput benchmark: subscan pairs trained per second per chip.

Benchmarks the FLAGSHIP released configuration — the 4-modality SGAligner
with the NaivePCT encoder (``modules: ['pct','gat','rel','attr']``, the
reference's scan3r_ground_truth.yaml) — full training step (forward +
OverallLoss + grads + Adam) and reports the pairs/s as the primary metric.
The PointNet variant (``point``) is reported as a secondary field.

Pinned configuration (echoed in the JSON so round-over-round numbers are
comparable — round-1 review weak #7):
* 512 points/object (reference pc_res), 32 object slots per graph,
* synthetic occupancy: objects per side ~ U[6, 20], seed 0 (mean ~13 real of
  32 slots — matches the real-data occupancy recorded in PERF.md),
* batch-POOLED object compaction, bucket 128 (data/batch.py::pool_compact —
  the encoder sees ~896 real-object slots instead of 1280 padded ones at this
  occupancy); compact_slots=40 echoed as the per-pair fallback bound,
* bf16 compute, f32 params; B=32 pairs/step,
* 3 timed windows of 20 steps; value = median window, variance = spread.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
``vs_baseline`` divides by a 25 pairs/s estimate of the reference PyTorch
pipeline on an A100; ``scripts/bench_reference_cpu.py`` measures the
reference-semantics torch pipeline on this host's CPU to ground that
estimate (see PERF.md "Reference baseline" for the derivation).

NOTE: timings force a value readback (`float(jax.device_get(...))`) — under
tunneled PJRT backends `block_until_ready` returns at dispatch time.
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

A100_PYTORCH_PAIRS_PER_SEC_ESTIMATE = 25.0

BATCH_SIZE = 32
MAX_OBJECTS = 32
POINTS_PER_OBJECT = 512
COMPACT_SLOTS = 40
POOLED_BUCKET = 128   # batch-pooled object compaction (data/batch.py);
                      # round-4 sweep (PERF.md): 112 and 128 round to the
                      # SAME pooled axis at bench occupancy (894 real
                      # objects -> 896 slots) and 96 rounds to MORE (960,
                      # -9%) — no adaptivity win exists at these shapes
WARMUP_STEPS = 5
WINDOW_STEPS = 20
N_WINDOWS = 3


def bench_config(modules: list[str]) -> dict:
    from sgaligner_tpu.core.config import make_cfg
    from sgaligner_tpu.data.batch import BatchSpec
    from sgaligner_tpu.data.synthetic import make_synthetic_batch
    from sgaligner_tpu.engine.factory import build_model, build_optimizer
    from sgaligner_tpu.engine.train_step import create_train_state, make_train_step
    from sgaligner_tpu.ops.objective import init_loss_params

    cfg = make_cfg(model_name="sgaligner", modules=modules)
    cfg.tpu.max_objects = MAX_OBJECTS
    cfg.tpu.points_per_object = POINTS_PER_OBJECT
    cfg.tpu.compute_dtype = "bfloat16"
    cfg.tpu.compact_slots = COMPACT_SLOTS

    from sgaligner_tpu.data.batch import pool_compact

    spec = BatchSpec(batch_size=BATCH_SIZE, max_objects=MAX_OBJECTS,
                     points_per_object=POINTS_PER_OBJECT)
    host = {k: np.asarray(v) for k, v in make_synthetic_batch(spec, seed=0).items()}
    if POOLED_BUCKET:
        host = pool_compact(host, bucket=POOLED_BUCKET)
    batch = {k: jax.device_put(v) for k, v in host.items()}

    model = build_model(cfg)
    tx = build_optimizer(cfg)
    state = create_train_state(model, tx, batch, init_loss_params(len(modules)),
                               jax.random.key(0))
    step = make_train_step(model, tx, tuple(cfg.modules))

    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch)
    float(jax.device_get(metrics["loss"]))

    windows = []
    for _ in range(N_WINDOWS):
        t0 = time.perf_counter()
        for _ in range(WINDOW_STEPS):
            state, metrics = step(state, batch)
        # steps chain through the donated state; fetching the loss forces
        # every step in the window to complete
        float(jax.device_get(metrics["loss"]))
        dt = time.perf_counter() - t0
        windows.append(BATCH_SIZE * WINDOW_STEPS / dt)
    windows.sort()
    med = windows[len(windows) // 2]
    return {"pairs_per_sec": round(med, 1),
            "window_min": round(windows[0], 1),
            "window_max": round(windows[-1], 1)}


SERVING_BATCH = 512
SERVING_QUEUE = 4


def bench_serving(modules: list[str]) -> dict:
    """Queued serving path: ONE jitted lax.scan over SERVING_QUEUE distinct
    stacked batches (engine/train_step.py::make_serving_queue — forward +
    sim + rank components, no loss/batch-stat plumbing, forward-only eval
    block kernel). Per-dispatch serving is NOT measured here: over tunneled
    PJRT a dispatch costs ~45 ms wall regardless of program size (PERF.md
    "Inference / serving — round 3")."""
    import optax

    from sgaligner_tpu.core.config import make_cfg
    from sgaligner_tpu.data.batch import (BatchSpec, pool_compact,
                                          stack_queue)
    from sgaligner_tpu.data.synthetic import make_synthetic_batch
    from sgaligner_tpu.engine.factory import build_model
    from sgaligner_tpu.engine.train_step import (create_train_state,
                                                 make_serving_queue)
    from sgaligner_tpu.ops.objective import init_loss_params

    cfg = make_cfg(model_name="sgaligner", modules=modules)
    cfg.tpu.max_objects = MAX_OBJECTS
    cfg.tpu.points_per_object = POINTS_PER_OBJECT
    cfg.tpu.compute_dtype = "bfloat16"
    spec = BatchSpec(batch_size=SERVING_BATCH, max_objects=MAX_OBJECTS,
                     points_per_object=POINTS_PER_OBJECT)

    def make(seed):
        host = {k: np.asarray(v)
                for k, v in make_synthetic_batch(spec, seed=seed).items()}
        return pool_compact(host, bucket=POOLED_BUCKET)

    model = build_model(cfg)
    b0 = {k: jax.device_put(v) for k, v in make(0).items()}
    state = create_train_state(model, optax.adam(1e-3), b0,
                               init_loss_params(len(modules)),
                               jax.random.key(0))
    stacked = stack_queue([make(100 + i) for i in range(SERVING_QUEUE)])
    stacked = {k: jax.device_put(v) for k, v in stacked.items()}
    run_queue = make_serving_queue(model, tuple(modules))

    float(jax.device_get(run_queue(state.params, state.batch_stats,
                                   stacked)["rr_sum"]))
    t_best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_queue(state.params, state.batch_stats, stacked)
        float(jax.device_get(out["rr_sum"]))
        t_best = min(t_best, time.perf_counter() - t0)
    per_batch = t_best / SERVING_QUEUE
    return {"pairs_per_sec": round(SERVING_BATCH / per_batch, 1),
            "ms_per_batch": round(per_batch * 1e3, 2)}


def main() -> None:
    pct = bench_config(["pct", "gat", "rel", "attr"])
    point = bench_config(["point", "gat", "rel", "attr"])
    serving = bench_serving(["pct", "gat", "rel", "attr"])
    print(json.dumps({
        "metric": "train_pairs_per_sec_per_chip_pct_flagship",
        "value": pct["pairs_per_sec"],
        "unit": "pairs/s",
        "vs_baseline": round(pct["pairs_per_sec"]
                             / A100_PYTORCH_PAIRS_PER_SEC_ESTIMATE, 2),
        "variance_band": [pct["window_min"], pct["window_max"]],
        "point_config_pairs_per_sec": point["pairs_per_sec"],
        "point_variance_band": [point["window_min"], point["window_max"]],
        "serving_pairs_per_sec": serving["pairs_per_sec"],
        "serving_config": {"batch_size": SERVING_BATCH,
                           "queue": SERVING_QUEUE,
                           "ms_per_batch": serving["ms_per_batch"]},
        "config": {"batch_size": BATCH_SIZE, "max_objects": MAX_OBJECTS,
                   "points_per_object": POINTS_PER_OBJECT,
                   "compact_slots": COMPACT_SLOTS,
                   "pooled_bucket": POOLED_BUCKET,
                   "occupancy": "U[6,20] objects/side, seed 0",
                   "dtype": "bfloat16",
                   "windows": f"{N_WINDOWS}x{WINDOW_STEPS} steps"},
    }))


if __name__ == "__main__":
    main()
