"""Serving-path benchmark: alignment inference throughput (pairs/s).

Measures the PCT flagship eval/serving path two ways:

* ``dispatch``: one jitted eval program per batch, host loop — what a naive
  serving loop does. Over this box's tunneled PJRT backend a single dispatch
  costs ~45 ms wall regardless of batch size, so this measures the TUNNEL,
  not the TPU (PERF.md "Inference/serving", round 3).
* ``queued``: N distinct batches stacked on device, ONE dispatch running a
  ``lax.scan`` over them — the TPU-native serving design (device-side batch
  queue). Each iteration consumes a different batch (no XLA loop-invariant
  hoisting) and emits the per-pair metric components; wall time / (N*B) is an
  honest per-pair number.

The serving step is ``make_serving_step`` (engine/train_step.py): forward +
joint-embedding sim matrices + rank/metric components, NO loss computation
and NO batch-stat plumbing.

With ``--dp N`` the queue is built from per-shard pooled batches and the
pair axis is sharded over an N-device mesh (GSPMD serving; on this box only
dp=1 is measurable — one real chip — but the same path is dp=8-tested on the
virtual CPU mesh, tests/test_serving.py).

Usage: python scripts/bench_serving.py [--batch 64] [--queue 8] [--modules pct] [--dp 1]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(modules, batch_size, bucket, dp=1):
    import optax

    from sgaligner_tpu.core.config import make_cfg
    from sgaligner_tpu.data.batch import (BatchSpec, pool_compact,
                                          pool_compact_sharded)
    from sgaligner_tpu.data.synthetic import make_synthetic_batch
    from sgaligner_tpu.engine.factory import build_model
    from sgaligner_tpu.engine.train_step import (create_train_state,
                                                 make_serving_step)
    from sgaligner_tpu.ops.objective import init_loss_params

    cfg = make_cfg(model_name="sgaligner", modules=list(modules))
    cfg.tpu.max_objects = 32
    cfg.tpu.points_per_object = 512
    cfg.tpu.compute_dtype = "bfloat16"
    spec = BatchSpec(batch_size=batch_size, max_objects=32,
                     points_per_object=512)

    def make(seed):
        host = {k: np.asarray(v)
                for k, v in make_synthetic_batch(spec, seed=seed).items()}
        if dp > 1:
            return pool_compact_sharded(host, bucket=bucket, dp=dp)
        return pool_compact(host, bucket=bucket)

    model = build_model(cfg)
    b0 = {k: jax.device_put(v) for k, v in make(0).items()}
    state = create_train_state(model, optax.adam(1e-3), b0,
                               init_loss_params(len(modules)),
                               jax.random.key(0))
    step = make_serving_step(model, tuple(modules))
    return model, state, step, make


def bench(modules=("pct", "gat", "rel", "attr"), batch_size=64, queue=8,
          bucket=128, reps=4, dp=1):
    from sgaligner_tpu.data.batch import stack_queue
    from sgaligner_tpu.engine.train_step import make_serving_queue
    from sgaligner_tpu.parallel.mesh import make_mesh, replicated, shard_queue

    model, state, step, make = build(modules, batch_size, bucket, dp=dp)
    mesh = make_mesh(dp) if dp > 1 else None
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))

    # --- per-dispatch path
    b = {k: jax.device_put(v) for k, v in make(1).items()}
    out = step(state.params, state.batch_stats, b)
    float(jax.device_get(out["rr_sum"]))
    t_best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = step(state.params, state.batch_stats, b)
        float(jax.device_get(out["rr_sum"]))
        t_best = min(t_best, time.perf_counter() - t0)
    disp = {"ms_per_batch": round(t_best * 1e3, 2),
            "pairs_per_sec": round(batch_size / t_best, 1)}

    # --- queued path: scan over `queue` DISTINCT stacked batches
    # (engine/train_step.py::make_serving_queue — the first-class API)
    batches = [make(100 + i) for i in range(queue)]
    stacked = stack_queue(batches, dp=dp)
    if mesh is not None:
        stacked = shard_queue(stacked, mesh)
    else:
        stacked = {k: jax.device_put(v) for k, v in stacked.items()}
    run_queue = make_serving_queue(model, tuple(modules))

    float(jax.device_get(run_queue(state.params, state.batch_stats,
                                   stacked)["rr_sum"]))
    t_best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run_queue(state.params, state.batch_stats, stacked)
        float(jax.device_get(out["rr_sum"]))
        t_best = min(t_best, time.perf_counter() - t0)
    per_batch = t_best / queue
    queued = {"ms_per_batch": round(per_batch * 1e3, 2),
              "pairs_per_sec": round(batch_size / per_batch, 1)}

    return {"modules": "_".join(modules), "batch_size": batch_size,
            "queue": queue, "bucket": bucket, "dp": dp,
            "dispatch": disp, "queued": queued}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--queue", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--modules", type=str, default="pct",
                    choices=["pct", "point"])
    ap.add_argument("--dp", type=int, default=1)
    args = ap.parse_args()
    modules = (args.modules, "gat", "rel", "attr")
    print(json.dumps(bench(modules, args.batch, args.queue, args.bucket,
                           dp=args.dp)))


if __name__ == "__main__":
    main()
