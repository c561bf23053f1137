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

Usage: python scripts/bench_serving.py [--batch 64] [--queue 8] [--modules pct]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(modules, batch_size, bucket):
    import optax

    from sgaligner_tpu.core.config import make_cfg
    from sgaligner_tpu.data.batch import BatchSpec, pool_compact
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
        return pool_compact(host, bucket=bucket)

    model = build_model(cfg)
    b0 = {k: jax.device_put(v) for k, v in make(0).items()}
    state = create_train_state(model, optax.adam(1e-3), b0,
                               init_loss_params(len(modules)),
                               jax.random.key(0))
    step = make_serving_step(model, tuple(modules))
    return state, step, make


def bench(modules=("pct", "gat", "rel", "attr"), batch_size=64, queue=8,
          bucket=128, reps=4):
    state, step, make = build(modules, batch_size, bucket)

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
    batches = [make(100 + i) for i in range(queue)]
    # bucket sizes can differ per batch; pad the pooled axis to the max K
    kmax = max(bb["obj_points_pooled"].shape[0] for bb in batches)
    for bb in batches:
        k = bb["obj_points_pooled"].shape[0]
        if k < kmax:
            pad = kmax - k
            bb["obj_points_pooled"] = np.concatenate(
                [bb["obj_points_pooled"],
                 np.zeros((pad,) + bb["obj_points_pooled"].shape[1:],
                          bb["obj_points_pooled"].dtype)])
            bb["pooled_flat_idx"] = np.concatenate(
                [bb["pooled_flat_idx"], np.zeros(pad, np.int32)])
            bb["pooled_mask"] = np.concatenate(
                [bb["pooled_mask"], np.zeros(pad, bool)])
    stacked = {k: jax.device_put(np.stack([bb[k] for bb in batches]))
               for k in batches[0]}

    @jax.jit
    def run_queue(params, batch_stats, q):
        def body(carry, one):
            out = step(params, batch_stats, one)
            return carry + out["rr_sum"], None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), q)
        return acc

    float(jax.device_get(run_queue(state.params, state.batch_stats, stacked)))
    t_best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        acc = run_queue(state.params, state.batch_stats, stacked)
        float(jax.device_get(acc))
        t_best = min(t_best, time.perf_counter() - t0)
    per_batch = t_best / queue
    queued = {"ms_per_batch": round(per_batch * 1e3, 2),
              "pairs_per_sec": round(batch_size / per_batch, 1)}

    return {"modules": "_".join(modules), "batch_size": batch_size,
            "queue": queue, "bucket": bucket,
            "dispatch": disp, "queued": queued}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--queue", type=int, default=8)
    ap.add_argument("--bucket", type=int, default=128)
    ap.add_argument("--modules", type=str, default="pct",
                    choices=["pct", "point"])
    args = ap.parse_args()
    modules = (args.modules, "gat", "rel", "attr")
    print(json.dumps(bench(modules, args.batch, args.queue, args.bucket)))


if __name__ == "__main__":
    main()
