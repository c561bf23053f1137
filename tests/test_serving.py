"""Serving-path tests: device-side batch queue + data-parallel serving.

The reference serves alignment through a host loop over batches
(/root/reference/src/inference/sgaligner/inference_align_reg.py:98-146); the
TPU-native shape is one jitted ``lax.scan`` over a stacked queue
(engine/train_step.py::make_serving_queue), optionally GSPMD-sharded over the
"dp" mesh axis. These tests pin queue == per-batch equality and dp=8 == dp=1.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sgaligner_tpu.data.batch import (BatchSpec, pool_compact,
                                      pool_compact_sharded, stack_queue)
from sgaligner_tpu.data.synthetic import make_synthetic_batch
from sgaligner_tpu.engine.train_step import (create_train_state,
                                             make_serving_queue,
                                             make_serving_step)
from sgaligner_tpu.models.sg_aligner import MultiModalEncoder
from sgaligner_tpu.ops.objective import init_loss_params
from sgaligner_tpu.parallel.mesh import make_mesh, replicated, shard_queue

MODULES = ("point", "gat", "rel", "attr")


def _setup(batch_size=4, bucket=8, n_batches=3, dp=1):
    import optax

    spec = BatchSpec(batch_size=batch_size, max_objects=6,
                     points_per_object=16)
    raw = [
        {k: np.asarray(v)
         for k, v in make_synthetic_batch(spec, seed=50 + i).items()}
        for i in range(n_batches)
    ]
    pool = (lambda b: pool_compact_sharded(b, bucket=bucket, dp=dp)
            ) if dp > 1 else (lambda b: pool_compact(b, bucket=bucket))
    batches = [pool(b) for b in raw]
    model = MultiModalEncoder(modules=MODULES, pointnet_fused="never",
                              dtype=jnp.float32)
    state = create_train_state(model, optax.adam(1e-3), batches[0],
                               init_loss_params(len(MODULES)),
                               jax.random.key(0))
    return model, state, batches


def test_serving_queue_matches_per_batch():
    """Queue-of-3 scan == 3 individual serving dispatches (components sum,
    alignment scores stack)."""
    model, state, batches = _setup()
    step = make_serving_step(model, MODULES)
    singles = [step(state.params, state.batch_stats, b) for b in batches]

    stacked = stack_queue(batches)
    out = make_serving_queue(model, MODULES)(
        state.params, state.batch_stats, stacked)

    np.testing.assert_allclose(
        np.asarray(out["rr_sum"]),
        sum(float(s["rr_sum"]) for s in singles), rtol=1e-6)
    assert int(out["rr_count"]) == sum(int(s["rr_count"]) for s in singles)
    for k in (1, 5):
        corr = sum(int(s[f"hits@{k}"][0]) for s in singles)
        assert int(out[f"hits@{k}"][0]) == corr
    np.testing.assert_allclose(
        np.asarray(out["alignment_score"]),
        np.stack([np.asarray(s["alignment_score"]) for s in singles]),
        rtol=1e-6)


def test_serving_queue_sharded_dp_equivalence():
    """dp=8 sharded serving queue == dp=1 queue: per-shard pooled batches,
    pair axis sharded, params replicated; GSPMD inserts the metric
    all-reduces."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    dp = 8
    model, state, batches_1 = _setup(batch_size=8, dp=1)
    out_1 = make_serving_queue(model, MODULES)(
        state.params, state.batch_stats, stack_queue(batches_1))

    _, _, batches_8 = _setup(batch_size=8, dp=dp)
    mesh = make_mesh(dp)
    stacked = shard_queue(stack_queue(batches_8, dp=dp), mesh)
    state_r = jax.device_put(state, replicated(mesh))
    out_8 = make_serving_queue(model, MODULES)(
        state_r.params, state_r.batch_stats, stacked)

    np.testing.assert_allclose(np.asarray(out_8["rr_sum"]),
                               np.asarray(out_1["rr_sum"]), rtol=2e-5)
    assert int(out_8["rr_count"]) == int(out_1["rr_count"])
    for k in (1, 3, 5):
        assert int(out_8[f"hits@{k}"][0]) == int(out_1[f"hits@{k}"][0])
    np.testing.assert_allclose(np.asarray(out_8["alignment_score"]),
                               np.asarray(out_1["alignment_score"]),
                               rtol=2e-5, atol=1e-6)


def test_stack_queue_ragged_pooled_axis():
    """Batches whose bucket quantization differs pad PER SHARD BLOCK — a
    tail pad would shift shard boundaries and corrupt the shard-local
    gather contract."""
    spec = BatchSpec(batch_size=2, max_objects=6, points_per_object=16)
    a = {k: np.asarray(v)
         for k, v in make_synthetic_batch(spec, seed=1).items()}
    b = {k: np.asarray(v).copy()
         for k, v in make_synthetic_batch(spec, seed=2).items()}
    # force different occupancy -> different pooled K at the same bucket
    b["obj_mask"][:, 4:6] = False
    b["obj_mask"][:, 10:] = False
    pa = pool_compact_sharded(a, bucket=4, dp=2)
    pb = pool_compact_sharded(b, bucket=4, dp=2)
    ka = pa["obj_points_pooled"].shape[0]
    kb = pb["obj_points_pooled"].shape[0]
    assert ka != kb, "fixture failed to produce ragged pooled axes"

    stacked = stack_queue([pa, pb], dp=2)
    kq = stacked["obj_points_pooled"].shape[1]
    assert kq == max(ka, kb) and kq % 2 == 0
    # real rows survive, in order, with their global flat indices intact
    for qi, src in enumerate((pa, pb)):
        m = stacked["pooled_mask"][qi]
        assert m.sum() == src["pooled_mask"].sum()
        np.testing.assert_array_equal(
            stacked["pooled_flat_idx"][qi][m],
            src["pooled_flat_idx"][src["pooled_mask"]])
