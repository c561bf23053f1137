"""Batch-pooled object compaction (data/batch.py::pool_compact).

Pooling packs every real object of the batch into one flat axis — the point
encoder then does work proportional to ACTUAL occupancy rather than padded
slots (or a per-pair worst-case bound). These tests prove the transform is
semantics-preserving: same embeddings and same parameter gradients as the
padded path, plus shape/bucketing behavior and the dp guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgaligner_tpu.data.batch import BatchSpec, pool_compact
from sgaligner_tpu.data.synthetic import make_synthetic_batch
from sgaligner_tpu.models.sg_aligner import MultiModalEncoder
from sgaligner_tpu.ops.objective import init_loss_params, overall_loss

MODULES = ("point", "gat", "rel", "attr")


def _batch(spec, seed=0):
    return {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=seed).items()}


def test_pool_compact_shapes_and_bucketing():
    spec = BatchSpec(batch_size=3, max_objects=8, points_per_object=16)
    batch = _batch(spec)
    pooled = pool_compact(batch, bucket=16)
    r = int(batch["obj_mask"].sum())
    k = pooled["obj_points_pooled"].shape[0]
    assert k % 16 == 0 or k == 3 * 16
    assert k >= r
    assert int(pooled["pooled_mask"].sum()) == r
    assert "obj_points" not in pooled
    # flat indices point at exactly the valid slots
    flat_valid = np.flatnonzero(batch["obj_mask"].reshape(-1))
    np.testing.assert_array_equal(
        np.sort(pooled["pooled_flat_idx"][pooled["pooled_mask"]]), flat_valid)
    # points content is preserved per slot
    got = pooled["obj_points_pooled"][pooled["pooled_mask"]]
    want = batch["obj_points"].reshape(-1, *batch["obj_points"].shape[2:])[
        flat_valid[np.argsort(pooled["pooled_flat_idx"][pooled["pooled_mask"]],
                              kind="stable")]]
    # pooled order is batch order (flat idx ascending within construction)
    np.testing.assert_allclose(
        np.sort(got.reshape(len(got), -1), axis=0),
        np.sort(want.reshape(len(want), -1), axis=0))


def test_pool_compact_idempotent_and_from_per_pair_compact():
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=16,
                     compact_slots=16)
    batch = _batch(spec)
    pooled = pool_compact(batch, bucket=8)
    assert "obj_points_pooled" in pooled
    assert pool_compact(pooled, bucket=8) is pooled


def test_pooled_model_matches_padded_forward_and_grads():
    spec = BatchSpec(batch_size=2, max_objects=10, points_per_object=32)
    batch = _batch(spec, seed=3)
    pooled = pool_compact(batch, bucket=8)

    model = MultiModalEncoder(modules=MODULES, pointnet_fused="never",
                              dtype=jnp.float32)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    jp = {k: jnp.asarray(v) for k, v in pooled.items()}
    params = model.init(jax.random.key(0), jb, train=False)

    out_a = model.apply(params, jb, train=False)
    out_b = model.apply(params, jp, train=False)
    valid = np.asarray(batch["obj_mask"].reshape(-1))
    for m in (*MODULES, "joint"):
        np.testing.assert_allclose(np.asarray(out_a[m])[valid],
                                   np.asarray(out_b[m])[valid],
                                   rtol=2e-5, atol=2e-6, err_msg=m)

    lp = init_loss_params(len(MODULES))

    def loss_fn(p, b):
        embs = model.apply(p, b, train=False)
        return overall_loss(embs, b, lp, MODULES)["loss"]

    g_a = jax.grad(loss_fn)(params, jb)
    g_b = jax.grad(loss_fn)(params, jp)
    for (path, a), (_, bb) in zip(jax.tree_util.tree_leaves_with_path(g_a),
                                  jax.tree_util.tree_leaves_with_path(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   rtol=2e-4, atol=2e-5, err_msg=str(path))


def test_pooled_sharded_dp_equivalence():
    """Per-shard pooling under a dp=2 mesh: one jitted train step produces
    the same loss as the single-device pooled step."""
    import optax

    from sgaligner_tpu.data.batch import pool_compact_sharded
    from sgaligner_tpu.engine.train_step import (create_train_state,
                                                 make_train_step)
    from sgaligner_tpu.ops.objective import init_loss_params
    from sgaligner_tpu.parallel.mesh import make_mesh, replicated, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    spec = BatchSpec(batch_size=4, max_objects=6, points_per_object=16)
    batch = _batch(spec, seed=7)

    model_args = dict(modules=MODULES, pointnet_fused="never",
                      dtype=jnp.float32)
    from sgaligner_tpu.models.sg_aligner import MultiModalEncoder as MME

    def run(dp):
        model = MME(**model_args)
        if dp == 1:
            b = {k: jnp.asarray(v)
                 for k, v in pool_compact(batch, bucket=8).items()}
        else:
            mesh = make_mesh(dp)
            b = shard_batch(pool_compact_sharded(batch, bucket=8, dp=dp),
                            mesh)
        tx = optax.adam(1e-3)
        state = create_train_state(model, tx, b, init_loss_params(4),
                                   jax.random.key(0))
        if dp > 1:
            state = jax.device_put(state, replicated(mesh))
        step = make_train_step(model, tx, MODULES)
        _, metrics = step(state, b)
        return float(jax.device_get(metrics["loss"]))

    np.testing.assert_allclose(run(1), run(2), rtol=1e-5)


def test_pooled_unaligned_k_rejected_by_dp_sharding():
    from sgaligner_tpu.parallel.mesh import make_mesh, shard_batch

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    spec = BatchSpec(batch_size=4, max_objects=6, points_per_object=8)
    pooled = pool_compact(_batch(spec), bucket=8)
    # force an odd pooled axis so dp=2 cannot split it evenly
    for key in ("obj_points_pooled", "pooled_flat_idx", "pooled_mask"):
        pooled[key] = pooled[key][:-1]
    mesh = make_mesh(2)
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(pooled, mesh)
