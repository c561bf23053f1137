"""Object-compaction equivalence: compacted point encoding == full encoding."""

import numpy as np
import pytest

import jax

from sgaligner_tpu.data.batch import BatchSpec
from sgaligner_tpu.data.synthetic import make_synthetic_batch
from sgaligner_tpu.models.sg_aligner import MultiModalEncoder
from sgaligner_tpu.parallel.mesh import validate_compact_bound

SPEC = BatchSpec(batch_size=3, max_objects=24, points_per_object=32)
MODULES = ("point", "gat", "rel", "attr")


def test_compacted_equals_full():
    batch = make_synthetic_batch(SPEC, seed=0)
    # fixtures generate 6-20 objects/graph (<=40/pair); 48 slots -> compact 40
    full = MultiModalEncoder(modules=MODULES, compact_slots=0)
    comp = MultiModalEncoder(modules=MODULES, compact_slots=40)
    params = full.init(jax.random.key(0), batch, train=False)
    e_full = full.apply(params, batch, train=False)
    e_comp = comp.apply(params, batch, train=False)

    mask = batch["obj_mask"].reshape(-1)
    for key in ("point", "joint"):
        a = np.asarray(e_full[key])[mask]
        b = np.asarray(e_comp[key])[mask]
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # padded slots produce zeros in the compacted point embedding
    assert not np.asarray(e_comp["point"])[~mask].any()


def test_compaction_gradients_match():
    import jax.numpy as jnp

    from sgaligner_tpu.ops.objective import init_loss_params, overall_loss

    batch = make_synthetic_batch(SPEC, seed=1)
    loss_params = init_loss_params(4)

    def loss_for(model):
        def f(params):
            embs = model.apply(params, batch, train=False)
            return overall_loss(embs, batch, loss_params, MODULES)["loss"]
        return f

    full = MultiModalEncoder(modules=MODULES, compact_slots=0)
    comp = MultiModalEncoder(modules=MODULES, compact_slots=40)
    params = full.init(jax.random.key(0), batch, train=False)
    lf, gf = jax.value_and_grad(loss_for(full))(params)
    lc, gc = jax.value_and_grad(loss_for(comp))(params)
    np.testing.assert_allclose(float(lf), float(lc), rtol=1e-5)
    # point-encoder grads must agree (padded slots contribute nothing)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=2e-4, atol=2e-5),
        gf["params"]["object_encoder"], gc["params"]["object_encoder"])


def test_compact_bound_validation():
    batch = make_synthetic_batch(SPEC, seed=2)
    validate_compact_bound(batch, 40)  # fine
    with pytest.raises(ValueError):
        validate_compact_bound(batch, 4)


def test_host_compacted_batch_equals_full():
    """Host-side compaction (obj_points_compact shipped by the loader) gives
    the same valid-slot embeddings as the full slot layout."""
    import dataclasses

    spec_c = dataclasses.replace(SPEC, compact_slots=40)
    full_batch = make_synthetic_batch(SPEC, seed=5)
    comp_batch = make_synthetic_batch(spec_c, seed=5)
    assert "obj_points_compact" in comp_batch
    assert comp_batch["obj_points_compact"].shape[1] == 40
    assert "obj_points" not in comp_batch

    model = MultiModalEncoder(modules=MODULES)
    params = model.init(jax.random.key(0), full_batch, train=False)
    e_full = model.apply(params, full_batch, train=False)
    e_comp = model.apply(params, comp_batch, train=False)
    mask = full_batch["obj_mask"].reshape(-1)
    for key in ("point", "joint"):
        np.testing.assert_allclose(np.asarray(e_full[key])[mask],
                                   np.asarray(e_comp[key])[mask],
                                   rtol=1e-5, atol=1e-6)


def test_host_compacted_overflow_raises():
    import dataclasses

    spec_c = dataclasses.replace(SPEC, compact_slots=10)
    with pytest.raises(ValueError):
        make_synthetic_batch(spec_c, seed=0)
