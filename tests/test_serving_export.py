"""Exported serving artifacts (sgaligner_tpu/serving.py).

The TPU-native deployment story: the jitted serving program serialized via
``jax.export`` + trained state + shape metadata in one directory. The
reference has no counterpart (its inference rebuilds the torch model from
YAML every run); the tests pin the contract that matters for a serving
host: the artifact reproduces the in-process serving step EXACTLY, and
shape drift fails loudly at the host boundary."""

import numpy as np
import pytest

import jax

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.batch import BatchSpec
from sgaligner_tpu.data.synthetic import make_synthetic_batch
from sgaligner_tpu.engine.factory import build_model
from sgaligner_tpu.serving import (export_serving_artifact,
                                   load_serving_artifact)


def _cfg():
    cfg = make_cfg(model_name="sgaligner",
                   modules=["point", "gat", "rel", "attr"])
    cfg.tpu.max_objects = 8
    cfg.tpu.points_per_object = 32
    return cfg


def _trained_state(cfg, batch):
    model = build_model(cfg, platform="cpu")
    variables = model.init(jax.random.key(0), batch, train=False)
    return model, variables["params"], variables.get("batch_stats", {})


def test_export_roundtrip_matches_in_process(tmp_path):
    cfg = _cfg()
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=3).items()}
    model, params, stats = _trained_state(cfg, host)

    art_dir = export_serving_artifact(
        cfg, params, stats, str(tmp_path / "art"),
        batch_size=2, pooled_bucket=32, platforms=("cpu",))
    art = load_serving_artifact(art_dir)

    out = art(host)

    # in-process reference: same program, same pooled batch
    from sgaligner_tpu.engine.train_step import make_serving_step
    step = make_serving_step(model, tuple(cfg.modules))
    want = step({"model": params}, stats, art.prepare(host))

    assert set(out) == set(want)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(out[k])),
            np.asarray(jax.tree.leaves(want[k])), rtol=1e-6, atol=1e-6,
            err_msg=f"artifact output '{k}' diverges from in-process step")
    # sanity: the metric components are real numbers on a real batch
    assert float(np.asarray(out["rr_count"]).sum()) > 0


def test_prepare_rejects_overflow_and_shape_drift(tmp_path):
    cfg = _cfg()
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=3).items()}
    _, params, stats = _trained_state(cfg, host)

    # K pinned BELOW this batch's real object count -> loud error
    real = int(host["obj_mask"].sum())
    art_dir = export_serving_artifact(
        cfg, params, stats, str(tmp_path / "small"),
        batch_size=2, pooled_bucket=8, platforms=("cpu",))
    art = load_serving_artifact(art_dir)
    assert real > art.meta["pooled_k"]
    with pytest.raises(ValueError, match="pooled_bucket"):
        art.prepare(host)

    # wrong static shape -> loud error naming the field
    art_dir2 = export_serving_artifact(
        cfg, params, stats, str(tmp_path / "ok"),
        batch_size=2, pooled_bucket=32, platforms=("cpu",))
    art2 = load_serving_artifact(art_dir2)
    bad = dict(host)
    bad["bow_rel"] = bad["bow_rel"][:, :-1]
    with pytest.raises(ValueError, match="bow_rel"):
        art2.prepare(bad)


def test_export_tpu_platform_serializes(tmp_path):
    """A CPU-only build box can emit a TPU artifact (lowering is
    device-independent; the fused Mosaic kernels serialize as custom calls).
    Only serialization is checked — there is no TPU device in the suite."""
    cfg = _cfg()
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=3).items()}
    _, params, stats = _trained_state(cfg, host)
    try:
        art_dir = export_serving_artifact(
            cfg, params, stats, str(tmp_path / "tpu_art"),
            batch_size=2, pooled_bucket=32, platforms=("tpu",))
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"TPU lowering unavailable on this host: {e}")
    art = load_serving_artifact(art_dir)
    assert art.meta["platforms"] == ["tpu"]
    assert (tmp_path / "tpu_art" / "serving.jaxexport").stat().st_size > 0


def test_export_queue_artifact_roundtrip(tmp_path):
    """queue > 1 exports the device-side batch-queue program; the artifact
    takes a list of Q host batches and matches the in-process scan."""
    cfg = _cfg()
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=3).items()}
    model, params, stats = _trained_state(cfg, host)

    art_dir = export_serving_artifact(
        cfg, params, stats, str(tmp_path / "qart"),
        batch_size=2, pooled_bucket=32, queue=3, platforms=("cpu",))
    art = load_serving_artifact(art_dir)
    batches = [{k: np.asarray(v)
                for k, v in make_synthetic_batch(spec, seed=s).items()}
               for s in (7, 8, 9)]
    out = art(batches)

    from sgaligner_tpu.engine.train_step import make_serving_queue
    run_queue = make_serving_queue(model, tuple(cfg.modules))
    prepared = [art.prepare(b) for b in batches]
    stacked = {k: np.stack([p[k] for p in prepared]) for k in prepared[0]}
    want = run_queue({"model": params}, stats, stacked)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(out[k])),
            np.asarray(jax.tree.leaves(want[k])), rtol=1e-6, atol=1e-6,
            err_msg=f"queue artifact output '{k}' diverges")

    with pytest.raises(ValueError, match="list of 3"):
        art(batches[:2])


def test_export_bf16_points_input(tmp_path):
    """points_dtype='bfloat16' halves the dominant input field; prepare
    casts f32 host points and the metrics stay close to the f32 artifact."""
    cfg = _cfg()
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=3).items()}
    _, params, stats = _trained_state(cfg, host)

    kw = dict(batch_size=2, pooled_bucket=32, platforms=("cpu",))
    art32 = load_serving_artifact(export_serving_artifact(
        cfg, params, stats, str(tmp_path / "f32"), **kw))
    art16 = load_serving_artifact(export_serving_artifact(
        cfg, params, stats, str(tmp_path / "bf16"), points_dtype="bfloat16",
        **kw))
    assert art16.meta["batch_keys"]["obj_points_pooled"][1] == "bfloat16"
    p16 = art16.prepare(host)
    assert str(p16["obj_points_pooled"].dtype) == "bfloat16"

    out32, out16 = art32(host), art16(host)
    np.testing.assert_allclose(
        float(np.asarray(out16["rr_sum"])),
        float(np.asarray(out32["rr_sum"])), rtol=0.2)
    a32 = np.asarray(out32["alignment_score"])
    a16 = np.asarray(out16["alignment_score"])
    np.testing.assert_allclose(a16, a32, rtol=0.05, atol=0.02)


def test_kernel_mode_force_platform():
    """ops/kernel_mode.py: the cross-platform export switch — override wins
    over the default backend and restores cleanly (also on error)."""
    from sgaligner_tpu.ops import kernel_mode as km

    assert km.lowering_platform() == jax.default_backend() == "cpu"
    assert km.interpret() and not km.use_fused("auto")
    assert km.use_fused("always") and not km.use_fused("never")

    with km.force_platform("tpu"):
        assert km.lowering_platform() == "tpu"
        assert not km.interpret()
        assert km.use_fused("auto") and not km.use_fused("never")
    assert km.lowering_platform() == "cpu"

    with pytest.raises(RuntimeError):
        with km.force_platform("tpu"):
            raise RuntimeError("boom")
    assert km.lowering_platform() == "cpu"  # restored despite the raise


def test_eva_pooled_and_artifact(tmp_path):
    """EVA gains the batch-pooled point path (round 3): pooled == dense
    forward, and the EVA config exports/serves like the flagship."""
    cfg = make_cfg(model_name="eva", modules=["point", "gcn", "rel", "attr"])
    cfg.tpu.max_objects = 8
    cfg.tpu.points_per_object = 32
    from sgaligner_tpu.data.batch import pool_compact

    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=3).items()}
    pooled = pool_compact(dict(host), bucket=32)
    model = build_model(cfg, platform="cpu")
    v = model.init(jax.random.key(0), pooled, train=False)

    e_p = model.apply(v, pooled, train=False)
    e_d = model.apply(v, host, train=False)
    for k in e_p:
        np.testing.assert_allclose(np.asarray(e_p[k]), np.asarray(e_d[k]),
                                   rtol=2e-5, atol=2e-5,
                                   err_msg=f"EVA pooled != dense for '{k}'")

    art = load_serving_artifact(export_serving_artifact(
        cfg, v["params"], v.get("batch_stats", {}), str(tmp_path / "eva"),
        batch_size=2, pooled_bucket=32, platforms=("cpu",)))
    out = art(host)
    assert np.isfinite(float(np.asarray(out["rr_sum"])))
