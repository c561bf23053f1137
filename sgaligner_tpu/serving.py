"""Exported serving artifacts: compile-once, deploy-anywhere inference.

The reference has no deployment story at all — its inference is a python
script that rebuilds the torch model from YAML + checkpoint every run
(/root/reference/src/inference/sgaligner/inference_align_reg.py). The
TPU-native equivalent of "a serving binary" is an ahead-of-time EXPORTED
XLA program: ``jax.export`` serializes the lowered StableHLO of the jitted
serving step (forward → sim matrices → rank/metric components,
``engine/train_step.py::make_serving_step``) together with its calling
convention, so a serving host can run alignment inference WITHOUT the model
code, the config system, or even this package's flax dependency — only
jax + the artifact directory:

    # build box (has the framework + trained state)
    from sgaligner_tpu import serving
    serving.export_serving_artifact(cfg, params, batch_stats, "artifact/",
                                    batch_size=128)

    # serving box (jax only)
    art = serving.load_serving_artifact("artifact/")
    out = art(host_batch)          # host_batch: plain numpy PairBatch fields

Artifact layout (one directory):

* ``serving.jaxexport`` — serialized ``jax.export.Exported`` (StableHLO +
  calling convention + platform list),
* ``params.npz``        — model params + batch stats, keys ``'/'``-joined,
* ``meta.json``         — static shapes (B, N, P, pooled K), modules, dtypes.

Shapes are pinned at export: XLA programs are static. The pooled point
axis K (batch-pooled object compaction, ``data/batch.py::pool_compact``) is
data-DEPENDENT at train time, so the exporter pins it to a caller-chosen
bound and ``ServingArtifact.prepare`` pools every incoming batch to exactly
that K — raising loudly when a batch's real-object count exceeds the bound
(the same contract `parallel/mesh.py::validate_compact_bound` enforces for
training).

Platform notes: export with ``platforms=["tpu"]`` embeds the fused Mosaic
kernels (lowering is device-independent — a CPU-only build box can emit TPU
artifacts); ``platforms=["cpu"]`` uses the pure-XLA unfused path (Pallas
interpret mode is host-callback-based and not serializable).
"""

from __future__ import annotations

import json
import os
import os.path as osp

import numpy as np


def _flatten(tree, prefix="", out=None):
    if out is None:
        out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree: dict = {}
    for key, value in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def export_serving_artifact(cfg, params, batch_stats, out_dir, *,
                            batch_size: int, pooled_bucket: int | None = None,
                            queue: int = 1, platforms=("tpu",),
                            with_sim: bool = False, points_dtype: str = "",
                            ks: tuple[int, ...] = (1, 2, 3, 4, 5)) -> str:
    """Export the alignment-serving program + trained state to ``out_dir``.

    ``pooled_bucket``: pin of the batch-pooled point axis K. None picks the
    full-occupancy bound B * 2N (always sufficient, ~35% more point-encoder
    work than a tuned bound at 3RScan occupancy — PERF.md). The serving
    program expects batches prepared by ``ServingArtifact.prepare`` (or any
    host code producing the same pooled PairBatch layout).

    ``queue > 1`` exports the device-side batch-queue program instead (ONE
    dispatch scanning ``queue`` stacked batches,
    ``engine/train_step.py::make_serving_queue`` — the throughput-optimal
    serving shape, PERF.md "Inference / serving"); the loaded artifact then
    takes a LIST of ``queue`` host batches per call. ``with_sim`` is
    single-batch only.

    ``points_dtype="bfloat16"`` pins the point-cloud input in bf16: the
    model casts points to the compute dtype at ingest anyway, and the point
    field dominates serving input bandwidth (``[K, 3, P]`` is ~95% of the
    batch bytes) — halving it halves the host→device transfer per request.
    ``prepare`` performs the cast, so callers still hand in f32 points.
    """
    import jax
    from jax import export as jexport

    from sgaligner_tpu.data.batch import BatchSpec, pool_compact
    from sgaligner_tpu.data.synthetic import make_synthetic_batch
    from sgaligner_tpu.engine.factory import build_model
    from sgaligner_tpu.engine.train_step import (make_serving_queue,
                                                 make_serving_step)

    two_n = 2 * cfg.tpu.max_objects
    # pool_compact never exceeds the dense bound B * 2N — clamp the pin to
    # it so prepare()'s pooling lands on the exported K exactly.
    k_pinned = min(int(pooled_bucket or batch_size * two_n),
                   batch_size * two_n)
    platform = "cpu" if tuple(platforms) == ("cpu",) else "tpu"
    model = build_model(cfg, platform=platform)

    spec = BatchSpec(batch_size=batch_size, max_objects=cfg.tpu.max_objects,
                     points_per_object=cfg.tpu.points_per_object)
    example = {k: np.asarray(v)
               for k, v in make_synthetic_batch(spec, seed=0).items()}
    example = pool_compact(example, bucket=k_pinned)
    # The example is only a SHAPE template (export lowers from arg specs, no
    # values flow) — coerce the data-dependent pooled axis to the pinned K.
    for key in ("obj_points_pooled", "pooled_flat_idx", "pooled_mask"):
        arr = example[key]
        if arr.shape[0] > k_pinned:
            example[key] = arr[:k_pinned]
        elif arr.shape[0] < k_pinned:
            pad = [(0, k_pinned - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
            example[key] = np.pad(arr, pad)
    if points_dtype:
        example["obj_points_pooled"] = (
            example["obj_points_pooled"].astype(np.dtype(points_dtype)))

    if queue > 1:
        if with_sim:
            raise ValueError("with_sim is single-batch only (queue == 1)")
        step = make_serving_queue(model, tuple(cfg.modules), ks=ks)
        program_input = {k: np.stack([v] * queue) for k, v in example.items()}
    else:
        step = make_serving_step(model, tuple(cfg.modules), ks=ks,
                                 with_sim=with_sim)
        program_input = example
    args = ({"model": params}, batch_stats or {}, program_input)
    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), args)
    # The trace must emit the target platform's kernel mode (real Mosaic
    # custom calls for TPU even when this build box's default backend is
    # CPU) — models resolve it through ops/kernel_mode.py.
    from sgaligner_tpu.ops import kernel_mode
    with kernel_mode.force_platform(platform):
        exported = jexport.export(step, platforms=list(platforms))(*specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(osp.join(out_dir, "serving.jaxexport"), "wb") as f:
        f.write(exported.serialize())
    flat = _flatten({"params": {"model": params},
                     "batch_stats": batch_stats or {}})
    # np.savez has no bfloat16 — store as f32 (lossless widening) and
    # record the true dtype so load_serving_artifact restores it.
    param_dtypes = {k: str(v.dtype) for k, v in flat.items()}
    np.savez(osp.join(out_dir, "params.npz"),
             **{k: (v.astype(np.float32) if str(v.dtype) == "bfloat16"
                    else v)
                for k, v in flat.items()})
    meta = {
        "param_dtypes": param_dtypes,
        "modules": list(cfg.modules),
        "batch_size": batch_size,
        "queue": queue,
        "max_objects": cfg.tpu.max_objects,
        "points_per_object": cfg.tpu.points_per_object,
        "pooled_k": k_pinned,
        "ks": list(ks),
        "with_sim": with_sim,
        "platforms": list(platforms),
        "batch_keys": {k: [list(v.shape), str(v.dtype)]
                       for k, v in example.items()},
    }
    with open(osp.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return out_dir


class ServingArtifact:
    """A loaded serving artifact: ``art(host_batch)`` runs inference.

    ``host_batch`` is a plain (unpooled) numpy PairBatch; ``prepare`` pools
    it to the artifact's pinned K and validates every static shape against
    meta.json so shape drift fails loudly at the host boundary, not inside
    XLA."""

    def __init__(self, exported, params, batch_stats, meta):
        self._exported = exported
        self._params = params
        self._batch_stats = batch_stats
        self._on_device = False
        self.meta = meta

    def _state(self):
        """Trained state, device-resident after the first call — npz loads
        numpy arrays, and re-uploading params every call costs more than the
        serving step itself on tunneled backends (measured 2-3x, PERF.md)."""
        if not self._on_device:
            import jax
            self._params = jax.device_put(self._params)
            self._batch_stats = jax.device_put(self._batch_stats)
            self._on_device = True
        return self._params, self._batch_stats

    def prepare(self, host_batch: dict) -> dict:
        from sgaligner_tpu.data.batch import pool_compact

        k = self.meta["pooled_k"]
        batch = {kk: np.asarray(v) for kk, v in host_batch.items()}
        if "obj_points_pooled" not in batch:
            batch = pool_compact(batch, bucket=k)
        got_k = batch["obj_points_pooled"].shape[0]
        if got_k != k:
            raise ValueError(
                f"batch pools to K={got_k} but the artifact was exported "
                f"with K={k}: too many real objects for the pinned bound "
                f"(re-export with a larger pooled_bucket)")
        for key, (shape, dtype) in self.meta["batch_keys"].items():
            if key not in batch:
                raise KeyError(f"serving batch missing field '{key}'")
            if list(batch[key].shape) != shape:
                raise ValueError(
                    f"field '{key}': shape {list(batch[key].shape)} != "
                    f"exported {shape}")
            if dtype == "bfloat16":
                import ml_dtypes
                batch[key] = batch[key].astype(ml_dtypes.bfloat16, copy=False)
            else:
                batch[key] = batch[key].astype(dtype, copy=False)
        extra = set(batch) - set(self.meta["batch_keys"])
        for key in extra:
            del batch[key]
        return batch

    def __call__(self, host_batch) -> dict:
        """Single-batch artifact: one host PairBatch dict. Queue artifact
        (meta['queue'] > 1): a list of exactly that many host batches."""
        q = self.meta.get("queue", 1)
        if q > 1:
            if not isinstance(host_batch, (list, tuple)) or len(host_batch) != q:
                raise ValueError(
                    f"queue artifact expects a list of {q} batches, got "
                    f"{type(host_batch).__name__} of length "
                    f"{len(host_batch) if isinstance(host_batch, (list, tuple)) else 'n/a'}")
            prepared = [self.prepare(b) for b in host_batch]
            stacked = {k: np.stack([p[k] for p in prepared])
                       for k in prepared[0]}
            params, stats = self._state()
            return self._exported.call(params, stats, stacked)
        params, stats = self._state()
        return self._exported.call(params, stats, self.prepare(host_batch))


def load_serving_artifact(art_dir: str) -> ServingArtifact:
    from jax import export as jexport

    with open(osp.join(art_dir, "serving.jaxexport"), "rb") as f:
        exported = jexport.deserialize(f.read())
    with open(osp.join(art_dir, "meta.json")) as f:
        meta = json.load(f)
    dtypes = meta.get("param_dtypes", {})
    with np.load(osp.join(art_dir, "params.npz")) as z:
        flat = {}
        for k in z.files:
            v = z[k]
            if dtypes.get(k) == "bfloat16":
                import ml_dtypes
                v = v.astype(ml_dtypes.bfloat16)
            flat[k] = v
        tree = _unflatten(flat)
    return ServingArtifact(exported, tree.get("params", {}),
                           tree.get("batch_stats", {}), meta)
