"""Jitted train / eval steps over a data-parallel mesh.

The reference's hot loop (to_cuda → forward → loss → backward → step,
/root/reference/src/engine/epoch_based_trainer.py:75-131) becomes ONE jitted XLA
program per step: forward (all modalities, all graphs), loss, gradients, optimizer
update, with the batch sharded over the ``"dp"`` mesh axis and parameters
replicated — GSPMD inserts the gradient all-reduce over ICI.

Eval is likewise a single program producing metric *components* (reciprocal-rank
sums, hit counts, SGAR values) that the host accumulates across batches, matching
the epoch-level aggregation of the reference testers
(/root/reference/src/inference/sgaligner/inference_align_reg.py:98-146).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from sgaligner_tpu.ops import metrics as M
from sgaligner_tpu.ops.objective import overall_loss, overall_nca_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any           # {"model": ..., "loss": ...}
    opt_state: Any
    batch_stats: Any      # {} when the model has none (PCT has real BN)
    rng: jnp.ndarray      # dropout rng


def create_train_state(model, tx, batch, loss_params, rng) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, batch, train=False)
    params = {"model": variables["params"], "loss": loss_params}
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
        rng=state_rng,
    )


def _apply_model(model, params, batch_stats, batch, train, rng):
    variables = {"params": params}
    mutable = []
    if batch_stats:
        variables["batch_stats"] = batch_stats
        mutable = ["batch_stats"] if train else []
    kwargs = {"train": train}
    if train:
        kwargs["rngs"] = {"dropout": rng}
    if mutable:
        embs, updates = model.apply(variables, batch, mutable=mutable, **kwargs)
        return embs, updates.get("batch_stats", batch_stats)
    embs = model.apply(variables, batch, **kwargs)
    return embs, batch_stats


def make_train_step(model, tx, modules: tuple[str, ...], kind: str = "overall",
                    zoom: float = 0.1):
    """Returns jitted (state, batch) -> (state, metrics)."""

    def loss_fn(params, batch_stats, batch, rng):
        embs, new_bs = _apply_model(model, params["model"], batch_stats, batch,
                                    train=True, rng=rng)
        if kind == "nca":
            losses = overall_nca_loss(embs, batch)
        else:
            losses = overall_loss(embs, batch, params["loss"], modules, zoom=zoom)
        return losses["loss"], (losses, new_bs)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        rng, step_rng = jax.random.split(state.rng)
        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch, step_rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt,
            batch_stats=new_bs,
            rng=rng,
        )
        metrics = {k: v for k, v in losses.items()}
        return new_state, metrics

    return train_step


def _serving_metrics(model, modules: tuple[str, ...], ks: tuple[int, ...],
                     with_sim: bool, params, batch_stats, batch) -> dict:
    """Unjitted serving body: forward -> joint sim matrices -> rank/metric
    components. Shared by the single-batch step and the device-side queue."""
    embs, _ = _apply_model(model, params["model"], batch_stats, batch,
                           train=False, rng=None)
    key = "joint" if len(modules) > 1 else modules[0]
    b, two_n = batch["obj_mask"].shape
    emb = embs[key].reshape(b, two_n, -1)
    sim = M.cosine_sim_matrix(emb, batch["obj_mask"])
    ranks, mask = M.anchor_ranks(sim, batch["e1i"], batch["e2i"],
                                 batch["anchor_mask"])
    rr_sum, rr_count = M.mrr_from_ranks(ranks, mask)
    hits = M.hits_at_k_from_ranks(ranks, mask, ks)
    out = {
        "rr_sum": rr_sum,
        "rr_count": rr_count,
        "alignment_score": M.alignment_score(
            sim, batch["n_src"], batch["n_ref"], two_n // 2),
    }
    if with_sim:
        out["sim"] = sim
    for k, (correct, total) in hits.items():
        out[f"hits@{k}"] = (correct, total)
    return out


def make_serving_step(model, modules: tuple[str, ...],
                      ks: tuple[int, ...] = (1, 2, 3, 4, 5),
                      with_sim: bool = False):
    """Inference-only program: forward -> joint sim matrices -> rank/metric
    components. No loss computation, no batch-stat plumbing, no dropout —
    the alignment-serving path (scripts/bench_serving.py measures it; pair it
    with ``make_serving_queue`` to amortize dispatch overhead)."""
    return jax.jit(partial(_serving_metrics, model, modules, ks, with_sim))


def make_serving_queue(model, modules: tuple[str, ...],
                       ks: tuple[int, ...] = (1, 2, 3, 4, 5)):
    """Device-side batch queue: ONE dispatch scans over Q stacked batches.

    Dispatch over a tunneled/remote PJRT backend costs tens of ms regardless
    of program size (PERF.md "Inference/serving"), so the TPU-native serving
    shape is a jitted ``lax.scan`` over a queue of stacked batches: wall time
    amortizes to the device cost per batch. Returns the queue-summed scalar
    metric components plus per-batch ``alignment_score`` stacked to [Q, B].

    Data-parallel serving: stack per-shard pooled batches
    (``data.batch.pool_compact_sharded``), device_put the stacked tree with
    ``parallel.mesh.queue_sharding(mesh)`` (pair axis = axis 1 sharded over
    "dp") and params/batch_stats replicated — GSPMD partitions the scan body
    and inserts the metric all-reduces over ICI. Tested in
    tests/test_serving.py::test_serving_queue_sharded_dp_equivalence.
    """
    body_metrics = partial(_serving_metrics, model, modules, ks, False)

    @jax.jit
    def serve_queue(params, batch_stats, stacked) -> dict:
        def body(carry, one):
            return carry, body_metrics(params, batch_stats, one)
        _, outs = jax.lax.scan(body, None, stacked)
        # scalar components sum over the queue; per-pair scores stay [Q, B]
        return {k: v if k == "alignment_score"
                else jax.tree.map(lambda x: x.sum(0), v)
                for k, v in outs.items()}

    return serve_queue


def make_eval_step(model, modules: tuple[str, ...], kind: str = "overall",
                   zoom: float = 0.1, ks: tuple[int, ...] = (1, 2, 3, 4, 5),
                   with_sim: bool = False):
    """Returns jitted (params, batch_stats, batch) -> metric components.

    with_sim=True also returns the per-pair similarity matrices so downstream
    consumers (registration seeding) reuse THIS forward instead of running a
    second one — opt-in because fetching [B, 2N, 2N] to host costs transfer
    time the pure-metrics eval path doesn't need."""

    @jax.jit
    def eval_step(params, batch_stats, batch) -> dict:
        embs, _ = _apply_model(model, params["model"], batch_stats, batch,
                               train=False, rng=None)
        if kind == "nca":
            losses = overall_nca_loss(embs, batch)
        else:
            losses = overall_loss(embs, batch, params["loss"], modules, zoom=zoom)

        key = "joint" if len(modules) > 1 else modules[0]
        b, two_n = batch["obj_mask"].shape
        emb = embs[key].reshape(b, two_n, -1)
        sim = M.cosine_sim_matrix(emb, batch["obj_mask"])
        ranks, mask = M.anchor_ranks(sim, batch["e1i"], batch["e2i"],
                                     batch["anchor_mask"])
        rr_sum, rr_count = M.mrr_from_ranks(ranks, mask)
        hits = M.hits_at_k_from_ranks(ranks, mask, ks)
        sgar_vals = M.sgar(sim, batch["e1i"], batch["e2i"], batch["anchor_mask"])
        pair_valid = batch["anchor_mask"].any(axis=1)

        out = {
            "loss": losses["loss"],
            "rr_sum": rr_sum,
            "rr_count": rr_count,
            "pair_valid": pair_valid,
            "sgar": sgar_vals,
            "alignment_score": M.alignment_score(
                sim, batch["n_src"], batch["n_ref"], two_n // 2),
        }
        if with_sim:
            out["sim"] = sim
        for k, (correct, total) in hits.items():
            out[f"hits@{k}"] = (correct, total)
        return out

    return eval_step
