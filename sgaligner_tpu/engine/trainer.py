"""Epoch-based trainer — the runtime equivalent of the reference engine layer.

Replaces BaseTrainer/EpochBasedTrainer (/root/reference/src/engine/
base_trainer.py:20-218, epoch_based_trainer.py:17-193): seeded init, per-epoch
train loop with prepare/process timing, per-epoch + rolling snapshots, a val loop
producing MRR/Hits@K/SGAR, best-snapshot tracking, and --resume support.

Differences by design:
* one jitted step (forward+loss+grads+update) instead of eager ops,
* the batch is sharded over the data-parallel mesh before each step,
* best snapshot keyed on the *epoch-mean* val loss by default; the reference
  keys on the last batch's loss (epoch_based_trainer.py:165-168) — set
  ``best_on_last_batch=True`` for behavioral parity.
"""

from __future__ import annotations

import os.path as osp
from collections.abc import Iterable
from typing import Any, Callable

import jax
import numpy as np

from sgaligner_tpu.core import checkpoint as ckpt
from sgaligner_tpu.core.config import Config
from sgaligner_tpu.engine.factory import build_model, build_optimizer, loss_kind
from sgaligner_tpu.engine.train_step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from sgaligner_tpu.ops.objective import init_loss_params
from sgaligner_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
    validate_compact_bound,
)
from sgaligner_tpu.utils.logging import Logger, StepTimer, SummaryBoard


class Trainer:
    def __init__(
        self,
        cfg: Config,
        train_loader: Callable[[], Iterable[dict[str, np.ndarray]]],
        val_loader: Callable[[], Iterable[dict[str, np.ndarray]]] | None = None,
        best_on_last_batch: bool = False,
        log_file: str | None = None,
        profile_dir: str | None = None,
    ):
        self.cfg = cfg
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.best_on_last_batch = best_on_last_batch
        # jax.profiler trace of the 2nd epoch (post-compile) when set
        self.profile_dir = profile_dir
        if log_file is None and cfg.log_dir:
            log_file = osp.join(cfg.log_dir, "train.log")
        self.logger = Logger(log_file)
        self.writer = self._make_event_writer(cfg.event_dir)

        self.mesh = make_mesh(cfg.tpu.dp)
        self.model = build_model(cfg, platform=self.mesh.devices.flat[0].platform)
        self.tx = build_optimizer(cfg)
        self.kind = loss_kind(cfg)
        modules = tuple(cfg.modules)
        self.train_step = make_train_step(self.model, self.tx, modules,
                                          kind=self.kind, zoom=cfg.loss.zoom)
        self.eval_step = make_eval_step(self.model, modules, kind=self.kind,
                                        zoom=cfg.loss.zoom,
                                        ks=tuple(cfg.metrics.all_k))
        self.state: TrainState | None = None
        self.epoch = 0
        self.best_val_loss = float("inf")

    @staticmethod
    def _make_event_writer(event_dir: str):
        """TensorBoard scalars per epoch (reference base_trainer.py:39-41,
        211-214); optional — requires torch's bundled tensorboard writer."""
        if not event_dir:
            return None
        try:
            from torch.utils.tensorboard import SummaryWriter

            return SummaryWriter(event_dir)
        except Exception:
            return None

    def _write_scalars(self, phase: str, summary: dict, step: int) -> None:
        if self.writer is None:
            return
        for k, v in summary.items():
            self.writer.add_scalar(f"{phase}/{k}", v, step)
        self.writer.flush()

    # -- state ------------------------------------------------------------
    def init_state(self, example_batch: dict[str, np.ndarray]) -> None:
        rng = jax.random.key(self.cfg.seed)
        loss_params = init_loss_params(len(self.cfg.modules))
        batch = shard_batch({k: np.asarray(v) for k, v in example_batch.items()},
                            self.mesh)
        self.state = self._replicate(
            create_train_state(self.model, self.tx, batch, loss_params, rng))
        n_params = sum(x.size for x in jax.tree.leaves(self.state.params))
        self.logger.info(f"model '{self.cfg.model_name}' modules={self.cfg.modules} "
                         f"params={n_params:,} mesh=dp:{self.mesh.shape['dp']}")

    def _replicate(self, state: TrainState) -> TrainState:
        """Place every state leaf replicated over the mesh (checkpoint restores
        land on a single device; sharded batches need mesh-consistent state)."""
        return jax.device_put(state, replicated(self.mesh))

    def resume(self) -> bool:
        """Load the rolling snapshot if present (epoch_based_trainer.py:183-187)."""
        path = osp.join(self.cfg.snapshot_dir, "snapshot")
        if not osp.isdir(path):
            return False
        assert self.state is not None, "call init_state first"
        target = {"params": self.state.params, "opt_state": self.state.opt_state,
                  "rng": self.state.rng}
        if self.state.batch_stats:
            target["batch_stats"] = self.state.batch_stats
        payload = ckpt.load_snapshot(path, target)
        self.state = self._replicate(self.state.replace(
            params=payload["params"],
            opt_state=payload["opt_state"],
            batch_stats=payload.get("batch_stats", self.state.batch_stats),
            rng=payload["rng"],
            step=jax.numpy.asarray(payload["iteration"], jax.numpy.int32),
        ))
        self.epoch = payload["epoch"]
        self.logger.info(f"resumed from {path} at epoch {self.epoch}")
        return True

    def load_pretrained(self, path: str) -> None:
        """Load model params only (reference --snapshot, base_trainer.py:104-131)."""
        assert self.state is not None
        payload = ckpt.load_snapshot(path)
        params = dict(self.state.params)
        params["model"] = jax.tree.map(
            lambda _, v: v, self.state.params["model"], payload["params"]["model"])
        self.state = self._replicate(self.state.replace(params=params))
        self.logger.info(f"loaded pretrained model from {path}")

    # -- loops ------------------------------------------------------------
    def train_epoch(self) -> dict[str, float]:
        assert self.state is not None
        board = SummaryBoard(last_n=None)
        timer = StepTimer()
        for it, batch in enumerate(self.train_loader()):
            validate_compact_bound(batch, self.cfg.tpu.compact_slots)
            batch = shard_batch(batch, self.mesh)
            timer.record_prepare()
            self.state, metrics = self.train_step(self.state, batch)
            if (it + 1) % self.cfg.train.log_steps == 0:
                metrics = jax.device_get(metrics)   # sync point for timing
                timer.record_process()
                board.update_from_dict(metrics)
                if not np.isfinite(float(metrics["loss"])):
                    self._dump_debug_state(batch, it)
            else:
                timer.record_process()
        if not board.meters:
            # e.g. fewer pairs than batch_size with drop_last -> zero batches
            self.logger.warning(
                "train epoch produced ZERO batches — check dataset size vs "
                "train.batch_size (drop_last discards partial batches)")
        summary = board.summary()
        summary["time/prepare"] = timer.prepare_mean
        summary["time/process"] = timer.process_mean
        return summary

    def _dump_debug_state(self, batch, it: int) -> None:
        """Non-finite loss: dump the offending batch + model state for offline
        debugging (the reference dumps data+model and drops into ipdb,
        epoch_based_trainer.py:65-73 — not possible under jit; the optimizer
        itself already skips non-finite-grad steps via optax.apply_if_finite).
        """
        self.logger.error(f"non-finite loss at epoch {self.epoch} iter {it}")
        if not self.cfg.output_dir:
            return
        import pickle

        path = osp.join(self.cfg.output_dir, f"nan_debug_e{self.epoch}_i{it}.pkl")
        with open(path, "wb") as f:
            pickle.dump({"batch": jax.device_get(batch),
                         "params": jax.device_get(self.state.params)}, f)
        self.logger.error(f"dumped offending batch + params to {path}")

    def inference_epoch(self) -> dict[str, float]:
        assert self.state is not None and self.val_loader is not None
        agg: dict[str, float] = {}
        rr_sum = rr_count = 0.0
        hits: dict[int, list[float]] = {k: [0.0, 0.0] for k in self.cfg.metrics.all_k}
        sgar_sums = {"2": 0.0, "50": 0.0, "100": 0.0}
        n_pairs = 0.0
        losses: list[float] = []
        for batch in self.val_loader():
            batch = shard_batch(batch, self.mesh)
            out = jax.device_get(
                self.eval_step(self.state.params, self.state.batch_stats, batch))
            losses.append(float(out["loss"]))
            rr_sum += float(out["rr_sum"])
            rr_count += float(out["rr_count"])
            for k in self.cfg.metrics.all_k:
                c, t = out[f"hits@{k}"]
                hits[k][0] += float(c)
                hits[k][1] += float(t)
            pv = np.asarray(out["pair_valid"])
            n_pairs += pv.sum()
            for mode in sgar_sums:
                sgar_sums[mode] += float((np.asarray(out["sgar"][mode]) * pv).sum())

        agg["loss"] = float(np.mean(losses)) if losses else float("nan")
        agg["last_batch_loss"] = losses[-1] if losses else float("nan")
        agg["mrr"] = rr_sum / max(rr_count, 1.0)
        for k in self.cfg.metrics.all_k:
            agg[f"hits@{k}"] = hits[k][0] / max(hits[k][1], 1.0)
        for mode, s in sgar_sums.items():
            agg[f"sgar@{mode}"] = s / max(n_pairs, 1.0)
        return agg

    def save_epoch_snapshot(self) -> None:
        assert self.state is not None
        ckpt.save_snapshot(
            self.cfg.snapshot_dir, f"epoch-{self.epoch}",
            params=jax.device_get(self.state.params),
            batch_stats=jax.device_get(self.state.batch_stats) or None,
            epoch=self.epoch, iteration=int(self.state.step))
        ckpt.save_snapshot(
            self.cfg.snapshot_dir, "snapshot",
            params=jax.device_get(self.state.params),
            batch_stats=jax.device_get(self.state.batch_stats) or None,
            opt_state=jax.device_get(self.state.opt_state),
            rng=jax.device_get(self.state.rng),
            epoch=self.epoch, iteration=int(self.state.step))

    def run(self, resume: bool = False) -> dict[str, Any]:
        if resume:
            self.resume()
        history = []
        while self.epoch < self.cfg.optim.max_epoch:
            self.epoch += 1
            profiling = self.profile_dir is not None and self.epoch == 2
            if profiling:
                from jax import profiler as _profiler

                _profiler.start_trace(self.profile_dir)
            train_summary = self.train_epoch()
            if profiling:
                from jax import profiler as _profiler

                _profiler.stop_trace()
                self.logger.info(f"profiler trace written to {self.profile_dir}")
            self.logger.info(f"[epoch {self.epoch}] train: " + ", ".join(
                f"{k}: {v:.4f}" for k, v in train_summary.items()))
            self._write_scalars("train", train_summary, self.epoch)
            if self.cfg.snapshot_dir:
                self.save_epoch_snapshot()
            entry: dict[str, Any] = {"epoch": self.epoch, "train": train_summary}
            if self.val_loader is not None:
                val_summary = self.inference_epoch()
                self.logger.info(f"[epoch {self.epoch}] val: " + ", ".join(
                    f"{k}: {v:.4f}" for k, v in val_summary.items()))
                self._write_scalars("val", val_summary, self.epoch)
                key = ("last_batch_loss" if self.best_on_last_batch
                       else self.cfg.train.best_metric)
                sign = -1.0 if (self.cfg.train.best_mode == "max"
                                and not self.best_on_last_batch) else 1.0
                if (sign * val_summary[key] < self.best_val_loss
                        and self.cfg.snapshot_dir):
                    self.best_val_loss = sign * val_summary[key]
                    ckpt.save_snapshot(
                        self.cfg.snapshot_dir, "best_snapshot",
                        params=jax.device_get(self.state.params),
                        batch_stats=jax.device_get(self.state.batch_stats) or None,
                        epoch=self.epoch, iteration=int(self.state.step))
                entry["val"] = val_summary
            history.append(entry)
        return {"history": history, "epochs": self.epoch}
