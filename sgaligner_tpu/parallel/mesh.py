"""Device mesh + sharding helpers.

The reference's distributed path is vestigial DDP that can never run
(/root/reference/src/engine/base_trainer.py:70,144-152 — ``self.distributed`` is
hard-set False and init_process_group is never called). Here data parallelism is
first-class: a 1-D ``jax.sharding.Mesh`` over all addressable devices with axis
``"dp"``; batches are sharded along the leading pair axis, parameters replicated,
and gradient/metric reductions become XLA ``psum`` collectives inserted by GSPMD
under ``jit`` — riding ICI on real multi-chip topologies.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh. dp=0 → all available devices."""
    if devices is None:
        devices = jax.devices()
    if dp <= 0:
        dp = len(devices)
    if dp > len(devices):
        raise ValueError(f"requested dp={dp} > {len(devices)} devices")
    return Mesh(np.array(devices[:dp]), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (pair) axis of every batch leaf over 'dp'."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def validate_compact_bound(batch: dict, compact_slots: int) -> None:
    """Object compaction drops slots beyond the bound — fail loudly instead."""
    if compact_slots <= 0:
        return
    per_pair = np.asarray(batch["obj_mask"]).sum(axis=1)
    worst = int(per_pair.max()) if len(per_pair) else 0
    if worst > compact_slots:
        raise ValueError(
            f"a pair has {worst} real objects > tpu.compact_slots="
            f"{compact_slots}; raise the bound or disable compaction")


def shard_batch(batch: dict, mesh: Mesh, pad: bool = True) -> dict:
    """Device-put a host batch with the pair axis sharded over the mesh.

    When the pair count is not divisible by the mesh size, the batch is padded
    with empty (fully-masked) pairs — they contribute nothing to the masked
    losses/metrics. Requires numpy leaves when padding kicks in.
    """
    dp = mesh.shape["dp"]
    if dp > 1 and "obj_points_pooled" in batch:
        k = batch["obj_points_pooled"].shape[0]
        if k % dp != 0:
            raise ValueError(
                f"pooled object axis ({k}) not divisible by dp={dp}: build "
                "the batch with data.batch.pool_compact_sharded(dp=mesh dp) "
                "(per-shard pooling also keeps the encoder gather/scatter "
                "shard-local; GSPMD stays correct either way, just slower "
                "when rows cross shards)")
    b = batch["obj_mask"].shape[0]
    if pad and b % dp != 0:
        from sgaligner_tpu.data.batch import pad_batch_to

        batch = pad_batch_to(batch, ((b + dp - 1) // dp) * dp)
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def queue_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a serving QUEUE (stacked batches, [Q, ...] leaves): the
    queue axis is scanned on every device, the pair axis (axis 1) shards over
    'dp'. Build the stacked batches with per-shard pooling
    (``data.batch.pool_compact_sharded``) so the pooled-object axis splits
    shard-local too. See engine.train_step.make_serving_queue."""
    return NamedSharding(mesh, P(None, "dp"))


def shard_queue(stacked: dict, mesh: Mesh) -> dict:
    """Device-put a stacked serving queue with the pair axis sharded."""
    sh = queue_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)


def dp_size(mesh: Mesh) -> int:
    return mesh.shape["dp"]
