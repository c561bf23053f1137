"""Batch loaders: shuffled / sequential iterators over a dataset of padded pairs.

Replaces the reference's torch DataLoader plumbing
(/root/reference/src/datasets/loaders.py:4-18, utils/torch_util.py:78-107) with a
thread-pool-prefetched host pipeline: __getitem__ work (npy/pkl reads + padding)
overlaps device compute; batches are plain numpy pytrees ready for
``shard_batch``. Train loader shuffles per epoch and drops the last partial
batch (torch_util.py:97 drop_last=True); val keeps order and pads instead.
"""

from __future__ import annotations

from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sgaligner_tpu.core.config import Config
from sgaligner_tpu.data.batch import collate, pool_compact
from sgaligner_tpu.data.scan3r import Scan3RDataset


class BatchLoader:
    def __init__(self, dataset, batch_size: int, shuffle: bool,
                 drop_last: bool, seed: int = 42, num_workers: int = 4,
                 transform=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.num_workers = max(1, num_workers)
        self.transform = transform  # post-collate host transform (pooling)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        if self.drop_last:
            order = order[: len(order) - len(order) % self.batch_size]

        chunks = [order[i : i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]
        if self.num_workers > 1:
            # bounded prefetch: keep ~2x workers batches in flight, not the
            # whole epoch (unbounded submission materializes every batch)
            depth = 2 * self.num_workers
            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = [pool.submit(self._load_chunk, c)
                           for c in chunks[:depth]]
                next_chunk = depth
                for i in range(len(chunks)):
                    yield futures[i].result()
                    futures[i] = None  # release the batch
                    if next_chunk < len(chunks):
                        futures.append(pool.submit(self._load_chunk,
                                                   chunks[next_chunk]))
                        next_chunk += 1
        else:
            for c in chunks:
                yield self._load_chunk(c)

    def _load_chunk(self, idxs) -> dict[str, np.ndarray]:
        batch = collate([self.dataset[int(i)] for i in idxs])
        return self.transform(batch) if self.transform else batch


def _pool_transform(cfg: Config):
    # batch-pooled compaction when cfg.tpu.pooled_bucket > 0; per-shard
    # pooling under data parallelism keeps the encoder shard-local
    bucket = getattr(cfg.tpu, "pooled_bucket", 0)
    if bucket <= 0:
        return None
    from sgaligner_tpu.data.batch import pool_compact_sharded

    dp = cfg.tpu.dp if cfg.tpu.dp > 1 else 1
    return lambda b: pool_compact_sharded(b, bucket, dp)


def get_train_val_data_loader(cfg: Config, dataset_cls=Scan3RDataset):
    """Reference loaders.py:4-12."""
    train_ds = dataset_cls(cfg, split="train")
    val_ds = dataset_cls(cfg, split="val")
    tf = _pool_transform(cfg)
    train = BatchLoader(train_ds, cfg.train.batch_size, shuffle=True,
                        drop_last=True, seed=cfg.seed,
                        num_workers=cfg.num_workers, transform=tf)
    val = BatchLoader(val_ds, cfg.val.batch_size, shuffle=False,
                      drop_last=False, seed=cfg.seed,
                      num_workers=cfg.num_workers, transform=tf)
    return train, val


def get_val_dataloader(cfg: Config, dataset_cls=Scan3RDataset):
    """Reference loaders.py:14-18."""
    val_ds = dataset_cls(cfg, split="val")
    return BatchLoader(val_ds, cfg.val.batch_size, shuffle=False,
                       drop_last=False, seed=cfg.seed,
                       num_workers=cfg.num_workers,
                       transform=_pool_transform(cfg))
