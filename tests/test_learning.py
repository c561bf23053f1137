"""End-to-end learning: node-matching metrics IMPROVE with training on hard
fixtures (noisy anchor BoW + geometry noise, so an untrained model is far from
perfect and matching must be learned). This is the miniature of the reference's
real verification loop ("train, then compare the README tables", SURVEY §4).
"""

import numpy as np

import jax

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.batch import BatchSpec
from sgaligner_tpu.data.synthetic import collate, make_synthetic_pair
from sgaligner_tpu.engine.trainer import Trainer


def hard_batches(spec, n_batches, seed0, bow_noise=0.9, noise=0.05):
    out = []
    for i in range(n_batches):
        rng = np.random.default_rng(seed0 + i)
        out.append(collate([
            make_synthetic_pair(spec, rng, bow_noise=bow_noise, noise=noise,
                                resample=True)
            for _ in range(spec.batch_size)]))
    return out


def test_training_improves_alignment(tmp_path):
    cfg = make_cfg(model_name="sgaligner",
                   modules=["point", "gat", "rel", "attr"])
    cfg.tpu.max_objects = 12
    cfg.train.batch_size = 4
    cfg.val.batch_size = 4
    cfg.optim.max_epoch = 20
    cfg.optim.lr = 1e-3  # reference default (trainval_sgaligner.py:48)
    cfg.snapshot_dir = ""
    cfg.log_dir = ""

    spec = BatchSpec(batch_size=4, max_objects=12, points_per_object=32)
    train_data = hard_batches(spec, 4, seed0=0)
    val_data = hard_batches(spec, 2, seed0=100)

    trainer = Trainer(cfg, lambda: iter(train_data), lambda: iter(val_data))
    trainer.init_state(train_data[0])
    # untrained baseline
    base = trainer.inference_epoch()
    result = trainer.run()
    # best epoch — what best_snapshot tracking would deploy
    best = max((h["val"] for h in result["history"]), key=lambda v: v["mrr"])

    assert base["mrr"] < 0.95, f"fixture too easy: untrained mrr={base['mrr']}"
    assert best["mrr"] > base["mrr"] + 0.03, (base["mrr"], best["mrr"])
    assert best["mrr"] > 0.9, best
    assert best["hits@1"] > base["hits@1"], (base["hits@1"], best["hits@1"])
