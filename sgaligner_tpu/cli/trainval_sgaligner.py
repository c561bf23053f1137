"""Train/val entry point for SGAligner.

CLI-compatible with /root/reference/src/trainers/trainval_sgaligner.py:95-105:
``--config`` (required), ``--resume``, ``--snapshot`` (pretrained weights),
``--load_transform`` and ``--local_rank`` accepted for compatibility (the former
is unused upstream too; the latter is meaningless under jax — the mesh comes
from cfg.tpu.dp).

Run: ``python -m sgaligner_tpu.cli.trainval_sgaligner --config <yaml>``
"""

from __future__ import annotations

import argparse

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.data.loaders import get_train_val_data_loader
from sgaligner_tpu.engine.trainer import Trainer


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train SGAligner (TPU-native)")
    parser.add_argument("--config", required=True, help="config YAML path")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the rolling snapshot")
    parser.add_argument("--snapshot", default=None,
                        help="load pretrained weights before training")
    parser.add_argument("--load_transform", default=None, help="(compat, unused)")
    parser.add_argument("--local_rank", type=int, default=-1,
                        help="(compat, unused under jax)")
    parser.add_argument("--output_root", default=None,
                        help="root for the derived output/ tree (default: cwd)")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, output_root=args.output_root)

    train_loader, val_loader = get_train_val_data_loader(cfg)
    trainer = Trainer(cfg, lambda: iter(train_loader), lambda: iter(val_loader))
    example = next(iter(val_loader if len(val_loader) else train_loader))
    trainer.init_state(example)
    if args.snapshot:
        trainer.load_pretrained(args.snapshot)
    trainer.run(resume=args.resume)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
