"""Alignment + registration inference entry point.

CLI-compatible with /root/reference/src/inference/sgaligner/
inference_align_reg.py:191-200: ``--config``, ``--snapshot``, ``--test_epoch``,
``--test_iter`` (resolves <snapshot_dir>/iter-<n>[.pth.tar] like the
reference's base_tester.py:28-34; errors if absent), and
``--reg_snapshot`` (only needed for the geotransformer backend — the built-in
'ransac' backend is self-contained).
"""

from __future__ import annotations

import argparse
import json

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.data.loaders import get_val_dataloader
from sgaligner_tpu.engine.tester import AlignRegTester
from sgaligner_tpu.reg.backend import build_backend
from sgaligner_tpu.reg.evaluator import RegistrationEvaluator


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--snapshot", default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--test_iter", type=int, default=None)
    parser.add_argument("--reg_snapshot", default=None)
    parser.add_argument("--output_root", default=None)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, output_root=args.output_root)

    loader = get_val_dataloader(cfg)
    reg_eval = None
    if cfg.registration:
        backend = build_backend(cfg, args.reg_snapshot)
        reg_eval = RegistrationEvaluator(cfg, backend)

    tester = AlignRegTester(cfg, loader.dataset, loader,
                            registration_evaluator=reg_eval,
                            snapshot=args.snapshot, test_epoch=args.test_epoch,
                            test_iter=args.test_iter)
    results = tester.run()
    print(json.dumps(results, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
