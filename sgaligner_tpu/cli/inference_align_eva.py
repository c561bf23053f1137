"""EVA alignment inference entry point (MRR + Hits@K only).

CLI-compatible with /root/reference/src/inference/eva/inference_align.py. The
reference's single-module eval path references ``embedding`` before assignment
(:79, SURVEY.md §2 item 20); fixed here by construction (the tester always
selects the key modality).
"""

from __future__ import annotations

import argparse
import json

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.data.loaders import get_val_dataloader
from sgaligner_tpu.engine.tester import AlignRegTester


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--snapshot", default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--test_iter", type=int, default=None)
    parser.add_argument("--output_root", default=None)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, output_root=args.output_root)
    cfg.registration = False

    loader = get_val_dataloader(cfg)
    tester = AlignRegTester(cfg, loader.dataset, loader,
                            snapshot=args.snapshot, test_epoch=args.test_epoch,
                            test_iter=args.test_iter)
    results = tester.run()
    print(json.dumps(results, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
