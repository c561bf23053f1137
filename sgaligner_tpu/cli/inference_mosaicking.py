"""3D mosaicking inference entry point.

CLI-compatible with /root/reference/src/inference/sgaligner/
inference_mosaicking.py:213-222. The scan->subscan map json is read from
``<subscan_dir>/files/<data_mode>/<anchor_type_name>_<split>.json`` (the
reference wires the same path from cfg, :100); ``--max_scans`` mirrors the
reference's truncation to the first 2 scans (:101), pass 0 for all.
"""

from __future__ import annotations

import argparse
import json
import os.path as osp

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.engine.tester import MosaickTester
from sgaligner_tpu.reg.backend import build_backend
from sgaligner_tpu.reg.evaluator import RegistrationEvaluator
from sgaligner_tpu.utils.io import load_json


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--snapshot", default=None)
    parser.add_argument("--test_epoch", type=int, default=None)
    parser.add_argument("--test_iter", type=int, default=None)
    parser.add_argument("--reg_snapshot", default=None)
    parser.add_argument("--split", default="val")
    parser.add_argument("--max_scans", type=int, default=2)
    parser.add_argument("--output_root", default=None)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, output_root=args.output_root)

    map_name = cfg.preprocess.anchor_type_name or "scan_subscan_map"
    map_path = osp.join(cfg.data.subscan_dir, "files", cfg.val.data_mode,
                        f"{map_name}_{args.split}.json")
    scan_subscan_map = load_json(map_path)

    reg_eval = RegistrationEvaluator(cfg, build_backend(cfg, args.reg_snapshot))
    tester = MosaickTester(cfg, reg_eval, scan_subscan_map,
                           subscans_dir=cfg.data.subscan_dir,
                           max_scans=args.max_scans or None,
                           snapshot=args.snapshot, test_epoch=args.test_epoch,
                           test_iter=args.test_iter)
    results = tester.run()
    print(json.dumps(results, default=float))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
