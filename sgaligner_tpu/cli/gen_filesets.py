"""Fileset / mapping generation entry point.

Covers the reference's three standalone scripts (preprocessing/
gen_all_pairs_fileset.py, gen_scan_subscan_mapping.py,
gen_rescan_to_refscan_mapping.py) as subcommands:

    python -m sgaligner_tpu.cli.gen_filesets all_pairs --config ... --split val
    python -m sgaligner_tpu.cli.gen_filesets scan_subscan_map --config ... --split val
    python -m sgaligner_tpu.cli.gen_filesets rescan_map --config ... --split val
"""

from __future__ import annotations

import argparse
import os.path as osp

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.data import filesets


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("task", choices=["all_pairs", "scan_subscan_map",
                                         "rescan_map"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--mode", default="orig")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, ensure_dir=False)
    subscans_files_dir = osp.join(cfg.data.subscan_dir, "files")
    scans_files_dir = osp.join(cfg.data.root_dir, "files")

    if args.task == "all_pairs":
        out = filesets.gen_all_pairs_fileset(subscans_files_dir, args.split,
                                             args.mode, seed=cfg.seed)
        print(f"[INFO] generated {len(out)} pairs w/ + w/o overlap")
    elif args.task == "scan_subscan_map":
        out = filesets.gen_scan_subscan_mapping(scans_files_dir,
                                                subscans_files_dir,
                                                args.split, args.mode)
        print(f"[INFO] mapped {len(out)} scans")
    else:
        out = filesets.gen_rescan_to_refscan_map(scans_files_dir, args.split)
        print(f"[INFO] {len(out)} rescan->refscan anchors")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
