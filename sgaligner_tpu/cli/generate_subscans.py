"""Subscan generation entry point.

CLI-compatible with /root/reference/preprocessing/scan3r/generate_subscans.py:
``--config``, ``--split``, plus ``--visualize`` accepted (no-op headless).
Runs the full pipeline: trajectory-carved subscans -> pairwise overlap ->
metadata/anchors (scripts/generate_subscans_scan3r_gt.sh stage 1).
"""

from __future__ import annotations

import argparse

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.data.subscan_gen import SubGenScan3R


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--visualize", action="store_true",
                        help="(compat, ignored — headless)")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, ensure_dir=False)
    gen = SubGenScan3R(cfg, split=args.split)
    gen.generate_all()
    gen.calculate_overlap()
    gen.write_metadata()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
