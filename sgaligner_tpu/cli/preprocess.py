"""Preprocessing entry point.

CLI-compatible with /root/reference/preprocessing/scan3r/preprocess.py:17-38:
``--config``, ``--split``, and the graph-perturbation flags ``--remove_nodes``,
``--remove_edges``, ``--change_node_semantic``, ``--change_edge_semantic``.

The relation vocabulary is read from ``<data_dir>/files/relationships.txt``
(the reference reads it from a hardcoded path in utils/define.py:3-10).
"""

from __future__ import annotations

import argparse
import os.path as osp

from sgaligner_tpu.core.config import make_cfg, update_config
from sgaligner_tpu.data.preprocess import (
    PerturbArgs,
    calculate_bow_node_attr_feats,
    calculate_bow_node_edge_feats,
    process_split,
)
from sgaligner_tpu.utils.io import load_pkl_data, name2idx


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Preprocess 3RScan subscans")
    parser.add_argument("--config", required=True)
    parser.add_argument("--split", default="train")
    parser.add_argument("--remove_nodes", dest="remove_node", action="store_true")
    parser.add_argument("--remove_edges", dest="remove_edge", action="store_true")
    parser.add_argument("--change_node_semantic", action="store_true")
    parser.add_argument("--change_edge_semantic", action="store_true")
    parser.add_argument("--obj_attr_vocab", default=None,
                        help="optional obj_attr.pkl seeding the attribute vocab")
    parser.add_argument("--host_fps", action="store_true",
                        help="force host (numpy) FPS instead of the device kernel")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    cfg = update_config(make_cfg(), args.config, ensure_dir=False)
    pargs = PerturbArgs(
        remove_node=args.remove_node,
        remove_edge=args.remove_edge,
        change_node_semantic=args.change_node_semantic,
        change_edge_semantic=args.change_edge_semantic,
    )

    data_dir = cfg.data.root_dir if cfg.scan_type == "scan" else cfg.data.subscan_dir
    # the relation vocab ships with the RAW dataset; subscan generation copies
    # it into the subscan workspace, but fall back to the raw dir
    vocab_path = osp.join(data_dir, "files", "relationships.txt")
    if not osp.exists(vocab_path) and cfg.data.root_dir:
        vocab_path = osp.join(cfg.data.root_dir, "files", "relationships.txt")
    rel2idx = name2idx(vocab_path)

    print(f"[INFO] preprocessing split={args.split} mode={pargs.mode}")
    _, data_write_dir = process_split(cfg, pargs, args.split, rel2idx,
                                      use_device_fps=not args.host_fps)
    base_vocab = load_pkl_data(args.obj_attr_vocab) if args.obj_attr_vocab else None
    calculate_bow_node_attr_feats(data_write_dir, base_vocab)
    calculate_bow_node_edge_feats(data_write_dir, rel2idx)
    print(f"[INFO] wrote {data_write_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
