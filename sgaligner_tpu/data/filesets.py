"""Pair fileset + mapping generators.

Equivalents of the reference's preprocessing helpers:
* ``gen_all_pairs_fileset`` (/root/reference/preprocessing/
  gen_all_pairs_fileset.py:12-53): sample non-overlapping subscan pairs equal in
  count to the overlapping ones — the overlap-classifier eval set.
* ``gen_scan_subscan_mapping`` (gen_scan_subscan_mapping.py:17-34).
* ``gen_rescan_to_refscan_map`` (gen_rescan_to_refscan_mapping.py:17-36).
"""

from __future__ import annotations

import itertools
import os.path as osp
import random

import numpy as np

from sgaligner_tpu.utils import io, scan3r_io


def gen_all_pairs_fileset(subscans_files_dir: str, split: str,
                          mode: str = "orig", seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    subscan_ids = list(np.atleast_1d(np.genfromtxt(
        osp.join(subscans_files_dir, mode, f"{split}_scans_subscenes.txt"),
        dtype=str)))
    rng.shuffle(subscan_ids)
    all_overlap = io.load_json(
        osp.join(subscans_files_dir, f"anchors_{split}_all.json"))
    overlapping = {(a["src"], a["ref"]) for a in all_overlap}

    dumped = io.load_json(
        osp.join(subscans_files_dir, mode, f"anchors_{split}.json"))

    pairs = list(itertools.combinations(range(len(subscan_ids)), 2))
    rng.shuffle(pairs)
    negatives = []
    for a, b in pairs:
        if len(negatives) >= len(dumped):
            break
        key = (subscan_ids[a], subscan_ids[b])
        if key not in overlapping:
            negatives.append({"src": key[0], "ref": key[1],
                              "overlap": 0.0, "anchorIds": []})

    anchor_data = list(dumped) + negatives
    rng.shuffle(anchor_data)
    io.write_json(anchor_data, osp.join(
        subscans_files_dir, mode,
        f"anchors_subscan_anchors_w_wo_overlap_{split}.json"))
    return anchor_data


def gen_scan_subscan_mapping(scans_files_dir: str, subscans_files_dir: str,
                             split: str, mode: str = "orig") -> dict:
    scan_ids = scan3r_io.get_scan_ids(scans_files_dir, split)
    subscan_ids = np.atleast_1d(np.genfromtxt(
        osp.join(subscans_files_dir, mode, f"{split}_scans_subscenes.txt"),
        dtype=str))
    mapping = {}
    for scan_id in scan_ids:
        per_scan = sorted(s for s in subscan_ids if s.startswith(scan_id))
        if per_scan:
            mapping[str(scan_id)] = per_scan
    io.write_json(mapping, osp.join(
        subscans_files_dir, mode, f"scan_subscan_map_{split}.json"))
    return mapping


def gen_rescan_to_refscan_map(scans_files_dir: str, split: str) -> list[dict]:
    all_scan_data = io.load_json(osp.join(scans_files_dir, "3RScan.json"))
    scan_ids = set(scan3r_io.get_scan_ids(scans_files_dir, split).tolist())
    anchor_data = []
    for scan_data in all_scan_data:
        ref_scan_id = scan_data["reference"]
        for scan in scan_data["scans"]:
            rescan_id = scan["reference"]
            if rescan_id in scan_ids and ref_scan_id in scan_ids:
                anchor_data.append({"src": rescan_id, "ref": ref_scan_id})
    io.write_json(anchor_data, osp.join(
        scans_files_dir, f"anchors_rescans_to_refscans_{split}.json"))
    return anchor_data
