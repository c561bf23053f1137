"""End-to-end raw-scene pipeline: scene -> subscans -> filesets -> preprocess."""

import os.path as osp

import numpy as np
import pytest

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.fixtures import make_raw_scene_workspace
from sgaligner_tpu.data.filesets import (
    gen_all_pairs_fileset,
    gen_scan_subscan_mapping,
)
from sgaligner_tpu.data.preprocess import PerturbArgs, process_split
from sgaligner_tpu.data.subscan_gen import SubGenScan3R
from sgaligner_tpu.utils.io import load_json
from sgaligner_tpu.utils.scan3r_io import read_ply_vertices


@pytest.fixture(scope="module")
def raw_world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("raw3rscan")
    root = tmp / "scan3r"
    out = tmp / "subscans"
    info = make_raw_scene_workspace(str(root), split="train", n_scenes=1)
    cfg = make_cfg(model_name="sgaligner", modules=["point", "gat", "rel", "attr"])
    cfg.data.root_dir = str(root)
    cfg.data.subscan_dir = str(out)
    cfg.preprocess.min_obj_points = 30
    cfg.preprocess.subscenes_per_scene = 7
    cfg.preprocess.pc_resolutions = [32]
    gen = SubGenScan3R(cfg, split="train")
    gen.generate_all()
    gen.calculate_overlap()
    gen.write_metadata()
    return {"cfg": cfg, "root": str(root), "out": str(out), "info": info}


def test_ply_roundtrip(raw_world):
    ply = read_ply_vertices(osp.join(
        raw_world["root"], "scans", "rawscene00",
        "labels.instances.align.annotated.v2.ply"))
    assert ply.shape[0] == 10 * 300
    assert set(np.unique(ply["objectId"])) == set(range(1, 11))


def test_subscans_generated(raw_world):
    import os

    out = raw_world["out"]
    subscans = os.listdir(osp.join(out, "scans"))
    assert len(subscans) >= 2, subscans
    rec = np.load(osp.join(out, "scans", subscans[0], "data.npy"))
    assert rec.dtype.names[:3] == ("x", "y", "z")
    # carved jsons exist with per-subscan entries
    rels = load_json(osp.join(out, "files",
                              "relationships_subscenes_train.json"))
    assert len(rels["scans"]) == len(subscans)


def test_overlap_anchors(raw_world):
    anchors = load_json(osp.join(raw_world["out"], "files",
                                 "anchors_train.json"))
    assert len(anchors) >= 1
    for a in anchors:
        assert 0.1 <= a["overlap"] <= 0.9
        assert len(a["anchorIds"]) >= 1


def test_filesets(raw_world):
    files_dir = osp.join(raw_world["out"], "files")
    # write mode-dir copies as gen_all_pairs expects mode layout
    import shutil

    mode_dir = osp.join(files_dir, "orig")
    import os

    os.makedirs(mode_dir, exist_ok=True)
    for fn in ("train_scans_subscenes.txt", "anchors_train.json"):
        shutil.copy(osp.join(files_dir, fn), osp.join(mode_dir, fn))

    pairs = gen_all_pairs_fileset(files_dir, "train")
    n_pos = sum(1 for p in pairs if p["overlap"] > 0)
    n_neg = sum(1 for p in pairs if p["overlap"] == 0)
    assert n_neg <= n_pos and n_neg >= 1

    mapping = gen_scan_subscan_mapping(
        osp.join(raw_world["root"], "files"), files_dir, "train")
    assert "rawscene00" in mapping and len(mapping["rawscene00"]) >= 2


def test_preprocess_generated_subscans(raw_world):
    cfg = raw_world["cfg"]
    _, write_dir = process_split(cfg, PerturbArgs(), "train",
                                 raw_world["info"]["rel2idx"],
                                 use_device_fps=False)
    import os

    pkls = os.listdir(osp.join(write_dir, "data"))
    assert len(pkls) >= 2
