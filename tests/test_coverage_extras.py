"""Coverage extras: scan-type path, EVA inference CLI, multi-res preprocessing."""

import numpy as np

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.fixtures import make_raw_workspace, make_synthetic_workspace
from sgaligner_tpu.data.preprocess import PerturbArgs, process_split
from sgaligner_tpu.data.scan3r import Scan3RDataset
from sgaligner_tpu.utils.io import load_pkl_data


def test_scan_type_scan_reads_root_dir(tmp_path):
    """scan_type='scan' reads from data.root_dir (reference scan3r.py:21-24)."""
    make_synthetic_workspace(str(tmp_path), split="val", n_pairs=2)
    cfg = make_cfg(model_name="sgaligner", modules=["point"],
                   scan_type="scan")
    cfg.data.root_dir = str(tmp_path)
    cfg.train.pc_res = 64
    cfg.val.pc_res = 64
    cfg.tpu.max_objects = 12
    ds = Scan3RDataset(cfg, split="val")
    assert len(ds) == 2
    s = ds[0]
    assert s["n_src"] == 7


def test_multi_resolution_preprocess(tmp_path):
    """pc_resolutions=[64, 32]: the reference re-samples each resolution from
    the PREVIOUS resolution's output (preprocess.py:98-100 quirk)."""
    info = make_raw_workspace(str(tmp_path), split="val", n_pairs=1)
    cfg = make_cfg(model_name="sgaligner", modules=["point"])
    cfg.data.subscan_dir = str(tmp_path)
    cfg.preprocess.pc_resolutions = [64, 32]
    cfg.preprocess.min_obj_points = 10

    _, write_dir = process_split(cfg, PerturbArgs(), "val", info["rel2idx"],
                                 use_device_fps=False)
    d = load_pkl_data(f"{write_dir}/data/raw00_src.pkl")
    assert set(d["obj_points"].keys()) == {64, 32}
    assert d["obj_points"][64].shape[1] == 64
    assert d["obj_points"][32].shape[1] == 32
    # the 32-res sets must be subsets of the 64-res sets (resampling quirk)
    for i in range(d["objects_count"]):
        pts64 = {tuple(np.round(p, 5)) for p in d["obj_points"][64][i]}
        for p in d["obj_points"][32][i]:
            assert tuple(np.round(p, 5)) in pts64


def test_eva_inference_cli(tmp_path, capsys):
    from sgaligner_tpu.cli.inference_align_eva import main as eva_infer_main
    from sgaligner_tpu.cli.trainval_eva import main as eva_train_main

    root = tmp_path / "ws"
    make_synthetic_workspace(str(root), split="train", n_pairs=2,
                             pc_resolutions=[32])
    make_synthetic_workspace(str(root), split="val", n_pairs=2,
                             pc_resolutions=[32])
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(f"""
model_name: 'eva'
modules: ['point', 'gcn', 'rel', 'attr']
data: {{subscan_dir: {root}}}
preprocess: {{pc_resolutions: [32]}}
train: {{batch_size: 2, pc_res: 32}}
val: {{batch_size: 2, pc_res: 32}}
optim: {{max_epoch: 1}}
tpu: {{max_objects: 12, dp: 1}}
""")
    out_root = tmp_path / "out"
    assert eva_train_main(["--config", str(cfg_file),
                           "--output_root", str(out_root)]) == 0
    assert eva_infer_main(["--config", str(cfg_file),
                           "--output_root", str(out_root)]) == 0
    import json

    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= results["mrr"] <= 1.0 and "hits@5" in results
