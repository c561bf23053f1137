"""Inference driver tests: align+registration, overlap classifier, mosaicking.

Runs the full downstream stack on fixture workspaces with the self-contained
MutualNN registration backend. Fixture subscan pairs share a world frame (like
the reference's evaluation setting, inference_align_reg.py:168), so the
estimated transforms must be near-identity and mosaicking near-perfect.
"""

import numpy as np
import pytest

from sgaligner_tpu.cli.inference_align_reg import main as align_reg_main
from sgaligner_tpu.cli.inference_find_overlapper import main as overlap_main
from sgaligner_tpu.cli.inference_mosaicking import main as mosaick_main
from sgaligner_tpu.cli.trainval_sgaligner import main as trainval_main
from sgaligner_tpu.data.fixtures import make_synthetic_workspace


@pytest.fixture(scope="module")
def trained_workspace(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("infer")
    root = tmp_path / "ws"
    make_synthetic_workspace(str(root), split="train", n_pairs=4,
                             pc_resolutions=[32], pts_per_obj=150, seed=0)
    make_synthetic_workspace(str(root), split="val", n_pairs=2,
                             pc_resolutions=[32], pts_per_obj=150, seed=10,
                             n_nonoverlap_pairs=2)
    cfg_text = f"""
model_name: 'sgaligner'
modules: ['point', 'gat', 'rel', 'attr']
registration: True
data:
  subscan_dir: {root}
preprocess:
  pc_resolutions: [32]
train: {{batch_size: 2, pc_res: 32}}
val: {{batch_size: 2, pc_res: 32}}
optim: {{max_epoch: 1}}
reg_model: {{ransac_max_iters: 200, num_p2p_corrs: 2000}}
tpu: {{max_objects: 12, dp: 1}}
"""
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(cfg_text)
    out_root = tmp_path / "out"
    rc = trainval_main(["--config", str(cfg_file), "--output_root",
                        str(out_root)])
    assert rc == 0
    return {"cfg": str(cfg_file), "out": str(out_root), "root": str(root)}


def test_align_reg_inference(trained_workspace, capsys):
    rc = align_reg_main(["--config", trained_workspace["cfg"],
                         "--output_root", trained_workspace["out"]])
    assert rc == 0
    import json

    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= results["mrr"] <= 1.0
    assert "hits@5" in results and results["hits@5"] >= results["hits@1"]
    # same-frame clouds: the normal path must recover ~identity
    normal = results["normal_registration"]
    assert normal["RRE"] < 2.0, normal
    assert normal["RTE"] < 0.05, normal
    assert normal["recall"] == 1.0, normal
    aligner = results["aligner_registration"]
    assert aligner["RRE"] < 5.0, aligner
    assert set(aligner) == {"CD", "IR", "RRE", "RTE", "recall", "FMR"}


def test_overlap_inference(trained_workspace, capsys):
    rc = overlap_main(["--config", trained_workspace["cfg"],
                       "--output_root", trained_workspace["out"]])
    assert rc == 0
    import json

    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("aligner_overlapper", "registration_overlapper"):
        m = results[key]
        assert set(m) == {"precision", "recall", "f1_score"}
        assert 0.0 <= m["f1_score"] <= 1.0
    # registration corr-score separates same-frame overlap pairs cleanly
    assert results["registration_overlapper"]["recall"] == 1.0


def test_mosaicking_inference(trained_workspace, capsys):
    rc = mosaick_main(["--config", trained_workspace["cfg"],
                       "--output_root", trained_workspace["out"],
                       "--max_scans", "2"])
    assert rc == 0
    import json

    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    normal = results["normal_mosaicking_metrics"]
    assert normal["fscore"] > 0.9, normal
    assert normal["acc"] < 0.05, normal
    aligner = results["aligner_mosaicking_metrics"]
    assert set(aligner) == {"prec", "recall", "acc", "comp", "fscore"}
