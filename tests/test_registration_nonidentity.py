"""Registration validation under NON-identity ground-truth transforms.

Round-1 review gap: all registration tests shared a world frame (gt == I).
Here the ref side lives in a rigidly transformed frame (45 deg / 0.5 m — the
reference dataset's augmentation bounds, scan3r.py:53-55) and the FULL
aligner-seeded path (node corrs -> per-object backend -> pooled RANSAC ->
RRE/RTE/recall vs the reference thresholds, utils/registration.py:65-105 +
configs/default.py:77-78) must recover it:

* evaluator-level: run_aligner_registration on a synthetic object-pair dict,
* CLI-level: the same fixture wired through cli/inference_align_reg.py via a
  workspace whose anchors entries carry the per-pair "transform".
"""

import json

import numpy as np

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.fixtures import make_synthetic_workspace
from sgaligner_tpu.reg.backend import MutualNNBackend
from sgaligner_tpu.reg.coarse import pca_coarse_align
from sgaligner_tpu.reg.evaluator import RegistrationEvaluator
from sgaligner_tpu.reg.kabsch_test_helpers import random_transform
from sgaligner_tpu.utils.io import make_ply_npy
from sgaligner_tpu.utils.pointcloud import apply_transform


def _scene(rng, n_objects=5, pts_per_obj=200):
    """Objects with anisotropic local geometry (PCA needs distinct axes)."""
    ids = np.arange(1, n_objects + 1)
    pts, oids = [], []
    for i in ids:
        scale = np.array([0.5, 0.25, 0.1]) * (1.0 + 0.3 * rng.random(3))
        axes, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        local = rng.normal(size=(pts_per_obj, 3)) * scale @ axes.T
        center = rng.uniform(-3, 3, size=3)
        pts.append(local + center)
        oids.append(np.full(pts_per_obj, i))
    return np.concatenate(pts).astype(np.float32), np.concatenate(oids), ids


def test_pca_coarse_align_recovers_transform():
    rng = np.random.default_rng(0)
    pts, _, _ = _scene(rng, n_objects=1, pts_per_obj=400)
    gt = random_transform(rng, 45.0, 0.5)
    ref = apply_transform(pts, gt)
    est = pca_coarse_align(pts.astype(np.float64), ref.astype(np.float64))
    np.testing.assert_allclose(est, gt, atol=1e-3)


def test_aligner_registration_nonidentity():
    """Full aligner-seeded path: RRE < 1 deg, RTE < 3 cm, recall == 1."""
    rng = np.random.default_rng(1)
    src_points, oids, ids = _scene(rng)
    gt = random_transform(rng, 45.0, 0.5)
    ref_points = apply_transform(src_points, gt)

    src_ply = make_ply_npy(src_points, oids)
    ref_ply = make_ply_npy(ref_points, oids)
    node_corrs = [(int(i), int(i)) for i in ids]

    cfg = make_cfg(model_name="sgaligner", modules=["point"])
    cfg.reg_model.ransac_max_iters = 500
    evaluator = RegistrationEvaluator(
        cfg, MutualNNBackend(coarse="pca", ransac_iters=500))

    gt_src = src_points  # exact index-paired correspondences
    reg = {
        "node_corrs": node_corrs,
        "src_points": src_points,
        "ref_points": ref_points,
        "src_plydata": src_ply,
        "ref_plydata": ref_ply,
        "raw_points": np.concatenate([src_points, ref_points]),
        "gt_transform": gt,
        "gt_src_corr_points": gt_src,
        "gt_ref_corr_points": ref_points,
    }
    metrics = evaluator.run_aligner_registration(reg)
    assert metrics is not None
    assert metrics["RRE"] < 1.0, metrics     # degrees (registration.py:65-105)
    assert metrics["RTE"] < 0.03, metrics    # meters
    assert metrics["recall"] == 1.0, metrics  # RMSE < cfg.reg_model.rmse_thresh
    assert metrics["FMR"] == 1.0, metrics


def test_align_reg_cli_nonidentity(tmp_path, capsys):
    """The same validation through the real CLI: workspace pairs carry a
    45 deg / 0.5 m transform; the aligner-seeded registration recovers it."""
    from sgaligner_tpu.cli.inference_align_reg import main as align_reg_main
    from sgaligner_tpu.cli.trainval_sgaligner import main as trainval_main

    rng = np.random.default_rng(2)
    gt = random_transform(rng, 45.0, 0.5)
    root = tmp_path / "ws"
    make_synthetic_workspace(str(root), split="train", n_pairs=4,
                             pc_resolutions=[32], pts_per_obj=150, seed=0)
    make_synthetic_workspace(str(root), split="val", n_pairs=2,
                             pc_resolutions=[32], pts_per_obj=150, seed=10,
                             ref_transform=gt)
    # BoW modalities only: identical across sides by construction, so the
    # barely-trained model still produces correct node corrs — the test
    # isolates the REGISTRATION path (a 1-epoch point/gat embedding is not
    # rotation-invariant; invariance is a training property, not wiring)
    cfg_text = f"""
model_name: 'sgaligner'
modules: ['rel', 'attr']
registration: True
data:
  subscan_dir: {root}
preprocess:
  pc_resolutions: [32]
train: {{batch_size: 2, pc_res: 32}}
val: {{batch_size: 2, pc_res: 32}}
optim: {{max_epoch: 1}}
reg_model: {{ransac_max_iters: 500, num_p2p_corrs: 2000, coarse: 'pca'}}
tpu: {{max_objects: 12, dp: 1}}
"""
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(cfg_text)
    out_root = tmp_path / "out"
    assert trainval_main(["--config", str(cfg_file), "--output_root",
                          str(out_root)]) == 0
    assert align_reg_main(["--config", str(cfg_file), "--output_root",
                           str(out_root)]) == 0
    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    aligner = results["aligner_registration"]
    assert aligner["RRE"] < 1.0, aligner
    assert aligner["RTE"] < 0.03, aligner
    assert aligner["recall"] == 1.0, aligner


def test_align_reg_cli_nonidentity_learned_backend(tmp_path, capsys):
    """Dress rehearsal of the LEARNED registration engine through the real
    CLI (round-2 review, do-this #6): ``reg_model.backend: learned`` wired
    end-to-end — val pairs carry a 45 deg / 0.5 m transform, the backend runs
    per-object (aligner path) AND whole-cloud (normal path), and the full
    metric table the reference prints must come back with the transform
    recovered."""
    import os

    import pytest

    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "checkpoints", "geo_reg")
    if not os.path.isdir(ckpt):
        pytest.skip("pretrained geo_reg checkpoint not present")

    from sgaligner_tpu.cli.inference_align_reg import main as align_reg_main
    from sgaligner_tpu.cli.trainval_sgaligner import main as trainval_main

    rng = np.random.default_rng(3)
    gt = random_transform(rng, 45.0, 0.5)
    root = tmp_path / "ws"
    make_synthetic_workspace(str(root), split="train", n_pairs=4,
                             pc_resolutions=[32], pts_per_obj=200, seed=0)
    make_synthetic_workspace(str(root), split="val", n_pairs=1,
                             pc_resolutions=[32], pts_per_obj=200, seed=10,
                             ref_transform=gt)
    cfg_text = f"""
model_name: 'sgaligner'
modules: ['rel', 'attr']
registration: True
data:
  subscan_dir: {root}
preprocess:
  pc_resolutions: [32]
train: {{batch_size: 2, pc_res: 32}}
val: {{batch_size: 2, pc_res: 32}}
optim: {{max_epoch: 1}}
reg_model: {{backend: 'learned', ransac_max_iters: 500, num_p2p_corrs: 2000}}
tpu: {{max_objects: 12, dp: 1}}
"""
    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(cfg_text)
    out_root = tmp_path / "out"
    assert trainval_main(["--config", str(cfg_file), "--output_root",
                          str(out_root)]) == 0
    assert align_reg_main(["--config", str(cfg_file), "--output_root",
                           str(out_root)]) == 0
    results = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("normal_registration", "aligner_registration"):
        m = results[key]
        assert set(m) == {"CD", "IR", "RRE", "RTE", "recall", "FMR"}, m
        assert m["RRE"] < 5.0, (key, m)
        assert m["RTE"] < 0.10, (key, m)
        assert m["recall"] == 1.0, (key, m)
