"""CLI smoke tests: full preprocess -> train -> snapshot flow on a tiny workspace."""

import numpy as np

from sgaligner_tpu.cli.preprocess import main as preprocess_main
from sgaligner_tpu.cli.trainval_sgaligner import main as trainval_main
from sgaligner_tpu.data.fixtures import make_raw_workspace, make_synthetic_workspace


def _write_cfg(tmp_path, root, max_epoch=1, pc_res=32):
    cfg_text = f"""
seed: 42
num_workers: 2
model_name: 'sgaligner'
modules: ['point', 'gat', 'rel', 'attr']
scan_type: 'subscan'
data:
  name: Scan3R
  subscan_dir: {root}
preprocess:
  pc_resolutions: [{pc_res}]
  min_obj_points: 10
train:
  batch_size: 2
  pc_res: {pc_res}
val:
  batch_size: 2
  pc_res: {pc_res}
optim:
  max_epoch: {max_epoch}
tpu:
  max_objects: 12
  points_per_object: {pc_res}
  dp: 1
"""
    f = tmp_path / "cfg.yaml"
    f.write_text(cfg_text)
    return str(f)


def test_preprocess_cli(tmp_path):
    root = tmp_path / "ws"
    make_raw_workspace(str(root), split="val", n_pairs=1)
    cfg_file = _write_cfg(tmp_path, root)
    rc = preprocess_main(["--config", cfg_file, "--split", "val", "--host_fps"])
    assert rc == 0
    assert (root / "files" / "orig" / "data" / "raw00_src.pkl").exists()
    assert (root / "files" / "orig" / "anchors_val.json").exists()


def test_trainval_cli_end_to_end(tmp_path):
    root = tmp_path / "ws"
    make_synthetic_workspace(str(root), split="train", n_pairs=4,
                             pc_resolutions=[32])
    make_synthetic_workspace(str(root), split="val", n_pairs=2,
                             pc_resolutions=[32])
    cfg_file = _write_cfg(tmp_path, root)
    out_root = tmp_path / "out"
    rc = trainval_main(["--config", cfg_file, "--output_root", str(out_root)])
    assert rc == 0
    snap_dir = out_root / "output" / "Scan3R" / "sgaligner" / \
        "point_gat_rel_attr" / "snapshots"
    assert (snap_dir / "epoch-1").is_dir()
    assert (snap_dir / "snapshot").is_dir()
    log = next((out_root / "output" / "Scan3R" / "sgaligner" /
                "point_gat_rel_attr" / "logs").glob("*.log"))
    text = log.read_text()
    assert "val" in text and "mrr" in text


def test_export_serving_cli(tmp_path):
    """trainval snapshot -> export_serving CLI -> load artifact -> run.

    The deployment chain the reference lacks: a trained orbax snapshot is
    frozen into a jax.export artifact and serves inference without the
    config/model machinery."""
    import json

    from sgaligner_tpu.cli.export_serving import main as export_main
    from sgaligner_tpu.data.batch import BatchSpec
    from sgaligner_tpu.data.synthetic import make_synthetic_batch
    from sgaligner_tpu.serving import load_serving_artifact

    root = tmp_path / "ws"
    make_synthetic_workspace(str(root), split="train", n_pairs=4,
                             pc_resolutions=[32])
    make_synthetic_workspace(str(root), split="val", n_pairs=2,
                             pc_resolutions=[32])
    cfg_file = _write_cfg(tmp_path, root)
    out_root = tmp_path / "out"
    assert trainval_main(["--config", cfg_file,
                          "--output_root", str(out_root)]) == 0
    snap = out_root / "output" / "Scan3R" / "sgaligner" / \
        "point_gat_rel_attr" / "snapshots" / "epoch-1"

    art_dir = tmp_path / "artifact"
    rc = export_main(["--config", cfg_file, "--snapshot", str(snap),
                      "--out", str(art_dir), "--batch", "2",
                      "--platform", "cpu"])
    assert rc == 0
    assert (art_dir / "serving.jaxexport").exists()
    meta = json.loads((art_dir / "meta.json").read_text())
    assert meta["batch_size"] == 2 and meta["platforms"] == ["cpu"]

    art = load_serving_artifact(str(art_dir))
    spec = BatchSpec(batch_size=2, max_objects=12, points_per_object=32)
    host = {k: np.asarray(v)
            for k, v in make_synthetic_batch(spec, seed=5).items()}
    out = art(host)
    assert float(np.asarray(out["rr_count"])) > 0
    assert np.isfinite(float(np.asarray(out["rr_sum"])))
