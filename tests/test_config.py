import warnings

from sgaligner_tpu.core.config import Config, make_cfg, update_config


def test_defaults_match_reference_keys():
    cfg = Config()
    assert cfg.seed == 42
    assert cfg.model.rel_dim == 41
    assert cfg.model.attr_dim == 164
    assert cfg.optim.lr == 1e-3
    assert cfg.optim.weight_decay == 1e-6
    assert cfg.optim.max_epoch == 50
    assert cfg.loss.zoom == 0.1
    assert cfg.reg_model.ransac_threshold == 0.03
    assert cfg.metrics.all_k == [1, 2, 3, 4, 5]
    assert cfg.train.batch_size == 4
    assert cfg.preprocess.pc_resolutions == [512]


def test_yaml_merge(tmp_path):
    yaml_text = """
seed: 7
model_name : 'sgaligner'
modules    : ['pct', 'gat', 'rel', 'attr']
registration : False
scan_type : 'subscan'
data :
  name : Scan3R
  root_dir : /tmp/scan3r
train :
  batch_size : 2
val :
  batch_size : 4
  overlap_low : 0.0
  overlap_high : 0.0
"""
    f = tmp_path / "cfg.yaml"
    f.write_text(yaml_text)
    cfg = update_config(make_cfg(), str(f), output_root=str(tmp_path))
    assert cfg.seed == 7
    assert cfg.modules == ["pct", "gat", "rel", "attr"]
    assert cfg.train.batch_size == 2
    assert cfg.val.batch_size == 4
    assert cfg.exp_name == "pct_gat_rel_attr"
    assert cfg.output_dir.endswith("output/Scan3R/sgaligner/pct_gat_rel_attr")
    import os

    assert os.path.isdir(cfg.snapshot_dir)


def test_unknown_key_warns(tmp_path):
    f = tmp_path / "cfg.yaml"
    f.write_text("data:\n  subsan_dir: /x\n")  # reference YAML typo tolerated
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        update_config(make_cfg(), str(f), ensure_dir=False)
    assert any("subsan_dir" in str(x.message) for x in w)


def test_honor_jax_platforms_env_restores_user_choice():
    """Site hooks that pre-import jax can overwrite jax_platforms after the
    env var was consumed (this box's PJRT sitecustomize sets 'axon,cpu'),
    which then hangs backend init on a dead transport. The helper must make
    the env var win again (subprocess: config mutation + possible backend
    init must not leak into the suite)."""
    import subprocess
    import sys

    code = (
        "import os; os.environ['JAX_PLATFORMS'] = 'cpu'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'fakeplugin,cpu')\n"
        "from sgaligner_tpu.core.platform import honor_jax_platforms_env\n"
        "honor_jax_platforms_env()\n"
        "assert jax.config.jax_platforms == 'cpu', jax.config.jax_platforms\n"
        "print('OK')\n"
    )
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout
