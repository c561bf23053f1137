"""Config system: typed dataclasses with the reference's YAML key surface.

The reference uses a yacs ``CfgNode`` tree (/root/reference/configs/default.py:6-86)
merged from YAML files. We keep the exact same YAML keys so existing config files
(e.g. /root/reference/configs/scan3r/scan3r_ground_truth.yaml) parse unchanged, but
implement it as plain dataclasses — no global mutable singleton, no module-level
path constants (the reference hardcodes dataset roots in utils/define.py:3-10).

TPU-specific knobs live in the extra ``tpu`` section (static padding sizes, mesh
layout, dtypes); they have defaults so reference YAMLs need no edits.
"""

from __future__ import annotations

import dataclasses
import os.path as osp
from dataclasses import dataclass, field
from typing import Any

import yaml


@dataclass
class DataConfig:
    name: str = "Scan3R"
    root_dir: str = ""
    subscan_dir: str = ""
    label_file_name: str = ""
    ply_subfix: str = ""
    seg_subfix: str = ""
    aggre_subfix: str = ""


@dataclass
class PreprocessConfig:
    pc_resolutions: list[int] = field(default_factory=lambda: [512])
    subscenes_per_scene: int = 7
    min_obj_points: int = 50
    anchor_type_name: str = ""
    # Fraction band of scene points a subscan must cover (reference samples
    # uniformly in [0.2, 0.5]; preprocessing/scan3r/subgenscan3r.py:162-171).
    filter_segment_size: int = 512
    # radius used for point-overlap queries (reference uses exact-match 1e-7,
    # utils/point_cloud.py:98)
    overlap_radius: float = 1e-7


@dataclass
class TrainConfig:
    batch_size: int = 4
    pc_res: int = 512
    # The reference initializes these knobs but never applies augmentation
    # (scan3r.py:44-55 — dead config upstream). Here augmentation actually
    # works, gated behind augmentation_active so the default training
    # behavior stays reference-identical.
    use_augmentation: bool = True
    rot_factor: float = 1.0
    augmentation_noise: float = 0.005
    augmentation_active: bool = False
    log_steps: int = 1
    # best-snapshot criterion over the val epoch summary. The reference
    # tracks val loss only (epoch_based_trainer.py:165-168); tracking a task
    # metric directly (e.g. 'mrr' with mode 'max') is an extension the
    # reference's dead-code schedules never reached.
    best_metric: str = "loss"
    best_mode: str = "min"


@dataclass
class ValConfig:
    data_mode: str = "orig"
    batch_size: int = 4
    pc_res: int = 512
    overlap_low: float = 0.0
    overlap_high: float = 0.0


@dataclass
class ModelConfig:
    rel_dim: int = 41
    attr_dim: int = 164
    alignment_thresh: float = 0.4
    # Architecture hyper-params mirroring MultiModalEncoder defaults
    # (/root/reference/src/aligner/sg_aligner.py:38).
    emb_dim: int = 100
    pt_out_dim: int = 256
    hidden_units: list[int] = field(default_factory=lambda: [3, 128, 128])
    heads: list[int] = field(default_factory=lambda: [2, 2])
    dropout: float = 0.0
    attn_dropout: float = 0.0
    # "parity" replicates the reference quirk where PointNet BatchNorm outputs
    # are computed but discarded (pointnet.py:141-159) — required to match
    # released checkpoints. "active" applies BN properly.
    pointnet_bn_mode: str = "parity"


@dataclass
class OptimConfig:
    lr: float = 1e-3
    lr_decay: float = 0.95
    lr_decay_steps: int = 1
    weight_decay: float = 1e-6
    max_epoch: int = 50
    grad_acc_steps: int = 1
    # The reference's ExponentialLR is commented out (trainval_sgaligner.py:55-56)
    # so training runs at constant LR; "exponential" opts into the decay the
    # cfg keys describe, "cosine"/"warmup-cosine" mirror the unused helpers in
    # the reference's utils/torch_util.py:110-145.
    scheduler: str = "none"
    warmup_steps: int = 0
    # steps per epoch for epoch-denominated schedules; 0 = decay per step
    steps_per_epoch: int = 0


@dataclass
class LossConfig:
    alignment_loss_weight: float = 1.0
    constrastive_loss_weight: float = 1.0  # sic — reference key name
    zoom: float = 0.1


@dataclass
class RegModelConfig:
    K: int = 1
    neighbor_limits: list[int] = field(default_factory=lambda: [38, 36, 36, 38])
    num_p2p_corrs: int = 20000
    corr_score_thresh: float = 0.1
    rmse_thresh: float = 0.2
    inlier_ratio_thresh: float = 0.05
    ransac_threshold: float = 0.03
    ransac_min_iters: int = 5000
    ransac_max_iters: int = 5000
    ransac_use_sprt: bool = True
    # Registration backend: "ransac" (built-in JAX batched Kabsch-RANSAC over
    # mutual-NN correspondences), "learned" (self-contained JAX
    # GeoTransformer-class matcher, reg/geo_model.py + checkpoints/geo_reg),
    # "geotransformer" (external torch checkout adapter).
    backend: str = "ransac"
    # Coarse initializer for the MutualNN backend: "none" (reference's
    # same-world-frame eval semantics) or "pca" (principal-axes alignment,
    # needed when subscan pairs carry a non-identity gt transform).
    coarse: str = "none"


@dataclass
class MetricsConfig:
    all_k: list[int] = field(default_factory=lambda: [1, 2, 3, 4, 5])


@dataclass
class TpuConfig:
    """Static-shape + sharding knobs (no reference equivalent)."""

    # Max objects per graph (per subscan). Scene graphs in 3RScan subscans have
    # ~5-40 objects; pairs are padded to [2 * max_objects] slots.
    max_objects: int = 48
    # Max anchors per pair (<= max_objects).
    max_anchors: int = 48
    # Points per object (== train.pc_res normally).
    points_per_object: int = 512
    # Compute dtype for the model ("bfloat16" or "float32"). Params stay f32.
    compute_dtype: str = "float32"
    # Data-parallel mesh size (number of devices along the "dp" axis); 0 = all.
    dp: int = 0
    # Object compaction: route only this many mask-compacted object slots per
    # pair (out of 2*max_objects) through the point encoder. 0 = off. Must be
    # >= the max real objects of any pair (validated at shard time).
    compact_slots: int = 0
    # Batch-POOLED compaction (data/batch.py::pool_compact): pack all real
    # objects of the batch into one flat axis, bucketed to this multiple
    # (0 = off). Tighter than compact_slots at typical occupancy; single-chip
    # only (incompatible with pair-axis dp sharding).
    pooled_bucket: int = 0
    # Fused Pallas kernel policy: "auto" (fused on TPU, XLA on CPU), "always"
    # (fused everywhere — interpret mode off-TPU; used to exercise the
    # flagship kernel path on virtual CPU meshes), "never".
    fused: str = "auto"
    # Pad the pair-batch dim to a multiple of dp.
    donate_batch: bool = True


@dataclass
class Config:
    seed: int = 42
    num_workers: int = 4
    model_name: str = ""
    modules: list[str] = field(default_factory=list)
    registration: bool = False
    modality: str = ""
    scan_type: str = "subscan"

    data: DataConfig = field(default_factory=DataConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    val: ValConfig = field(default_factory=ValConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    reg_model: RegModelConfig = field(default_factory=RegModelConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    tpu: TpuConfig = field(default_factory=TpuConfig)

    # Derived (filled by update_config, mirroring configs/default.py:89-108)
    output_dir: str = ""
    snapshot_dir: str = ""
    log_dir: str = ""
    event_dir: str = ""
    exp_name: str = ""


def _merge_into_dataclass(obj: Any, values: dict[str, Any], path: str = "") -> None:
    """Recursively merge a dict of YAML values into a dataclass instance."""
    valid = {f.name: f for f in dataclasses.fields(obj)}
    for key, val in values.items():
        if key not in valid:
            # Tolerate unknown keys (the reference YAMLs contain a typo
            # 'subsan_dir' in scan3r_gt_w_wo_overlap.yaml) but surface them.
            import warnings

            warnings.warn(f"Unknown config key: {path}{key}", stacklevel=2)
            continue
        cur = getattr(obj, key)
        if dataclasses.is_dataclass(cur) and isinstance(val, dict):
            _merge_into_dataclass(cur, val, path=f"{path}{key}.")
        else:
            setattr(obj, key, val)


def load_yaml(filename: str) -> dict[str, Any]:
    with open(filename) as f:
        return yaml.safe_load(f) or {}


def make_cfg(**overrides: Any) -> Config:
    cfg = Config()
    if overrides:
        _merge_into_dataclass(cfg, overrides)
    return cfg


def update_config(cfg: Config, filename: str, ensure_dir: bool = True,
                  output_root: str | None = None) -> Config:
    """Merge a YAML file into ``cfg``; derive + create the output dir tree.

    Mirrors the reference's update_config (configs/default.py:89-108): the output
    tree is ``<root>/output/<data.name>/<model_name>/<'_'.join(modules)>`` with
    ``snapshots/``, ``logs/``, ``events/`` subdirs. Unlike the reference, the
    root is configurable (defaults to CWD) instead of the repo checkout dir.
    """
    _merge_into_dataclass(cfg, load_yaml(filename))

    if ensure_dir:
        import os

        root = output_root if output_root is not None else os.getcwd()
        cfg.exp_name = "_".join(cfg.modules)
        cfg.output_dir = osp.join(root, "output", cfg.data.name, cfg.model_name, cfg.exp_name)
        cfg.snapshot_dir = osp.join(cfg.output_dir, "snapshots")
        cfg.log_dir = osp.join(cfg.output_dir, "logs")
        cfg.event_dir = osp.join(cfg.output_dir, "events")
        for d in (cfg.output_dir, cfg.snapshot_dir, cfg.log_dir, cfg.event_dir):
            os.makedirs(d, exist_ok=True)

    return cfg


def to_dict(cfg: Config) -> dict[str, Any]:
    return dataclasses.asdict(cfg)
