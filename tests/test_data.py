"""Data layer tests: workspace fixtures -> dataset -> loaders -> preprocessing."""

import numpy as np

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.fixtures import make_raw_workspace, make_synthetic_workspace
from sgaligner_tpu.data.loaders import BatchLoader, get_train_val_data_loader
from sgaligner_tpu.data.preprocess import (
    PerturbArgs,
    calculate_bow_node_attr_feats,
    calculate_bow_node_edge_feats,
    process_split,
)
from sgaligner_tpu.data.scan3r import Scan3RDataset
from sgaligner_tpu.utils.io import load_pkl_data


def _cfg(root, res=64):
    cfg = make_cfg(model_name="sgaligner", modules=["point", "gat", "rel", "attr"])
    cfg.data.subscan_dir = str(root)
    cfg.train.pc_res = res
    cfg.val.pc_res = res
    cfg.train.batch_size = 2
    cfg.val.batch_size = 2
    cfg.tpu.max_objects = 12
    return cfg


def test_dataset_reads_workspace(tmp_path):
    make_synthetic_workspace(str(tmp_path), split="val", n_pairs=3)
    cfg = _cfg(tmp_path)
    ds = Scan3RDataset(cfg, split="val")
    assert len(ds) == 3
    s = ds[0]
    assert s["obj_points"].shape == (24, 3, 64)
    assert s["n_src"] == 7 and s["n_ref"] == 7
    assert s["anchor_mask"].sum() == 4            # all 4 shared anchors at val
    # anchored ids match across sides
    am = s["anchor_mask"]
    assert (s["obj_ids"][s["e1i"][am]] == s["obj_ids"][s["e2i"][am]]).all()
    # points are centered by the src scene mean
    valid_pts = s["obj_points"][s["obj_mask"]]
    assert np.abs(valid_pts.mean()) < 1.0


def test_train_split_subsamples_anchors(tmp_path):
    make_synthetic_workspace(str(tmp_path), split="train", n_pairs=2, n_shared=8)
    cfg = _cfg(tmp_path)
    ds = Scan3RDataset(cfg, split="train")
    s = ds[0]
    # 30% of 8 anchors = 2.4 -> int 2 (floor), min 2 (scan3r.py:89-91)
    assert s["anchor_mask"].sum() == 2


def test_train_anchor_subsample_parity_small_counts(tmp_path):
    """Reference expression `2 if int(0.3*len)<1 else int(0.3*len)`
    (/root/reference/src/datasets/scan3r.py:89-90): 5 anchors -> int(1.5)=1,
    NOT max(2, 1)=2 — pairs with 4-6 anchors train on exactly ONE anchor."""
    make_synthetic_workspace(str(tmp_path), split="train", n_pairs=2, n_shared=5)
    cfg = _cfg(tmp_path)
    ds = Scan3RDataset(cfg, split="train")
    assert ds[0]["anchor_mask"].sum() == 1
    # and below the 0.3 floor (len<=3 -> int<1) the count snaps to 2
    make_synthetic_workspace(str(tmp_path / "w2"), split="train", n_pairs=2,
                             n_shared=3)
    cfg2 = _cfg(tmp_path / "w2")
    ds2 = Scan3RDataset(cfg2, split="train")
    assert ds2[0]["anchor_mask"].sum() == 2


def test_val_overlap_band_filter(tmp_path):
    make_synthetic_workspace(str(tmp_path), split="val", n_pairs=5)
    cfg = _cfg(tmp_path)
    cfg.val.overlap_low = 0.0
    cfg.val.overlap_high = 0.5
    ds = Scan3RDataset(cfg, split="val")
    assert all(a["overlap"] < 0.5 for a in ds.anchor_data)


def test_loaders(tmp_path):
    make_synthetic_workspace(str(tmp_path), split="train", n_pairs=5)
    make_synthetic_workspace(str(tmp_path), split="val", n_pairs=3)
    cfg = _cfg(tmp_path)
    train, val = get_train_val_data_loader(cfg)
    assert len(train) == 2  # 5 pairs, bs 2, drop_last
    assert len(val) == 2    # 3 pairs, bs 2, keep last
    tb = list(train)
    assert len(tb) == 2 and tb[0]["obj_points"].shape[0] == 2
    vb = list(val)
    assert vb[-1]["obj_points"].shape[0] == 1  # last partial batch kept

    # shuffling differs between epochs but preserves the sample set
    loader = BatchLoader(Scan3RDataset(cfg, split="train"), 5, shuffle=True,
                         drop_last=True, seed=7, num_workers=1)
    e1 = next(iter(loader))["overlap"]
    e2 = next(iter(loader))["overlap"]
    assert sorted(e1.tolist()) == sorted(e2.tolist())


def test_preprocess_pipeline(tmp_path):
    info = make_raw_workspace(str(tmp_path), split="val", n_pairs=2)
    cfg = _cfg(tmp_path, res=32)
    cfg.preprocess.pc_resolutions = [32]
    cfg.preprocess.min_obj_points = 10

    _, write_dir = process_split(cfg, PerturbArgs(), "val", info["rel2idx"],
                                 use_device_fps=False)
    calculate_bow_node_attr_feats(write_dir)
    calculate_bow_node_edge_feats(write_dir, info["rel2idx"])

    d = load_pkl_data(f"{write_dir}/data/raw00_src.pkl")
    n = d["objects_count"]
    assert n == 6
    # dense none-completion: every ordered pair has an edge
    assert d["edges_count"] == n * (n - 1)
    assert d["obj_points"][32].shape == (n, 32, 3)
    assert d["bow_vec_object_edge_feats"].shape == (n, len(info["rel2idx"]))
    assert d["bow_vec_object_attr_feats"].shape[0] == n
    assert d["rel_trans"].shape == (n, 3)
    # root object has zero relative translation to itself
    root_idx = d["object_id2idx"][d["root_obj_id"]]
    np.testing.assert_allclose(d["rel_trans"][root_idx], 0.0, atol=1e-12)
    # each object's edge-BoW counts its outgoing edges (n-1 in a dense graph)
    assert (d["bow_vec_object_edge_feats"].sum(1) == n - 1).all()

    # the preprocessed output feeds the dataset directly
    ds = Scan3RDataset(cfg, split="val")
    s = ds[0]
    assert s["n_src"] == 6 and s["anchor_mask"].sum() == 4


def test_preprocess_perturbation_modes(tmp_path):
    info = make_raw_workspace(str(tmp_path), split="val", n_pairs=1,
                              n_shared=6, n_extra=4)
    cfg = _cfg(tmp_path, res=32)
    cfg.preprocess.pc_resolutions = [32]
    cfg.preprocess.min_obj_points = 10

    _, orig_dir = process_split(cfg, PerturbArgs(), "val", info["rel2idx"],
                                use_device_fps=False)
    args = PerturbArgs(remove_node=True)
    assert args.mode == "node_removed"
    _, pert_dir = process_split(cfg, args, "val", info["rel2idx"],
                                use_device_fps=False)
    assert pert_dir.endswith("node_removed")
    d_orig = load_pkl_data(f"{orig_dir}/data/raw00_src.pkl")
    d_pert = load_pkl_data(f"{pert_dir}/data/raw00_src.pkl")
    assert d_pert["objects_count"] < d_orig["objects_count"]


def test_augmentation_opt_in(tmp_path):
    """Augmentation is OFF by default (reference-identical behavior; its
    augmentation config is dead code) and, when enabled, applies a per-side
    z-rotation + jitter that preserves pairwise geometry and rotates the
    rel_pose structure features consistently."""
    make_synthetic_workspace(str(tmp_path), split="train", n_pairs=1)
    cfg = _cfg(tmp_path)

    ds_off = Scan3RDataset(cfg, split="train")
    s_off = ds_off[0]

    cfg.train.augmentation_active = True
    ds_on = Scan3RDataset(cfg, split="train")
    s_on = ds_on[0]

    m = s_off["obj_mask"]
    pts_off = s_off["obj_points"][m]   # [n, 3, P]
    pts_on = s_on["obj_points"][m]
    assert not np.allclose(pts_off, pts_on)
    # per-object centroid distances from origin preserved up to jitter
    c_off = np.linalg.norm(pts_off.mean(-1), axis=-1)
    c_on = np.linalg.norm(pts_on.mean(-1), axis=-1)
    np.testing.assert_allclose(c_off, c_on, atol=0.05)
    # rel_pose norms preserved exactly under the rotation
    np.testing.assert_allclose(
        np.linalg.norm(s_off["rel_pose"][m], axis=-1),
        np.linalg.norm(s_on["rel_pose"][m], axis=-1), rtol=1e-5, atol=1e-6)

    # off-mode is unchanged vs a fresh dataset (deterministic contract)
    s_off2 = Scan3RDataset(_cfg(tmp_path), split="train")[0]
    np.testing.assert_array_equal(s_off["obj_points"], s_off2["obj_points"])


def test_fps_device_matches_host_semantics():
    """The batched jax FPS selects a maximally-spread subset like the host FPS."""
    import jax.numpy as jnp

    from sgaligner_tpu.ops.fps import farthest_point_sample
    from sgaligner_tpu.utils.pointcloud import pcl_farthest_sample

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(1, 200, 3)).astype(np.float32)
    idxs = np.asarray(farthest_point_sample(jnp.array(pts), 16, start_idx=5))
    assert idxs.shape == (1, 16)
    assert len(set(idxs[0].tolist())) == 16  # distinct picks

    # deterministic equivalence with the host loop given the same start
    class FixedStart:
        def __init__(self, start):
            self.start = start

        def integers(self, lo, hi):
            return self.start

        def choice(self, *a, **k):
            raise AssertionError("unexpected")

    host_pts, host_idx = pcl_farthest_sample(pts[0], 16, return_idxs=True,
                                             rng=FixedStart(5))
    np.testing.assert_array_equal(idxs[0], host_idx)
