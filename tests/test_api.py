"""Library API: load_aligner / align / align_arrays."""

import numpy as np

from sgaligner_tpu import api
from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.fixtures import make_synthetic_workspace
from sgaligner_tpu.utils.io import load_plydata_npy  # noqa: F401 (API surface)


def test_align_arrays_point_only():
    cfg = make_cfg(model_name="sgaligner", modules=["point"])
    aligner = api.Aligner(cfg)
    rng = np.random.default_rng(0)
    shared = rng.normal(0, 0.3, size=(4, 64, 3)).astype(np.float32)
    centers = rng.uniform(-2, 2, size=(4, 3)).astype(np.float32)
    src = shared + centers[:, None]
    ref = np.concatenate([shared + centers[:, None],
                          rng.normal(0, 0.3, size=(2, 64, 3)).astype(np.float32)])
    res = aligner.align_arrays(src, ref,
                               src_obj_ids=np.arange(1, 5),
                               ref_obj_ids=np.arange(1, 7))
    assert res.n_src == 4 and res.n_ref == 6
    # identical geometry: every src object matches its twin even untrained
    assert dict(res.node_matches) == {1: 1, 2: 2, 3: 3, 4: 4}
    assert res.alignment_score > 0.5


def test_align_scenes_with_registration(tmp_path):
    make_synthetic_workspace(str(tmp_path), split="val", n_pairs=1,
                             pts_per_obj=150)
    cfg = make_cfg(model_name="sgaligner", modules=["point"])
    cfg.preprocess.min_obj_points = 50
    cfg.val.pc_res = 64
    cfg.reg_model.ransac_max_iters = 200
    aligner = api.load_aligner(cfg)
    src = str(tmp_path / "scans" / "scene00_src" / "data.npy")
    ref = str(tmp_path / "scans" / "scene00_ref" / "data.npy")
    res = aligner.align(src, ref, register=True)
    assert res.transform is not None
    # same-frame fixture scenes: registration recovers ~identity
    from sgaligner_tpu.reg.metrics import compute_registration_error

    rre, rte = compute_registration_error(np.eye(4), res.transform)
    assert rre < 5.0 and rte < 0.1, (rre, rte)
