"""Torch-checkpoint import parity.

Builds a torch state_dict with the reference's exact key names/shapes
(MultiModalEncoder, /root/reference/src/aligner/sg_aligner.py:54-69 +
torch-geometric GATConv internals), converts it with
core.checkpoint.torch_state_dict_to_params, and verifies our model reproduces
the reference forward numerics (via the same numpy goldens used in
tests/test_gat.py and a hand-rolled PointNet forward).
"""

import numpy as np
import pytest
import torch

import jax

from sgaligner_tpu.core.checkpoint import torch_state_dict_to_params
from sgaligner_tpu.data.batch import BatchSpec
from sgaligner_tpu.data.synthetic import make_synthetic_batch
from sgaligner_tpu.models.sg_aligner import MultiModalEncoder

MODULES = ("point", "gat", "rel", "attr")
SPEC = BatchSpec(batch_size=2, max_objects=10, points_per_object=32)


def make_torch_state_dict(rng):
    """Reference-shaped random state_dict (keys as torch would save them)."""

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    sd = {}
    # PointNetfeat convs: Conv1d(k=1) weight [out, in, 1] (pointnet.py:98-100)
    for i, (cin, cout) in enumerate([(3, 64), (64, 128), (128, 256)], start=1):
        sd[f"object_encoder.conv{i}.weight"] = t(cout, cin, 1)
        sd[f"object_encoder.conv{i}.bias"] = t(cout)
        # BN params exist in the checkpoint but are behaviorally dead
        sd[f"object_encoder.bn{i}.weight"] = torch.ones(cout)
        sd[f"object_encoder.bn{i}.bias"] = torch.zeros(cout)
        sd[f"object_encoder.bn{i}.running_mean"] = torch.zeros(cout)
        sd[f"object_encoder.bn{i}.running_var"] = torch.ones(cout)
    sd["object_embedding.weight"] = t(100, 256)
    sd["object_embedding.bias"] = t(100)
    # MultiGAT: layer 0 in=3, layer 1 in=128*2 (gat.py:36), out 128, heads 2
    for i, cin in enumerate([3, 256]):
        sd[f"structure_encoder.layer_stack.{i}.lin_src.weight"] = t(2 * 128, cin)
        sd[f"structure_encoder.layer_stack.{i}.att_src"] = t(1, 2, 128)
        sd[f"structure_encoder.layer_stack.{i}.att_dst"] = t(1, 2, 128)
        sd[f"structure_encoder.layer_stack.{i}.bias"] = t(2 * 128)
    sd["structure_embedding.weight"] = t(100, 256)
    sd["structure_embedding.bias"] = t(100)
    sd["meta_embedding_rel.weight"] = t(100, 41)
    sd["meta_embedding_rel.bias"] = t(100)
    sd["meta_embedding_attr.weight"] = t(100, 164)
    sd["meta_embedding_attr.bias"] = t(100)
    sd["fusion.weight"] = torch.tensor(
        rng.normal(size=(4, 1)).astype(np.float32))
    return sd


def manual_pointnet(sd, pts):
    """Reference PointNetfeat forward with the BN-discard quirk: conv->relu x3,
    max-pool (pointnet.py:140-163)."""
    x = pts  # [O, P, 3]
    for i in (1, 2, 3):
        w = sd[f"object_encoder.conv{i}.weight"].numpy()[:, :, 0]  # [out, in]
        b = sd[f"object_encoder.conv{i}.bias"].numpy()
        x = np.maximum(x @ w.T + b, 0.0)
    return x.max(axis=1)  # [O, 256]


def test_import_and_point_parity():
    rng = np.random.default_rng(0)
    sd = make_torch_state_dict(rng)
    params, _ = torch_state_dict_to_params(sd, MODULES)

    batch = make_synthetic_batch(SPEC, seed=1)
    model = MultiModalEncoder(modules=MODULES)
    # structure check: imported tree must slot into the model's init tree
    init = model.init(jax.random.key(0), batch, train=False)["params"]
    jax.tree.map(lambda a, b: np.testing.assert_equal(a.shape, b.shape),
                 init, params)

    embs = model.apply({"params": params}, batch, train=False)

    # point modality parity vs the hand-rolled reference forward
    pts = batch["obj_points"].reshape(
        -1, 3, SPEC.points_per_object).transpose(0, 2, 1)
    feat = manual_pointnet(sd, pts)
    want = feat @ sd["object_embedding.weight"].numpy().T \
        + sd["object_embedding.bias"].numpy()
    np.testing.assert_allclose(np.asarray(embs["point"]), want,
                               rtol=2e-4, atol=1e-4)

    # rel/attr parity (plain Linear)
    want_rel = batch["bow_rel"].reshape(-1, 41) @ \
        sd["meta_embedding_rel.weight"].numpy().T + \
        sd["meta_embedding_rel.bias"].numpy()
    np.testing.assert_allclose(np.asarray(embs["rel"]), want_rel,
                               rtol=2e-4, atol=1e-4)

    # fusion weight landed
    assert embs["joint"].shape == (SPEC.total_slots, 400)


def test_import_gat_weight_layout():
    """GATConv lin weight [H*out, in] must land as [in, H, out] such that
    head h's projection equals rows [h*out:(h+1)*out] of the torch weight."""
    rng = np.random.default_rng(2)
    sd = make_torch_state_dict(rng)
    params, _ = torch_state_dict_to_params(sd, MODULES)
    w_torch = sd["structure_encoder.layer_stack.0.lin_src.weight"].numpy()
    w_ours = params["structure_encoder"]["gat0"]["weight"]  # [3, 2, 128]
    x = rng.normal(size=(5, 3)).astype(np.float32)
    for h in range(2):
        want = x @ w_torch[h * 128:(h + 1) * 128].T
        got = np.einsum("nd,de->ne", x, w_ours[:, h, :])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_import_from_pth_file(tmp_path):
    rng = np.random.default_rng(3)
    sd = make_torch_state_dict(rng)
    blob = {"model": sd, "epoch": 7, "iteration": 123}
    path = tmp_path / "epoch-7.pth.tar"
    torch.save(blob, path)

    from sgaligner_tpu.core.checkpoint import load_torch_snapshot

    payload = load_torch_snapshot(str(path), MODULES)
    assert payload["epoch"] == 7 and payload["iteration"] == 123
    assert payload["params"]["fusion"]["weight"].shape == (4, 1)


def make_torch_pct_state_dict(rng):
    """NaivePCT keys as the reference saves them (pct.py:275-298)."""

    def t(*shape):
        return torch.tensor(rng.normal(size=shape).astype(np.float32))

    def bn(prefix, c, sd):
        sd[f"{prefix}.weight"] = torch.ones(c)
        sd[f"{prefix}.bias"] = torch.zeros(c)
        sd[f"{prefix}.running_mean"] = torch.zeros(c)
        sd[f"{prefix}.running_var"] = torch.ones(c)

    sd = {}
    sd["object_encoder.embedding.conv1.weight"] = t(128, 3, 1)
    sd["object_encoder.embedding.conv2.weight"] = t(128, 128, 1)
    bn("object_encoder.embedding.bn1", 128, sd)
    bn("object_encoder.embedding.bn2", 128, sd)
    for s in (1, 2, 3, 4):
        p = f"object_encoder.sa{s}"
        qk = t(32, 128, 1)
        sd[f"{p}.q_conv.weight"] = qk
        sd[f"{p}.k_conv.weight"] = qk  # shared weight (pct.py:199)
        sd[f"{p}.v_conv.weight"] = t(128, 128, 1)
        sd[f"{p}.v_conv.bias"] = t(128)
        sd[f"{p}.trans_conv.weight"] = t(128, 128, 1)
        sd[f"{p}.trans_conv.bias"] = t(128)
        bn(f"{p}.after_norm", 128, sd)
    sd["object_encoder.linear.0.weight"] = t(1024, 512, 1)
    bn("object_encoder.linear.1", 1024, sd)
    sd["object_encoder.linear1.weight"] = t(512, 1024)
    bn("object_encoder.bn1", 512, sd)
    sd["object_encoder.linear2.weight"] = t(256, 512)
    sd["object_encoder.linear2.bias"] = t(256)
    bn("object_encoder.bn2", 256, sd)
    # rest of the 4-modality model
    base = make_torch_state_dict(np.random.default_rng(9))
    for k, v in base.items():
        if not k.startswith("object_encoder."):
            sd[k] = v
    return sd


def test_pct_import_structure_matches_model():
    rng = np.random.default_rng(6)
    sd = make_torch_pct_state_dict(rng)
    modules = ("pct", "gat", "rel", "attr")
    params, batch_stats = torch_state_dict_to_params(sd, modules)

    batch = make_synthetic_batch(SPEC, seed=1)
    model = MultiModalEncoder(modules=modules)
    variables = model.init(jax.random.key(0), batch, train=False)
    jax.tree.map(lambda a, b: np.testing.assert_equal(a.shape, b.shape),
                 variables["params"], params)
    jax.tree.map(lambda a, b: np.testing.assert_equal(a.shape, b.shape),
                 variables["batch_stats"], batch_stats)
    # imported weights run (eval mode uses the imported running stats)
    embs = model.apply({"params": params, "batch_stats": batch_stats},
                       batch, train=False)
    assert np.isfinite(np.asarray(embs["pct"])).all()


def test_ddp_module_prefix_stripped():
    rng = np.random.default_rng(4)
    sd = make_torch_state_dict(rng)
    sd_prefixed = {f"module.{k}": v for k, v in sd.items()}
    a, _ = torch_state_dict_to_params(sd, MODULES)
    b, _ = torch_state_dict_to_params(sd_prefixed, MODULES)
    jax.tree.map(np.testing.assert_array_equal, a, b)
