"""NaivePCT encoder tests: shapes, masked-BN padding independence, engine path."""

import numpy as np

import jax
import jax.numpy as jnp

from sgaligner_tpu.core.config import make_cfg
from sgaligner_tpu.data.batch import BatchSpec
from sgaligner_tpu.data.synthetic import make_synthetic_batch
from sgaligner_tpu.engine.factory import build_model, build_optimizer
from sgaligner_tpu.engine.train_step import create_train_state, make_train_step
from sgaligner_tpu.models.pct import NaivePCT
from sgaligner_tpu.ops.objective import init_loss_params


def test_pct_forward_shape():
    rng = np.random.default_rng(0)
    pts = jnp.array(rng.normal(size=(6, 32, 3)).astype(np.float32))
    mask = jnp.array([True] * 4 + [False] * 2)
    model = NaivePCT(out_size=256)
    variables = model.init(jax.random.key(0), pts, mask, train=False)
    out = model.apply(variables, pts, mask, train=False)
    assert out.shape == (6, 256)
    assert "batch_stats" in variables


def test_pct_masked_bn_padding_independent():
    """Training-mode batch statistics must ignore padded object slots: the
    valid outputs are identical whether or not garbage slots are present."""
    rng = np.random.default_rng(1)
    valid = rng.normal(size=(4, 16, 3)).astype(np.float32)
    garbage = 100.0 * rng.normal(size=(3, 16, 3)).astype(np.float32)

    model = NaivePCT(out_size=64)
    padded_pts = np.concatenate([valid, garbage])

    def train_stats(pts, mask):
        variables = model.init(jax.random.key(0), jnp.array(pts),
                               jnp.array(mask), train=False)
        _, upd = model.apply(variables, jnp.array(pts), jnp.array(mask),
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(0)})
        return upd["batch_stats"]

    stats_clean = train_stats(valid, np.ones(4, bool))
    stats_padded = train_stats(padded_pts, np.array([True] * 4 + [False] * 3))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        stats_clean, stats_padded)


def test_knn_group_semantics():
    from sgaligner_tpu.ops.knn import index_points, knn_point, square_distance

    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 10, 3)).astype(np.float32)
    b = rng.normal(size=(2, 6, 3)).astype(np.float32)
    d = np.asarray(square_distance(jnp.array(b), jnp.array(a)))
    want = ((b[:, :, None, :] - a[:, None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(d, want, rtol=1e-4, atol=1e-5)

    idx = np.asarray(knn_point(3, jnp.array(a), jnp.array(b)))
    for bi in range(2):
        for qi in range(6):
            got = set(idx[bi, qi].tolist())
            want_idx = set(np.argsort(want[bi, qi])[:3].tolist())
            assert got == want_idx

    gathered = np.asarray(index_points(jnp.array(a), jnp.array(idx)))
    assert gathered.shape == (2, 6, 3, 3)
    np.testing.assert_allclose(gathered[0, 0, 0], a[0, idx[0, 0, 0]])


def test_spct_and_full_pct_forward():
    from sgaligner_tpu.models.pct import SPCT, FullPCT

    rng = np.random.default_rng(5)
    pts = jnp.array(rng.normal(size=(4, 64, 3)).astype(np.float32))
    mask = jnp.ones(4, bool)

    spct = SPCT()
    v = spct.init(jax.random.key(0), pts, mask, train=False)
    x, x_max, x_mean = spct.apply(v, pts, mask, train=False)
    assert x.shape == (4, 64, 1024)
    assert x_max.shape == (4, 1024) and x_mean.shape == (4, 1024)

    pct = FullPCT(samples=(32, 16))
    v = pct.init(jax.random.key(0), pts, mask, train=False)
    out = pct.apply(v, pts, mask, train=False)
    assert out.shape == (4, 256)
    assert np.isfinite(np.asarray(out)).all()


def test_pct_engine_train_step():
    """Full 4-modality model with the PCT encoder (the released GT config,
    scan3r_ground_truth.yaml) trains: batch_stats threading + dropout rngs."""
    cfg = make_cfg(model_name="sgaligner",
                   modules=["pct", "gat", "rel", "attr"])
    cfg.tpu.max_objects = 8
    spec = BatchSpec(batch_size=2, max_objects=8, points_per_object=16)
    batch = make_synthetic_batch(spec, seed=0)

    model = build_model(cfg)
    tx = build_optimizer(cfg)
    state = create_train_state(model, tx, batch, init_loss_params(4),
                               jax.random.key(0))
    assert state.batch_stats, "PCT model must carry batch_stats"
    step = make_train_step(model, tx, tuple(cfg.modules))
    l0 = None
    for i in range(8):
        state, metrics = step(state, batch)
        if i == 0:
            l0 = float(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < l0
    # running stats actually moved
    flat = jax.tree.leaves(state.batch_stats)
    assert any(float(jnp.abs(x).sum()) > 0 for x in flat)


def test_masked_bn_matches_torch_batchnorm1d():
    """Train-mode MaskedBatchNorm on fully-valid input == torch BatchNorm1d
    over [N, C, L] (normalizes per channel over N*L rows — the reference's
    BN semantics, pct.py: nn.BatchNorm1d after every conv)."""
    import torch

    from sgaligner_tpu.models.pct import MaskedBatchNorm

    rng = np.random.default_rng(7)
    x = rng.normal(size=(5, 9, 16)).astype(np.float32)  # [O, P, C]
    mask = np.ones(5, bool)

    bn = MaskedBatchNorm(16)
    variables = bn.init(jax.random.key(0), jnp.array(x), jnp.array(mask)[:, None],
                        train=False)
    out, upd = bn.apply(variables, jnp.array(x), jnp.array(mask)[:, None],
                        train=True, mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(16)
    with torch.no_grad():
        # torch layout: [N, C, L]
        tout = tbn(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1)

    np.testing.assert_allclose(np.asarray(out), tout.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_masked_bn_2d_input_matches_torch():
    """Head BNs normalize [O, C] rows (torch BatchNorm1d on 2-D input)."""
    import torch

    from sgaligner_tpu.models.pct import MaskedBatchNorm

    rng = np.random.default_rng(8)
    x = rng.normal(size=(12, 8)).astype(np.float32)
    mask = np.ones(12, bool)

    bn = MaskedBatchNorm(8)
    variables = bn.init(jax.random.key(0), jnp.array(x), jnp.array(mask),
                        train=False)
    out, upd = bn.apply(variables, jnp.array(x), jnp.array(mask),
                        train=True, mutable=["batch_stats"])
    tbn = torch.nn.BatchNorm1d(8)
    with torch.no_grad():
        tout = tbn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(out), tout.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(upd["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)
