"""Batched multi-pair registration (reg/learned_batch.py + batched ops).

The reference evaluator registers pair-at-a-time (its measured hot loop,
registration_evaluator.py:144-165); our batched path must be functionally
equivalent to the serial path it replaced: identical RANSAC hypothesis sets
at equal padding, an ICP schedule that matches the sequential trim stages,
and end-to-end transform recovery on batches of synthetic pairs.
"""

import os

import jax
import numpy as np
import pytest

from sgaligner_tpu.reg.synthetic_pairs import make_pair

CKPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "checkpoints", "geo_reg")


def _rre_rte(gt, est):
    err = np.linalg.inv(gt) @ est
    rre = np.rad2deg(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                       -1, 1)))
    return rre, np.linalg.norm(err[:3, 3])


def test_ransac_hypotheses_batch_matches_single():
    """vmapped hypotheses == the single-set jit at identical key/padding."""
    from sgaligner_tpu.reg.ransac import ransac_hypotheses, ransac_hypotheses_batch

    rng = np.random.default_rng(0)
    n = 64
    gt_r = np.linalg.qr(rng.normal(size=(3, 3)))[0]
    src = rng.normal(size=(n, 3)).astype(np.float32)
    ref = (src @ gt_r.T + 0.3).astype(np.float32)
    ref[40:] += rng.normal(size=(24, 3)).astype(np.float32)  # outliers
    mask = np.ones(n, bool)
    key = jax.random.key(7)

    tf1, sc1 = ransac_hypotheses(src, ref, mask, key, threshold=0.05,
                                 iters=128)
    keys = jax.vmap(jax.random.key)(np.full((2,), 7, np.uint32))
    tfb, scb = ransac_hypotheses_batch(
        np.stack([src, src]), np.stack([ref, ref]), np.stack([mask, mask]),
        keys, np.full((2,), 0.05, np.float32), iters=128)
    np.testing.assert_allclose(np.asarray(tf1), np.asarray(tfb[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc1), np.asarray(scb[0]))
    np.testing.assert_allclose(np.asarray(tfb[0]), np.asarray(tfb[1]))


def test_icp_stages_batch_matches_serial_schedule():
    """The flat-scan trim schedule == sequential icp_refine_host stages."""
    from sgaligner_tpu.reg.icp import icp_refine_host, icp_refine_stages_batch

    rng = np.random.default_rng(3)
    src, ref, gt = make_pair(rng, n_points=600, overlap=0.7)
    init = gt.astype(np.float32).copy()
    init[:3, 3] += 0.04                        # a few cm off the basin floor
    voxel = 0.05
    est_serial = init.astype(np.float64)
    for trim in (6.0, 2.0, 1.0):
        est_serial, _ = icp_refine_host(src, ref, init_transform=est_serial,
                                        iters=10, max_corr_dist=trim * voxel)

    def pad(p):
        b = 1 << int(np.ceil(np.log2(len(p))))
        out = np.zeros((b, 3), np.float32)
        m = np.zeros(b, bool)
        out[: len(p)] = p
        m[: len(p)] = True
        return out, m

    sp, sm = pad(src)
    rp, rm = pad(ref)
    batch = icp_refine_stages_batch(
        sp[None], rp[None], sm[None], rm[None], init[None],
        np.array([6.0, 2.0, 1.0], np.float32) * voxel, iters=10)
    est_batch = np.asarray(batch[0], np.float64)
    np.testing.assert_allclose(est_batch, est_serial, atol=1e-4)
    rre, rte = _rre_rte(gt, est_batch)
    assert rre < 2.0 and rte < 0.05


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="pretrained geo_reg checkpoint not present")
def test_register_batch_recovers_transforms(geo_backend):
    """A 3-pair batch through the full batched pipeline: every output dict is
    well-formed and easy (0.6-overlap) pairs recover their transform."""
    be = geo_backend
    rng = np.random.default_rng(321)
    pairs, gts = [], []
    for _ in range(3):
        src, ref, gt = make_pair(rng, n_points=2048, overlap=0.6)
        pairs.append((src, ref))
        gts.append(gt)
    outs = be.register_batch(pairs)
    ok = 0
    for out, gt in zip(outs, gts):
        assert out is not None
        for key in ("estimated_transform", "src_corr_points",
                    "ref_corr_points", "corr_scores", "fit_score"):
            assert key in out
        assert len(out["src_corr_points"]) == len(out["corr_scores"])
        rre, rte = _rre_rte(gt, out["estimated_transform"])
        ok += int(rre < 5.0 and rte < 0.10)
    assert ok >= 2, f"batched registration recovered only {ok}/3"


@pytest.mark.skipif(not os.path.isdir(CKPT),
                    reason="pretrained geo_reg checkpoint not present")
def test_register_batch_agrees_with_serial_singletons(geo_backend):
    """Batch-of-2 and singleton calls agree on registration success and land
    in the same transform basin (bitwise equality is NOT expected: batch-
    common padding changes the RANSAC sampling stream, not the consensus)."""
    be = geo_backend
    rng = np.random.default_rng(99)
    pairs, gts = [], []
    for _ in range(2):
        src, ref, gt = make_pair(rng, n_points=2048, overlap=0.6)
        pairs.append((src, ref))
        gts.append(gt)
    batch = be.register_batch(pairs)
    for (src, ref), gt, b_out in zip(pairs, gts, batch):
        s_out = be.register(src, ref)
        assert (s_out is None) == (b_out is None)
        if s_out is None:
            continue
        rre_b, rte_b = _rre_rte(gt, b_out["estimated_transform"])
        rre_s, rte_s = _rre_rte(gt, s_out["estimated_transform"])
        assert (rre_b < 5.0 and rte_b < 0.10) == (rre_s < 5.0 and rte_s < 0.10)
