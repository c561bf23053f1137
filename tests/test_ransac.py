"""RANSAC / Kabsch / registration-metric tests against synthetic rigid motions."""

import numpy as np
from scipy.spatial.transform import Rotation

import jax.numpy as jnp

from sgaligner_tpu.reg.kabsch_test_helpers import random_transform  # noqa: F401
from sgaligner_tpu.reg.metrics import (
    compute_inlier_ratio,
    compute_modified_chamfer_distance,
    compute_registration_error,
    compute_registration_rmse,
    compute_mosaicking_error,
)
from sgaligner_tpu.reg.ransac import find_rigid_transform, kabsch
from sgaligner_tpu.utils.pointcloud import apply_transform


def test_kabsch_exact():
    rng = np.random.default_rng(0)
    tf = random_transform(rng)
    src = rng.normal(size=(50, 3)).astype(np.float32)
    ref = apply_transform(src, tf).astype(np.float32)
    est = np.asarray(kabsch(jnp.array(src), jnp.array(ref)))
    np.testing.assert_allclose(est, tf, atol=1e-4)


def test_ransac_recovers_transform_with_outliers():
    rng = np.random.default_rng(1)
    tf = random_transform(rng)
    n_in, n_out = 300, 200
    src_in = rng.uniform(-2, 2, size=(n_in, 3))
    ref_in = apply_transform(src_in, tf) + rng.normal(0, 0.005, (n_in, 3))
    src_out = rng.uniform(-2, 2, size=(n_out, 3))
    ref_out = rng.uniform(-2, 2, size=(n_out, 3))
    src = np.concatenate([src_in, src_out]).astype(np.float32)
    ref = np.concatenate([ref_in, ref_out]).astype(np.float32)

    est, inliers = find_rigid_transform(src, ref, threshold=0.03,
                                        max_iters=1000, seed=0)
    rre, rte = compute_registration_error(tf, est)
    assert rre < 1.0, rre      # degrees
    assert rte < 0.02, rte     # meters
    assert inliers.sum() >= 0.9 * n_in


def test_ransac_too_few_corrs():
    src = np.zeros((2, 3), np.float32)
    est, _ = find_rigid_transform(src, src)
    assert est is None


def test_registration_metrics_identity():
    rng = np.random.default_rng(2)
    pts = rng.uniform(-1, 1, size=(500, 3))
    eye = np.eye(4)
    # perfect estimate vs itself
    cd = compute_modified_chamfer_distance(pts, pts, pts, eye, eye)
    assert cd < 1e-6
    assert compute_inlier_ratio(pts, pts, eye) == 1.0
    assert compute_registration_rmse(pts, pts, eye) < 1e-9
    rre, rte = compute_registration_error(eye, eye)
    assert rre == 0.0 and rte == 0.0


def test_registration_error_known_rotation():
    rot = Rotation.from_euler("z", 10, degrees=True).as_matrix()
    tf = np.eye(4)
    tf[:3, :3] = rot
    tf[:3, 3] = [0.3, 0.0, 0.0]
    rre, rte = compute_registration_error(np.eye(4), tf)
    np.testing.assert_allclose(rre, 10.0, atol=1e-5)
    np.testing.assert_allclose(rte, 0.3, atol=1e-8)


def test_mosaicking_error_perfect():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, size=(200, 3))
    res = compute_mosaicking_error(pts, pts)
    assert res["prec"] == 1.0 and res["recall"] == 1.0
    assert res["fscore"] == 1.0 and res["acc"] < 1e-9


def test_topk_hypotheses_surface_minority_consensus():
    """Two rigid consensus clusters in one correspondence set: the wrong one
    has MORE support (the low-overlap self-similarity failure mode). The
    single-winner estimator must pick the majority; the diverse top-k must
    ALSO contain the minority transform so a downstream verifier can save
    the registration."""
    from sgaligner_tpu.reg.ransac import find_rigid_transforms_topk

    rng = np.random.default_rng(0)
    t_wrong, t_right = np.eye(4), np.eye(4)
    t_wrong[:3, :3] = Rotation.from_euler("xyz", [60, 10, -20],
                                          degrees=True).as_matrix()
    t_wrong[:3, 3] = [0.8, -0.3, 0.5]
    t_right[:3, :3] = Rotation.from_euler("xyz", [-130, 40, 95],
                                          degrees=True).as_matrix()
    t_right[:3, 3] = [-0.5, 0.6, -0.2]

    src = rng.normal(size=(100, 3)).astype(np.float32)
    ref = np.empty_like(src)
    ref[:60] = apply_transform(src[:60], t_wrong)
    ref[60:] = apply_transform(src[60:], t_right)
    ref += rng.normal(size=ref.shape).astype(np.float32) * 0.002

    est, _ = find_rigid_transform(src, ref, threshold=0.02, seed=1)
    rre_w, _ = compute_registration_error(t_wrong, est)
    assert rre_w < 2.0, "single winner should latch onto the majority cluster"

    tfs = find_rigid_transforms_topk(src, ref, threshold=0.02, k=3, seed=1)
    assert len(tfs) >= 2
    errs_right = [compute_registration_error(t_right, t)[0] for t in tfs]
    assert min(errs_right) < 2.0, (
        f"minority consensus missing from top-k (RREs vs right: {errs_right})")
