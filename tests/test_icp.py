"""ICP refinement: recovery of moderate rigid motions with partial overlap."""

import numpy as np

from sgaligner_tpu.reg.icp import icp_refine_host
from sgaligner_tpu.reg.kabsch_test_helpers import random_transform
from sgaligner_tpu.reg.metrics import compute_registration_error
from sgaligner_tpu.utils.pointcloud import apply_transform


def _scene(rng, n=3000):
    # clustered scene (ICP needs structure, not a uniform blob)
    centers = rng.uniform(-2, 2, size=(12, 3))
    pts = (centers[rng.integers(0, 12, n)]
           + rng.normal(0, 0.15, size=(n, 3)))
    return pts.astype(np.float32)


def test_icp_refines_a_coarse_estimate():
    rng = np.random.default_rng(0)
    ref = _scene(rng)
    tf = random_transform(rng, max_angle_deg=10, max_trans=0.2)
    # src = ref moved by tf^-1 so that tf maps src -> ref; add noise + dropout
    src = apply_transform(ref, np.linalg.inv(tf))[: int(0.8 * len(ref))]
    src = (src + rng.normal(0, 0.005, src.shape)).astype(np.float32)

    # coarse init: identity (within ICP's basin for 10deg/0.2m)
    est, rmse = icp_refine_host(src, ref, iters=20, max_corr_dist=0.3)
    rre, rte = compute_registration_error(tf, est)
    assert rre < 2.0, (rre, rte)
    assert rte < 0.05, (rre, rte)
    assert rmse < 0.05


def test_icp_identity_is_fixed_point():
    rng = np.random.default_rng(1)
    pts = _scene(rng, n=1000)
    est, rmse = icp_refine_host(pts, pts, iters=5, max_corr_dist=0.1)
    rre, rte = compute_registration_error(np.eye(4), est)
    assert rre < 0.1 and rte < 0.005
    assert rmse < 1e-3


def test_backend_with_icp_refinement():
    from sgaligner_tpu.reg.backend import MutualNNBackend

    rng = np.random.default_rng(2)
    ref = _scene(rng)
    src = ref[: int(0.7 * len(ref))] + rng.normal(0, 0.002, (int(0.7 * len(ref)), 3))
    src = src.astype(np.float32)
    backend = MutualNNBackend(refine_icp=True, ransac_iters=300)
    out = backend.register(src, ref)
    assert out is not None
    rre, rte = compute_registration_error(np.eye(4), out["estimated_transform"])
    assert rre < 1.0 and rte < 0.02
