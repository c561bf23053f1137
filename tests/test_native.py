"""Native C++ KD-tree tests: build, parity with scipy, and utils wiring."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from sgaligner_tpu import native
from sgaligner_tpu.utils.labels import (
    NYU40_COLOR_PALETTE,
    NYU40_LABEL_NAMES,
    nyu40_name_to_id,
)
from sgaligner_tpu.utils.pointcloud import compute_pcl_overlap, get_nearest_neighbor

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="g++ build unavailable")


@needs_native
def test_native_nn_matches_scipy():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-5, 5, size=(20000, 3)).astype(np.float32)
    q = rng.uniform(-5, 5, size=(3000, 3)).astype(np.float32)
    tree = native.KDTree(pts)
    dist, idx = tree.query(q)
    sdist, sidx = cKDTree(pts).query(q, k=1)
    np.testing.assert_allclose(dist, sdist, rtol=1e-5, atol=1e-6)
    # index ties possible at equal distance; distances must agree exactly
    mismatch = idx != sidx
    if mismatch.any():
        np.testing.assert_allclose(
            np.linalg.norm(pts[idx[mismatch]] - q[mismatch], axis=1),
            np.linalg.norm(pts[sidx[mismatch]] - q[mismatch], axis=1),
            rtol=1e-5)


@needs_native
def test_native_radius_exists():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(10000, 3)).astype(np.float32)
    q = np.concatenate([pts[:50], np.full((50, 3), 10.0, np.float32)])
    tree = native.KDTree(pts)
    mask = tree.radius_exists(q, 1e-6)
    assert mask[:50].all() and not mask[50:].any()


def test_overlap_uses_kdtree_path():
    rng = np.random.default_rng(2)
    target = rng.uniform(0, 1, size=(20000, 3)).astype(np.float32)
    source = np.concatenate([target[:6000],
                             rng.uniform(5, 6, size=(4000, 3)).astype(np.float32)])
    ratio, idx = compute_pcl_overlap(source, target)
    assert ratio == 0.6
    assert (idx < 6000).all()


def test_nn_large_path_matches_small_path():
    rng = np.random.default_rng(3)
    s = rng.uniform(0, 1, size=(6000, 3)).astype(np.float32)
    q = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
    d_large = get_nearest_neighbor(q, s)
    d_scipy, _ = cKDTree(s).query(q, k=1)
    np.testing.assert_allclose(d_large, d_scipy, rtol=1e-5, atol=1e-6)


def test_label_taxonomies():
    assert len(NYU40_LABEL_NAMES) == 40
    assert len(NYU40_COLOR_PALETTE) == 41
    assert nyu40_name_to_id("wall") == 1
    assert nyu40_name_to_id("otherprop") == 40
