"""PointNet family extras: STN, classifier heads, regularizer, mesh sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from sgaligner_tpu.models.pointnet import (
    STN,
    PointNetCls,
    PointNetRelClsMulti,
    feature_transform_regularizer,
)
from sgaligner_tpu.utils.pointcloud import load_obj, sample_faces


def test_stn_identity_at_init():
    rng = np.random.default_rng(0)
    pts = jnp.array(rng.normal(size=(4, 16, 3)).astype(np.float32))
    stn = STN(k=3)
    v = stn.init(jax.random.key(0), pts, train=False)
    t = np.asarray(stn.apply(v, pts, train=False))
    assert t.shape == (4, 3, 3)
    # fc3 is zero-init -> exact identity transform at init (pointnet.py:42-47)
    np.testing.assert_allclose(t, np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-5)


def test_cls_heads():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(6, 1024)).astype(np.float32))
    cls = PointNetCls(k=5)
    v = cls.init(jax.random.key(0), x, train=False)
    out = np.asarray(cls.apply(v, x, train=False))
    np.testing.assert_allclose(np.exp(out).sum(1), 1.0, rtol=1e-5)

    multi = PointNetRelClsMulti(k=7)
    v = multi.init(jax.random.key(0), x, train=False)
    out = np.asarray(multi.apply(v, x, train=False))
    assert ((out >= 0) & (out <= 1)).all()


def test_feature_transform_regularizer():
    eye = jnp.broadcast_to(jnp.eye(4), (3, 4, 4))
    assert float(feature_transform_regularizer(eye)) < 1e-6
    assert float(feature_transform_regularizer(2 * eye)) > 1.0


def test_sample_faces_and_load_obj(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 2 3\n")
    v, f = load_obj(str(obj))
    assert v.shape == (3, 3) and f.shape == (1, 3)

    pts = sample_faces(v, f, n_samples=500, rng=np.random.default_rng(0))
    assert pts.shape == (500, 3)
    # samples lie in the triangle's plane and within its bounds
    assert np.allclose(pts[:, 2], 0)
    assert (pts[:, 0] >= -1e-9).all() and (pts[:, 1] >= -1e-9).all()
    assert (pts[:, 0] + pts[:, 1] <= 1 + 1e-9).all()
