"""Batched KNN grouping for point-cloud encoders.

Equivalent of the reference's square_distance / knn_point / sample_and_knn_group
(/root/reference/src/aligner/networks/pct.py:29-99), which depend on the CUDA
``pointnet2_ops`` FPS. Here FPS is the batched device kernel (ops/fps.py) and
KNN is a dense pairwise-distance matmul + ``lax.top_k`` — both MXU/VPU-shaped.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sgaligner_tpu.ops.fps import farthest_point_sample


def square_distance(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances [B, N, M] (pct.py:29-49)."""
    d = -2.0 * jnp.einsum("bnc,bmc->bnm", src, dst)
    d = d + jnp.sum(src**2, -1)[:, :, None]
    d = d + jnp.sum(dst**2, -1)[:, None, :]
    return d


def knn_point(k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray) -> jnp.ndarray:
    """Indices of the k nearest points in xyz for each query [B, S, k]."""
    sqrdists = square_distance(new_xyz, xyz)
    _, idx = jax.lax.top_k(-sqrdists, k)
    return idx


def index_points(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows by per-batch indices: [B, N, C] x [B, ...] -> [B, ..., C]."""
    b = points.shape[0]
    flat = idx.reshape(b, -1)
    out = jnp.take_along_axis(points, flat[..., None], axis=1)
    return out.reshape(*idx.shape, points.shape[-1])


def sample_and_knn_group(s: int, k: int, coords: jnp.ndarray,
                         features: jnp.ndarray, start_idx=0):
    """FPS-sample s centers, group k neighbors, concat normalized features
    (pct.py:67-99). Returns ([B, s, 3], [B, s, k, 2D])."""
    fps_idx = farthest_point_sample(coords, s, start_idx=start_idx)  # [B, s]
    new_coords = index_points(coords, fps_idx)
    new_features = index_points(features, fps_idx)                   # [B, s, D]

    idx = knn_point(k, coords, new_coords)                           # [B, s, k]
    grouped = index_points(features, idx)                            # [B, s, k, D]
    grouped_norm = grouped - new_features[:, :, None, :]
    aggregated = jnp.concatenate(
        [grouped_norm,
         jnp.broadcast_to(new_features[:, :, None, :], grouped.shape)],
        axis=-1)
    return new_coords, aggregated
