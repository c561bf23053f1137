"""Batched farthest-point sampling on device.

The reference needs FPS in two places: preprocessing (an O(N·npoint) numpy loop
per object, /root/reference/utils/point_cloud.py:61-89) and the full-PCT
backbone's sample-and-group stage (CUDA ``pointnet2_ops.furthest_point_sample``,
pct.py:6,85). This module provides one TPU-native kernel for both: a jitted,
vmap-batched ``lax.fori_loop`` whose body is two vectorized VPU ops (distance
update + argmax) over ``[B, N, 3]``.

The sequential npoint loop is irreducible (each pick depends on the last), but
batching over thousands of objects keeps the VPU saturated — preprocessing FPS
for a whole scene becomes one device call instead of a per-object python loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(points: jnp.ndarray, npoint: int,
                          start_idx: jnp.ndarray | int = 0,
                          mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """FPS indices for a batch of point sets.

    Args:
      points: [B, N, 3] (padded point sets).
      npoint: number of samples per set (static).
      start_idx: [B] or scalar — initial pick (the reference uses a random
        start; pass rng-derived indices for that behavior).
      mask: optional [B, N] validity; invalid points are never selected.

    Returns: [B, npoint] int32 indices into N.
    """
    b, n, _ = points.shape
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (b,))
    if mask is None:
        mask = jnp.ones((b, n), bool)

    # invalid points: distance pinned to -1 so argmax never picks them
    init_dist = jnp.where(mask, 1e10, -1.0)

    def body(i, carry):
        dist, farthest, idxs = carry
        idxs = idxs.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(points, farthest[:, None, None], axis=1)
        d = jnp.sum((points - centroid) ** 2, axis=-1)          # [B, N]
        d = jnp.where(mask, d, -1.0)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=-1).astype(jnp.int32)
        return dist, farthest, idxs

    idxs0 = jnp.zeros((b, npoint), jnp.int32)
    _, _, idxs = jax.lax.fori_loop(0, npoint, body, (init_dist, start, idxs0))
    return idxs


def fps_sample(points: jnp.ndarray, npoint: int, start_idx=0,
               mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Gather the sampled points: [B, N, 3] -> [B, npoint, 3]."""
    idxs = farthest_point_sample(points, npoint, start_idx, mask)
    return jnp.take_along_axis(points, idxs[:, :, None], axis=1)
