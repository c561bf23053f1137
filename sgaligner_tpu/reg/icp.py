"""Point-to-point ICP refinement on device.

The reference relies on GeoTransformer + GC-RANSAC for fine alignment and has
no ICP; this adds a TPU-native refinement stage for the registration backends:
fixed-iteration ICP under ``lax.scan`` (static shapes), nearest neighbors via
chunked brute-force distance matmuls (MXU-shaped; a 10k x 10k NN pass is a few
ms), rigid updates via the weighted Kabsch SVD (reg/ransac.py).

Used by MutualNNBackend(refine_icp=True) and available standalone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sgaligner_tpu.reg.ransac import kabsch


def _chunked_nn(src: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray,
                chunk: int = 1024):
    """1-NN of each src point in ref: (distances², indices). Static shapes."""
    n = src.shape[0]
    pad = (-n) % chunk
    src_p = jnp.concatenate([src, jnp.zeros((pad, 3), src.dtype)], axis=0)
    ref_sq = jnp.sum(ref * ref, axis=1)
    big = jnp.where(ref_mask, 0.0, 1e30)

    def body(s_chunk):
        d = (jnp.sum(s_chunk * s_chunk, axis=1)[:, None]
             - 2.0 * s_chunk @ ref.T + ref_sq[None, :] + big[None, :])
        return jnp.min(d, axis=1), jnp.argmin(d, axis=1)

    d2, idx = jax.lax.map(body, src_p.reshape(-1, chunk, 3))
    return d2.reshape(-1)[:n], idx.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("iters", "chunk"))
def icp_refine(
    src: jnp.ndarray,          # [N, 3] (padded ok)
    ref: jnp.ndarray,          # [M, 3]
    src_mask: jnp.ndarray,     # [N]
    ref_mask: jnp.ndarray,     # [M]
    init_transform: jnp.ndarray,   # [4, 4] starting estimate
    iters: int = 10,
    max_corr_dist: float = 0.1,
    chunk: int = 1024,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-iteration point-to-point ICP. Returns (transform, inlier_rmse).

    Correspondences beyond ``max_corr_dist`` get zero weight each iteration
    (trimmed ICP); the transform convention matches utils/pointcloud.py
    (x' = x @ R.T + t).
    """
    src_f = src.astype(jnp.float32)
    ref_f = ref.astype(jnp.float32)
    maskf = src_mask.astype(jnp.float32)

    def step(tf, _):
        moved = src_f @ tf[:3, :3].T + tf[:3, 3]
        d2, idx = _chunked_nn(moved, ref_f, ref_mask, chunk)
        w = maskf * (d2 < max_corr_dist**2)
        targets = ref_f[idx]
        new_tf = kabsch(src_f, targets, w + 1e-12)
        enough = w.sum() >= 3
        tf = jnp.where(enough, new_tf, tf)
        return tf, None

    tf, _ = jax.lax.scan(step, init_transform.astype(jnp.float32), None,
                         length=iters)
    moved = src_f @ tf[:3, :3].T + tf[:3, 3]
    d2, _ = _chunked_nn(moved, ref_f, ref_mask, chunk)
    w = maskf * (d2 < max_corr_dist**2)
    rmse = jnp.sqrt((d2 * w).sum() / jnp.maximum(w.sum(), 1.0))
    return tf, rmse


@partial(jax.jit, static_argnames=("iters", "chunk"))
def icp_refine_stages_batch(
    src: jnp.ndarray,          # [G, N, 3] (padded)
    ref: jnp.ndarray,          # [G, M, 3]
    src_mask: jnp.ndarray,     # [G, N]
    ref_mask: jnp.ndarray,     # [G, M]
    init_transforms: jnp.ndarray,   # [G, 4, 4]
    trims: jnp.ndarray,        # [T] max_corr_dist schedule (traced — a new
                               # voxel size does NOT recompile)
    anchor_src: jnp.ndarray | None = None,   # [G, P, 3] corr anchors (src)
    anchor_ref: jnp.ndarray | None = None,   # [G, P, 3] corr anchors (ref)
    anchor_w: jnp.ndarray | None = None,     # [G, P] anchor weights (0 = pad)
    anchor_frac: float = 0.15,
    iters: int = 10,
    chunk: int = 256,          # the [G, chunk, M] distance transient must fit
                               # comfortably at G instances
) -> jnp.ndarray:
    """The coarse->fine trim SCHEDULE (``iters`` ICP iterations at each
    ``max_corr_dist`` in ``trims``) over G (pair, candidate) instances in ONE
    dispatch — reg/learned_batch.py's replacement for the per-candidate
    ``icp_refine_host`` loop (3 stages x k candidates x pairs dispatches).

    Deliberately ONE flat ``lax.scan`` over T*iters steps with the trim as a
    per-step scanned value: a vmap over per-instance scans with the trim
    stages python-unrolled compiled in ~6.5 minutes at [32, 8192, 8192] on
    the v5e (measured) — this formulation compiles in seconds and runs
    identically. Returns the refined transforms [G, 4, 4].

    ``anchor_*``: optional feature-correspondence anchor springs, added to
    every Kabsch solve with total weight ``anchor_frac`` x (that iteration's
    trimmed-NN inlier weight). Point-to-point NN cost is TRANSLATION-
    DEGENERATE along self-similar planar geometry — measured on scene_2
    crops (scripts/reg_diag.py, round 5): 15/32 misses at 0.2 overlap were
    ICP taking a hit-grade RANSAC init and sliding 20-40 cm along the
    dominant plane (final RRE 0.0 deg, RTE 0.2-0.4 m). The anchors are the
    candidate's own matcher correspondences: negligible pull (~anchor_frac /
    (1 + anchor_frac) of any well-conditioned NN direction) but the only
    non-flat term in the degenerate tangential direction, so sliding stops
    at the corr consensus instead of the plane's self-similarity."""
    g, n, _ = src.shape
    src_f = src.astype(jnp.float32)
    ref_f = ref.astype(jnp.float32)
    maskf = src_mask.astype(jnp.float32)
    big = jnp.where(ref_mask, 0.0, 1e30)                      # [G, M]
    ref_sq = jnp.sum(ref_f * ref_f, axis=-1) + big            # [G, M]

    pad = (-n) % chunk
    n_chunks = (n + pad) // chunk

    def nn_all(moved):
        """1-NN of each (masked) moved src point in its own ref row."""
        moved_p = jnp.pad(moved, ((0, 0), (0, pad), (0, 0)))
        chunks = moved_p.reshape(g, n_chunks, chunk, 3).transpose(1, 0, 2, 3)

        def chunk_body(_, s_chunk):                           # [G, chunk, 3]
            d = (jnp.sum(s_chunk * s_chunk, -1)[..., None]
                 - 2.0 * jnp.einsum("gcd,gmd->gcm", s_chunk, ref_f)
                 + ref_sq[:, None, :])
            return None, (jnp.min(d, -1), jnp.argmin(d, -1))

        _, (d2, idx) = jax.lax.scan(chunk_body, None, chunks)
        d2 = d2.transpose(1, 0, 2).reshape(g, -1)[:, :n]
        idx = idx.transpose(1, 0, 2).reshape(g, -1)[:, :n]
        return d2, idx

    use_anchors = anchor_src is not None
    if use_anchors:
        a_src = anchor_src.astype(jnp.float32)
        a_ref = anchor_ref.astype(jnp.float32)
        a_w = anchor_w.astype(jnp.float32)

    def step(tf, trim):
        moved = (jnp.einsum("gnd,ged->gne", src_f, tf[:, :3, :3])
                 + tf[:, None, :3, 3])
        d2, idx = nn_all(moved)
        w = maskf * (d2 < trim * trim)
        targets = jnp.take_along_axis(ref_f, idx[..., None], axis=1)
        if use_anchors:
            # normalise so anchors carry anchor_frac of the NN inlier mass
            scale = (anchor_frac * w.sum(-1)
                     / jnp.maximum(a_w.sum(-1), 1e-9))            # [G]
            s_all = jnp.concatenate([src_f, a_src], axis=1)
            t_all = jnp.concatenate([targets, a_ref], axis=1)
            w_all = jnp.concatenate([w, a_w * scale[:, None]], axis=1)
        else:
            s_all, t_all, w_all = src_f, targets, w
        new_tf = jax.vmap(kabsch)(s_all, t_all, w_all + 1e-12)
        enough = (w.sum(-1) >= 3)[:, None, None]
        return jnp.where(enough, new_tf, tf), None

    schedule = jnp.repeat(trims.astype(jnp.float32), iters)
    tf, _ = jax.lax.scan(step, init_transforms.astype(jnp.float32), schedule)
    return tf


def icp_refine_host(src_points: np.ndarray, ref_points: np.ndarray,
                    init_transform: np.ndarray | None = None,
                    iters: int = 10, max_corr_dist: float = 0.1,
                    max_points: int = 8192, seed: int = 0):
    """Host wrapper: subsample, pad to buckets, run the jitted ICP."""
    rng = np.random.default_rng(seed)

    def prep(pts):
        if len(pts) > max_points:
            pts = pts[rng.choice(len(pts), max_points, replace=False)]
        bucket = 1 << max(int(np.ceil(np.log2(max(len(pts), 64)))), 6)
        out = np.zeros((bucket, 3), np.float32)
        mask = np.zeros(bucket, bool)
        out[: len(pts)] = pts
        mask[: len(pts)] = True
        return out, mask

    src_p, src_m = prep(np.asarray(src_points, np.float32))
    ref_p, ref_m = prep(np.asarray(ref_points, np.float32))
    init = np.eye(4, dtype=np.float32) if init_transform is None \
        else np.asarray(init_transform, np.float32)
    tf, rmse = icp_refine(jnp.asarray(src_p), jnp.asarray(ref_p),
                          jnp.asarray(src_m), jnp.asarray(ref_m),
                          jnp.asarray(init), iters=iters,
                          max_corr_dist=max_corr_dist)
    return np.asarray(tf, np.float64), float(rmse)
