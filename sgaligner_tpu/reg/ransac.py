"""Rigid-transform estimation from 3D-3D correspondences: batched Kabsch + RANSAC.

TPU-native replacement for the reference's C++ GC-RANSAC call
(``pygcransac.findRigidTransform``, /root/reference/src/engine/
registration_evaluator.py:179-184): instead of sequential hypothesize-and-verify
with SPRT, ALL hypotheses are evaluated at once — sample ``iters`` minimal
3-point sets, solve every candidate with a vmapped Kabsch SVD, score inliers in
chunked batched matmuls, then iteratively refine the winner on its inlier set
(weighted Kabsch). The per-hypothesis work is embarrassingly parallel and lands
on the MXU/VPU; 5000 hypotheses over 20k correspondences score in a few ms.

Transform convention matches the reference: ``x' = x @ R.T + t`` with
``transform[:3, :3] = R``, ``transform[:3, 3] = t`` (utils/point_cloud.py:149-157).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def kabsch(src: jnp.ndarray, ref: jnp.ndarray,
           weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted least-squares rigid transform src->ref. Returns [4, 4]."""
    n = src.shape[0]
    w = jnp.ones((n,), src.dtype) if weights is None else weights
    w = w / jnp.maximum(w.sum(), 1e-12)

    src_c = (w[:, None] * src).sum(0)
    ref_c = (w[:, None] * ref).sum(0)
    h = (w[:, None] * (src - src_c)).T @ (ref - ref_c)

    u, _, vt = jnp.linalg.svd(h)
    d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
    diag = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    r = vt.T @ diag @ u.T
    t = ref_c - r @ src_c

    tf = jnp.eye(4, dtype=src.dtype)
    tf = tf.at[:3, :3].set(r)
    tf = tf.at[:3, 3].set(t)
    return tf


def _residuals(src, ref, tf):
    moved = src @ tf[:3, :3].T + tf[:3, 3]
    return jnp.linalg.norm(moved - ref, axis=-1)


@partial(jax.jit, static_argnames=("iters", "chunk", "refine_steps"))
def ransac_rigid_transform(
    src: jnp.ndarray,            # [N, 3] correspondences (src side, padded ok)
    ref: jnp.ndarray,            # [N, 3]
    mask: jnp.ndarray,           # [N] valid-correspondence mask
    key: jnp.ndarray,            # PRNG key
    threshold: float = 0.03,
    iters: int = 5000,
    chunk: int = 256,
    refine_steps: int = 3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (transform [4,4], inlier_count)."""
    n = src.shape[0]
    maskf = mask.astype(src.dtype)

    # minimal-set sampling: 3 indices per hypothesis, drawn from valid corrs
    # via Gumbel-top-k over the mask (uniform over valid entries)
    g = jax.random.gumbel(key, (iters, n)) + jnp.where(mask, 0.0, -1e30)[None]
    _, samples = jax.lax.top_k(g, 3)                        # [iters, 3]

    def score_chunk(carry, idx_chunk):
        tri_src = src[idx_chunk]                            # [chunk, 3, 3]
        tri_ref = ref[idx_chunk]
        tfs = jax.vmap(kabsch)(tri_src, tri_ref)            # [chunk, 4, 4]
        res = jax.vmap(lambda tf: _residuals(src, ref, tf))(tfs)  # [chunk, N]
        scores = ((res < threshold) * maskf).sum(-1)        # [chunk]
        best_score, best_tf = carry
        i = jnp.argmax(scores)
        better = scores[i] > best_score
        best_score = jnp.where(better, scores[i], best_score)
        best_tf = jnp.where(better, tfs[i], best_tf)
        return (best_score, best_tf), None

    n_chunks = -(-iters // chunk)
    pad = n_chunks * chunk - iters
    samples = jnp.concatenate([samples, samples[:pad]], axis=0) if pad else samples
    samples = samples.reshape(n_chunks, chunk, 3)

    init = (jnp.float32(-1.0), jnp.eye(4, dtype=src.dtype))
    (best_score, best_tf), _ = jax.lax.scan(score_chunk, init, samples)

    # iterative reweighted refinement on the inlier set
    def refine(tf, _):
        res = _residuals(src, ref, tf)
        w = ((res < threshold) * maskf)
        # guard: if too few inliers, keep previous transform
        enough = w.sum() >= 3
        new_tf = kabsch(src, ref, w + 1e-12)
        tf = jnp.where(enough, new_tf, tf)
        return tf, None

    best_tf, _ = jax.lax.scan(refine, best_tf, None, length=refine_steps)
    final_inliers = ((_residuals(src, ref, best_tf) < threshold) * maskf).sum()
    return best_tf, final_inliers


def _hypotheses_impl(src, ref, mask, key, threshold, iters, chunk):
    n = src.shape[0]
    maskf = mask.astype(src.dtype)
    g = jax.random.gumbel(key, (iters, n)) + jnp.where(mask, 0.0, -1e30)[None]
    _, samples = jax.lax.top_k(g, 3)

    def score_chunk(_, idx_chunk):
        tfs = jax.vmap(kabsch)(src[idx_chunk], ref[idx_chunk])
        res = jax.vmap(lambda tf: _residuals(src, ref, tf))(tfs)
        scores = ((res < threshold) * maskf).sum(-1)
        return None, (tfs, scores)

    n_chunks = -(-iters // chunk)
    pad = n_chunks * chunk - iters
    samples = jnp.concatenate([samples, samples[:pad]], axis=0) if pad else samples
    _, (tfs, scores) = jax.lax.scan(score_chunk, None,
                                    samples.reshape(n_chunks, chunk, 3))
    return tfs.reshape(-1, 4, 4)[:iters], scores.reshape(-1)[:iters]


@partial(jax.jit, static_argnames=("iters", "chunk"))
def ransac_hypotheses(
    src: jnp.ndarray,            # [N, 3] correspondences (src side, padded ok)
    ref: jnp.ndarray,            # [N, 3]
    mask: jnp.ndarray,           # [N]
    key: jnp.ndarray,
    threshold: float = 0.03,
    iters: int = 5000,
    chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """ALL minimal-set hypotheses with their inlier counts: (tfs [iters,4,4],
    scores [iters]). Multi-modal consensus shows up as several distinct
    high-scoring clusters — the single-winner reduction in
    ``ransac_rigid_transform`` keeps only the largest, which under low
    overlap is often a wrong self-similarity consensus; callers that can
    VERIFY candidates against the raw clouds should instead pick from a
    diverse top-k of these (``find_rigid_transforms_topk``)."""
    return _hypotheses_impl(src, ref, mask, key, threshold, iters, chunk)


@partial(jax.jit, static_argnames=("iters", "chunk"))
def ransac_hypotheses_batch(
    src: jnp.ndarray,            # [G, N, 3] padded correspondence sets
    ref: jnp.ndarray,            # [G, N, 3]
    mask: jnp.ndarray,           # [G, N]
    keys: jnp.ndarray,           # [G] PRNG keys
    thresholds: jnp.ndarray,     # [G] per-set inlier thresholds
    iters: int = 5000,
    chunk: int = 256,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``ransac_hypotheses`` over G correspondence sets in ONE dispatch
    (vmapped) — the multi-pair registration path
    (reg/learned_batch.py) pools every pair's fine+coarse RANSAC into a
    single device call instead of 2-6 per pair. Returns
    (tfs [G, iters, 4, 4], scores [G, iters])."""
    return jax.vmap(
        lambda s, r, m, k, t: _hypotheses_impl(s, r, m, k, t, iters, chunk)
    )(src, ref, mask, keys, thresholds)


def _se3_distinct(tf: np.ndarray, kept: list[np.ndarray],
                  rot_deg: float, trans: float) -> bool:
    for k in kept:
        r = tf[:3, :3] @ k[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(r) - 1) / 2, -1, 1)))
        dt = np.linalg.norm(tf[:3, 3] - k[:3, 3])
        if ang < rot_deg and dt < trans:
            return False
    return True


def find_rigid_transforms_topk(
    src_corr: np.ndarray,
    ref_corr: np.ndarray,
    threshold: float = 0.03,
    k: int = 3,
    max_iters: int = 5000,
    seed: int = 0,
    min_inliers: int = 3,
    rot_deg: float = 15.0,
    trans: float = 0.3,
    refine_steps: int = 3,
) -> list[np.ndarray]:
    """Top-k RANSAC fits from DISTINCT consensus clusters (greedy SE(3)
    non-max suppression over hypothesis score), each refined by inlier
    reweighting. Host-side; correspondence sets here are small (tens to a
    few hundred). Returns [] when no 3-point consensus exists."""
    n = len(src_corr)
    if n < 3:
        return []
    bucket = 1 << max(int(np.ceil(np.log2(n))), 6)
    src_p = np.zeros((bucket, 3), np.float32)
    ref_p = np.zeros((bucket, 3), np.float32)
    mask = np.zeros(bucket, bool)
    src_p[:n], ref_p[:n], mask[:n] = src_corr, ref_corr, True

    tfs, scores = ransac_hypotheses(
        jnp.asarray(src_p), jnp.asarray(ref_p), jnp.asarray(mask),
        jax.random.key(seed), threshold=threshold, iters=max_iters)
    tfs = np.asarray(tfs, np.float64)
    scores = np.asarray(scores)

    out: list[np.ndarray] = []
    for i in np.argsort(-scores):
        if scores[i] < min_inliers:
            break
        tf = tfs[i]
        if not _se3_distinct(tf, out, rot_deg, trans):
            continue
        for _ in range(refine_steps):
            res = np.linalg.norm(
                src_corr @ tf[:3, :3].T + tf[:3, 3] - ref_corr, axis=-1)
            w = (res < threshold).astype(np.float64)
            if w.sum() < 3:
                break
            tf = np.asarray(kabsch(jnp.asarray(src_corr, jnp.float32),
                                   jnp.asarray(ref_corr, jnp.float32),
                                   jnp.asarray(w, jnp.float32)), np.float64)
        if _se3_distinct(tf, out, rot_deg, trans) or not out:
            out.append(tf)
        if len(out) >= k:
            break
    return out


def find_rigid_transform(
    src_corr: np.ndarray,
    ref_corr: np.ndarray,
    threshold: float = 0.03,
    max_iters: int = 5000,
    seed: int = 0,
    max_corrs: int = 20000,
) -> tuple[np.ndarray | None, np.ndarray]:
    """Host wrapper with the pygcransac.findRigidTransform role: estimate the
    rigid transform mapping src correspondences onto ref. Pads the
    correspondence set to a static bucket so recompilation is rare."""
    n = len(src_corr)
    if n < 3:
        return None, np.zeros(0, bool)
    if n > max_corrs:
        sel = np.random.default_rng(seed).choice(n, max_corrs, replace=False)
        src_corr, ref_corr = src_corr[sel], ref_corr[sel]
        n = max_corrs

    bucket = 1 << max(int(np.ceil(np.log2(n))), 6)
    src_p = np.zeros((bucket, 3), np.float32)
    ref_p = np.zeros((bucket, 3), np.float32)
    mask = np.zeros(bucket, bool)
    src_p[:n], ref_p[:n], mask[:n] = src_corr, ref_corr, True

    tf, inliers = ransac_rigid_transform(
        jnp.asarray(src_p), jnp.asarray(ref_p), jnp.asarray(mask),
        jax.random.key(seed), threshold=threshold, iters=max_iters)
    tf = np.asarray(tf, np.float64)
    res = np.linalg.norm(src_corr @ tf[:3, :3].T + tf[:3, 3] - ref_corr, axis=-1)
    return tf, res < threshold
