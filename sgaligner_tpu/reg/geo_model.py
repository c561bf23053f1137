"""TPU-native coarse-to-fine point registration model (GeoTransformer-class).

The reference's point-level correspondence engine is the external
GeoTransformer CUDA submodule + 3DMatch checkpoint
(/root/reference/src/engine/registration_evaluator.py:12-27) — not vendored,
not runnable from either repo. This module is a from-scratch JAX/flax
re-design of that *class* of model (Qin et al., "Geometric Transformer for
Fast and Robust Point Cloud Registration", CVPR 2022), built TPU-first:

* static shapes everywhere (fixed superpoint/patch counts, masked),
* the backbone is an FPS + kNN patch encoder (ops/fps.py, ops/knn.py) instead
  of KPConv voxel pyramids — one batched matmul stack, no sparse gathers,
* geometric self-attention: pair-wise distance + triplet-angle sinusoidal
  embeddings bias the attention logits,
* coarse-to-fine matching, both levels by log-domain Sinkhorn optimal
  transport with a learned dustbin (masked): superpoint assignment first,
  then point-level assignment inside each matched patch pair
  (``fine_log_assign``); the backend pools the dense point correspondences
  into a RANSAC rigid fit and polishes with ICP (reg/learned.py),
* trained self-contained on synthetic rigid-registration data
  (reg/synthetic_pairs.py) — no external checkpoint required.

``reg/learned.py`` wraps this into the evaluator's backend protocol
(estimated_transform / corr_points / corr_scores) with local-to-global
rigid fitting.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

NEG = -1e9


@dataclass(frozen=True)
class GeoModelConfig:
    dim: int = 128            # transformer width
    point_dim: int = 64       # per-point patch feature width
    heads: int = 4
    blocks: int = 3           # (geo-self, cross) repetitions
    angle_k: int = 3          # neighbors for triplet-angle embedding
    sigma_d: float = 0.2      # distance embedding scale (meters)
    sinkhorn_iters: int = 20


def sinusoidal_embedding(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """[...,] -> [..., dim] sinusoidal features (transformer PE over a
    continuous scalar)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.arange(half) / half * jnp.log(10000.0))
    ang = x[..., None] * freqs
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def sinkhorn_log(scores: jnp.ndarray, src_mask: jnp.ndarray,
                 ref_mask: jnp.ndarray, alpha: jnp.ndarray,
                 iters: int) -> jnp.ndarray:
    """Log-domain Sinkhorn with a learned dustbin row/column (SuperGlue-style).

    scores: [S, R]; masks: [S], [R]; alpha: scalar dustbin logit.
    Returns log assignment matrix [S+1, R+1] (masked slots -> dustbin).
    """
    s, r = scores.shape
    sm = src_mask.astype(bool)
    rm = ref_mask.astype(bool)
    pad = jnp.full((s + 1, r + 1), alpha, scores.dtype)
    z = pad.at[:s, :r].set(jnp.where(sm[:, None] & rm[None, :], scores, NEG))
    # masked rows/cols keep only their dustbin entry
    z = z.at[:s, r].set(jnp.where(sm, alpha, 0.0))
    z = z.at[s, :r].set(jnp.where(rm, alpha, 0.0))

    # marginals: each real point has mass 1; dustbins absorb the remainder
    ns = sm.sum().astype(scores.dtype)
    nr = rm.sum().astype(scores.dtype)
    log_mu = jnp.concatenate([jnp.where(sm, 0.0, NEG),
                              jnp.log(jnp.maximum(nr, 1.0))[None]])
    log_nu = jnp.concatenate([jnp.where(rm, 0.0, NEG),
                              jnp.log(jnp.maximum(ns, 1.0))[None]])

    def body(_, uv):
        u, v = uv
        u = log_mu - jax.nn.logsumexp(z + v[None, :], axis=1)
        v = log_nu - jax.nn.logsumexp(z + u[:, None], axis=0)
        return u, v

    u = jnp.zeros((s + 1,), scores.dtype)
    v = jnp.zeros((r + 1,), scores.dtype)
    u, v = jax.lax.fori_loop(0, iters, body, (u, v))
    return z + u[:, None] + v[None, :]


class PatchEncoder(nn.Module):
    """Mini shared-MLP PointNet over each superpoint's local patch.

    Consumes ROTATION-INVARIANT per-point features (reg/learned.py::
    patch_invariants: (r, z, rho) cylindrical invariants) plus the per-patch
    eigen-spectrum — raw coords are rotation-variant and stall training under
    arbitrary SO(3) pose differences (measured).

    inv: [S, M, 3]; eig: [S, 3]; pmask: [S, M].
    Returns (point_feats [S, M, point_dim], patch_feats [S, dim]).
    """

    cfg: GeoModelConfig

    @nn.compact
    def __call__(self, inv, eig, pmask):
        c = self.cfg
        h = inv
        for width in (c.point_dim, c.point_dim):
            h = nn.Dense(width)(h)
            h = nn.relu(h)
        point_feats = h                                       # [S, M, pd]
        g = jnp.where(pmask[..., None], h, NEG).max(axis=1)   # masked max-pool
        g = jnp.where(pmask.any(axis=1)[:, None], g, 0.0)
        g = nn.Dense(c.dim)(jnp.concatenate([g, eig], axis=-1))
        return point_feats, g


class GeometricStructure(nn.Module):
    """Pair-wise geometric embedding r_ij: sinusoidal distance + max
    triplet-angle terms (GeoTransformer eq. 1-3, re-derived)."""

    cfg: GeoModelConfig

    @nn.compact
    def __call__(self, pts, mask):
        c = self.cfg
        diff = pts[:, None, :] - pts[None, :, :]              # [S, S, 3]
        dist = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, -1), 1e-12))
        r = nn.Dense(c.dim, name="proj_d")(
            sinusoidal_embedding(dist / c.sigma_d, c.dim))

        # triplet angles via each point's k nearest (valid) neighbors
        s = pts.shape[0]
        k = min(c.angle_k, max(s - 1, 1))
        d_masked = jnp.where(mask[None, :], dist, jnp.inf)
        # boolean select, NOT `+ eye*inf`: 0*inf = NaN off-diagonal would make
        # the top_k ordering backend-dependent garbage (advisor finding, r2)
        d_masked = jnp.where(jnp.eye(s, dtype=bool), jnp.inf, d_masked)
        _, nbr = jax.lax.top_k(-d_masked, k)                  # [S, k]
        v_n = pts[nbr] - pts[:, None, :]                      # [S, k, 3]
        # angle between (p_x - p_i) and (p_j - p_i): [S, k, S]
        dots = jnp.einsum("ikd,ijd->ikj", v_n, -diff)
        nn_n = jnp.linalg.norm(v_n, axis=-1)[:, :, None]
        nd = jnp.linalg.norm(diff, axis=-1)[:, None, :]
        cos = dots / jnp.maximum(nn_n * nd, 1e-9)
        # clip strictly inside (-1, 1): arccos' is infinite at the ends and
        # collinear triplets would poison the gradients with inf/NaN
        ang = jnp.arccos(jnp.clip(cos, -1.0 + 1e-6, 1.0 - 1e-6))
        emb_a = nn.Dense(c.dim, name="proj_a")(
            sinusoidal_embedding(ang * (c.sigma_d * 10.0), c.dim))
        r = r + emb_a.max(axis=1)                             # max over x
        return r                                              # [S, S, dim]


class GeoSelfAttention(nn.Module):
    """Multi-head self-attention with the pair-wise geometric bias on logits:
    e_ij = q_i·(k_j + r_ij) / sqrt(dh)."""

    cfg: GeoModelConfig

    @nn.compact
    def __call__(self, x, r, mask):
        c = self.cfg
        h, dh = c.heads, c.dim // c.heads
        q = nn.Dense(c.dim, name="q")(x).reshape(-1, h, dh)
        k = nn.Dense(c.dim, name="k")(x).reshape(-1, h, dh)
        v = nn.Dense(c.dim, name="v")(x).reshape(-1, h, dh)
        rk = nn.Dense(c.dim, name="r")(r).reshape(r.shape[0], r.shape[1], h, dh)
        logits = (jnp.einsum("ihd,jhd->hij", q, k)
                  + jnp.einsum("ihd,ijhd->hij", q, rk)) / jnp.sqrt(float(dh))
        logits = jnp.where(mask[None, None, :], logits, NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hij,jhd->ihd", attn, v).reshape(-1, c.dim)
        x = nn.LayerNorm()(x + nn.Dense(c.dim, name="o")(out))
        y = nn.Dense(2 * c.dim, name="ff1")(x)
        y = nn.relu(y)
        x = nn.LayerNorm()(x + nn.Dense(c.dim, name="ff2")(y))
        return x


class CrossAttention(nn.Module):
    cfg: GeoModelConfig

    @nn.compact
    def __call__(self, x, y, ymask):
        c = self.cfg
        h, dh = c.heads, c.dim // c.heads
        q = nn.Dense(c.dim, name="q")(x).reshape(-1, h, dh)
        k = nn.Dense(c.dim, name="k")(y).reshape(-1, h, dh)
        v = nn.Dense(c.dim, name="v")(y).reshape(-1, h, dh)
        logits = jnp.einsum("ihd,jhd->hij", q, k) / jnp.sqrt(float(dh))
        logits = jnp.where(ymask[None, None, :], logits, NEG)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hij,jhd->ihd", attn, v).reshape(-1, c.dim)
        x = nn.LayerNorm()(x + nn.Dense(c.dim, name="o")(out))
        z = nn.Dense(2 * c.dim, name="ff1")(x)
        z = nn.relu(z)
        x = nn.LayerNorm()(x + nn.Dense(c.dim, name="ff2")(z))
        return x


class GeoRegModel(nn.Module):
    """Full matcher: patch encoding -> interleaved geo-self/cross attention ->
    Sinkhorn superpoint assignment + per-point patch features.

    Inputs (single pair, static shapes):
      src_sp, ref_sp      [S, 3]      superpoint coords
      src_inv, ref_inv    [S, M, 3]   rotation-invariant patch point features
      src_eig, ref_eig    [S, 3]      per-patch covariance spectra
      src_pmask, ref_pmask [S, M]     patch point validity
      src_mask, ref_mask   [S]        superpoint validity

    Returns dict:
      log_assign [S+1, S+1]  log OT superpoint assignment
      src_feats/ref_feats [S, dim]  (L2-normalized)
      src_pf/ref_pf [S, M, point_dim]  L2-normalized per-point FINE-matching
        features: the raw patch-point features conditioned on the patch's
        post-transformer context, so points are discriminative across the two
        clouds (consumed by ``fine_log_assign`` for the point-level
        correspondence stage — the role of GeoTransformer's point matching
        module, reference registration_evaluator.py:104-108)
      fine_temp / fine_alpha  learned inverse temperature / dustbin logit for
        the fine Sinkhorn (scalars, exposed so the fine stage can run as a
        separate jitted function over selected patch pairs)
    """

    cfg: GeoModelConfig = GeoModelConfig()

    @nn.compact
    def __call__(self, src_sp, ref_sp, src_inv, ref_inv, src_eig, ref_eig,
                 src_pmask, ref_pmask, src_mask, ref_mask):
        c = self.cfg
        enc = PatchEncoder(c, name="patch_encoder")
        src_pf, xs = enc(src_inv, src_eig, src_pmask)
        ref_pf, xr = enc(ref_inv, ref_eig, ref_pmask)

        geo = GeometricStructure(c, name="geo")
        rs = geo(src_sp, src_mask)
        rr = geo(ref_sp, ref_mask)

        for i in range(c.blocks):
            sa = GeoSelfAttention(c, name=f"self{i}")
            xs = sa(xs, rs, src_mask)
            xr = sa(xr, rr, ref_mask)
            ca = CrossAttention(c, name=f"cross{i}")
            xs_new = ca(xs, xr, ref_mask)
            xr = ca(xr, xs, src_mask)
            xs = xs_new

        head = nn.Dense(c.dim, name="head")    # shared projection head
        xs = head(xs)
        xr = head(xr)
        xs = xs / jnp.maximum(jnp.linalg.norm(xs, axis=-1, keepdims=True), 1e-9)
        xr = xr / jnp.maximum(jnp.linalg.norm(xr, axis=-1, keepdims=True), 1e-9)

        # unit features need a temperature: raw cosine similarities lie in
        # [-1, 1] and /sqrt(dim) would flatten the Sinkhorn logits to ~0.09
        inv_temp = self.param("inv_temp", nn.initializers.constant(10.0), ())
        scores = (xs @ xr.T) * inv_temp
        alpha = self.param("dustbin", nn.initializers.constant(1.0), ())
        log_assign = sinkhorn_log(scores, src_mask, ref_mask, alpha,
                                  c.sinkhorn_iters)

        # fine head: per-point features conditioned on the patch's transformer
        # context (shared across src/ref), L2-normalized for cosine scoring
        fine1 = nn.Dense(2 * c.point_dim, name="fine1")
        fine2 = nn.Dense(c.point_dim, name="fine2")

        def fine_feats(pf, ctx):
            h = jnp.concatenate(
                [pf, jnp.broadcast_to(ctx[:, None, :],
                                      pf.shape[:2] + (c.dim,))], axis=-1)
            h = fine2(nn.relu(fine1(h)))
            return h / jnp.maximum(
                jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-9)

        src_pfc = fine_feats(src_pf, xs)
        ref_pfc = fine_feats(ref_pf, xr)
        fine_temp = self.param("fine_inv_temp",
                               nn.initializers.constant(10.0), ())
        fine_alpha = self.param("fine_dustbin",
                                nn.initializers.constant(1.0), ())
        return {"log_assign": log_assign, "src_feats": xs, "ref_feats": xr,
                "src_pf": src_pfc, "ref_pf": ref_pfc,
                "fine_temp": fine_temp, "fine_alpha": fine_alpha}


def fine_log_assign(src_pf: jnp.ndarray, ref_pf: jnp.ndarray,
                    src_pmask: jnp.ndarray, ref_pmask: jnp.ndarray,
                    pairs: jnp.ndarray, fine_temp: jnp.ndarray,
                    fine_alpha: jnp.ndarray, iters: int = 20) -> jnp.ndarray:
    """Point-level Sinkhorn assignment inside selected patch pairs.

    The fine stage of the coarse-to-fine matcher: for each superpoint
    correspondence (i, j) in ``pairs`` [K, 2], runs a masked log-Sinkhorn over
    the [M, M] cosine scores of the two patches' per-point features. Static
    shapes (K fixed, pad with any valid index and drop on host). Returns
    [K, M+1, M+1] log assignments.
    """

    def one(pair):
        i, j = pair[0], pair[1]
        scores = (src_pf[i] @ ref_pf[j].T) * fine_temp
        return sinkhorn_log(scores, src_pmask[i], ref_pmask[j], fine_alpha,
                            iters)

    return jax.vmap(one)(pairs)
