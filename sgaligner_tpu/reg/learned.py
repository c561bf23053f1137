"""Learned registration backend: host orchestration around reg/geo_model.py.

Pipeline (mirrors the ROLE of GeoTransformer inference in the reference,
registration_evaluator.py:58-127, with a TPU-native model):

1. voxel-downsample both clouds; FPS S superpoints (device, ops/fps.py);
   group the M nearest dense points to each superpoint (static [S, M] patches,
   superpoint-centered).
2. run the jitted GeoRegModel -> Sinkhorn superpoint assignment + per-point
   patch features.
3. one-to-one superpoint correspondences from the assignment (greedy by
   score), then the FINE stage: a point-level Sinkhorn inside each matched
   patch pair (geo_model.fine_log_assign over the conditioned per-point
   features) yields dense point correspondences; mutual-argmax pairs above a
   score threshold are pooled -> RANSAC rigid fit (reg/ransac.py). Superpoint
   centers are the fallback when too few fine matches clear the bar.
4. ICP refinement on the full downsampled clouds (reg/icp.py) — the learned
   matching solves the GLOBAL association; ICP polishes to voxel precision.

Output contract == the reference's GeoTransformer consumption
(estimated_transform, src/ref_corr_points, corr_scores).

Checkpoints: orbax directories written by ``reg/train_geo.py`` (the
self-contained synthetic trainer); ``LearnedBackend(params=...)`` also accepts
an in-memory param tree (tests).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from sgaligner_tpu.reg.geo_model import GeoModelConfig, GeoRegModel


def _prep_cloud(points: np.ndarray, n_super: int, patch_m: int,
                voxel_size: float, max_points: int, rng) -> dict:
    """Host+device preprocessing to the static model inputs."""
    import jax.numpy as jnp

    from sgaligner_tpu.ops.fps import farthest_point_sample
    from sgaligner_tpu.reg.backend import voxel_downsample

    pts = voxel_downsample(points.astype(np.float32), voxel_size)
    if len(pts) > max_points:
        pts = pts[rng.choice(len(pts), max_points, replace=False)]
    n = len(pts)
    s = min(n_super, n)
    # bucket-pad to power-of-two sizes so the jitted FPS compiles O(log N)
    # distinct shapes instead of one per unique cloud size (a fresh XLA
    # compile per pair dominated wall-clock before)
    bucket = 256
    while bucket < n:
        bucket *= 2
    pts_pad = np.zeros((bucket, 3), np.float32)
    pts_pad[:n] = pts
    valid = np.zeros((bucket,), bool)
    valid[:n] = True
    sp_idx = np.asarray(farthest_point_sample(
        jnp.asarray(pts_pad)[None], n_super,
        mask=jnp.asarray(valid)[None]))[0][:s]
    sp = pts[sp_idx]                                          # [s, 3]
    # nearest-M dense points per superpoint (host kNN via argpartition)
    d = ((sp[:, None, :] - pts[None, :, :]) ** 2).sum(-1)     # [s, n]
    m = min(patch_m, n)
    nbr = np.argpartition(d, m - 1, axis=1)[:, :m]            # [s, m]
    patch = pts[nbr] - sp[:, None, :]
    pmask = np.ones((s, m), bool)
    inv, eig = patch_invariants(patch)

    def pad(a, k, fill=0.0):
        out = np.full((k,) + a.shape[1:], fill, a.dtype)
        out[: len(a)] = a
        return out

    return {
        "sp": pad(sp, n_super),
        "patch": pad(patch, n_super),
        "inv": pad(inv, n_super),
        "eig": pad(eig, n_super),
        "pmask": pad(pmask, n_super, fill=False),
        "mask": pad(np.ones(s, bool), n_super, fill=False),
        "points": pts,
        "nbr": pad(nbr, n_super),
    }


def patch_invariants(patch: np.ndarray):
    """Rotation-INVARIANT per-point patch features (host numpy).

    The matcher must produce the same features whatever rigid pose the source
    cloud arrives in (pairs differ by arbitrary SO(3) rotations); raw centered
    coords are rotation-variant and were measured to stall training. Per patch
    point p (superpoint-centered): ``(r, z, rho)`` cylindrical invariants
    about the patch's covariance normal n (smallest eigenvector, sign fixed by
    the third moment of p.n), plus the per-patch sqrt-eigenvalue spectrum —
    all invariant under rotations, up to reflections.

    patch: [S, M, 3] -> (inv [S, M, 3], eig [S, 3]).
    """
    s, m, _ = patch.shape
    cov = np.einsum("smi,smj->sij", patch, patch) / max(m, 1)
    w, v = np.linalg.eigh(cov)                  # ascending eigenvalues
    normal = v[:, :, 0]                         # [S, 3]
    zdot = np.einsum("smi,si->sm", patch, normal)
    sign = np.where((zdot ** 3).sum(axis=1, keepdims=True) >= 0, 1.0, -1.0)
    z = zdot * sign
    r = np.linalg.norm(patch, axis=-1)
    rho = np.sqrt(np.maximum(r * r - z * z, 0.0))
    inv = np.stack([r, z, rho], axis=-1).astype(np.float32)
    eig = np.sqrt(np.maximum(w, 0.0)).astype(np.float32)
    return inv, eig


def extract_correspondences(out: dict, src: dict, ref: dict, top_pairs: int):
    """Superpoint correspondences from the Sinkhorn assignment (host numpy).

    One-to-one (i, j) pairs by greedy score order. Returns the superpoint
    CENTER coordinates (coarse-fit fallback), scores, and the INDEX pairs the
    fine stage matches point-to-point inside."""
    la = np.asarray(out["log_assign"], np.float32)
    s = la.shape[0] - 1
    a = np.exp(la[:s, :s])
    a = a * src["mask"][:, None] * ref["mask"][None, :]
    flat = a.reshape(-1)
    order = np.argsort(-flat)[: top_pairs * 4]
    src_pts, ref_pts, scores, idx_pairs = [], [], [], []
    seen_i, seen_j = set(), set()
    for f in order:
        i, j = divmod(int(f), s)
        if flat[f] <= 1e-6:
            break
        if i in seen_i or j in seen_j:
            continue
        seen_i.add(i)
        seen_j.add(j)
        src_pts.append(src["sp"][i])
        ref_pts.append(ref["sp"][j])
        scores.append(float(flat[f]))
        idx_pairs.append((i, j))
        if len(src_pts) >= top_pairs:
            break
    if len(src_pts) < 3:
        return None
    return (np.asarray(src_pts, np.float32), np.asarray(ref_pts, np.float32),
            np.asarray(scores, np.float32),
            np.asarray(idx_pairs, np.int32))


def extract_fine_correspondences(fla: np.ndarray, idx_pairs: np.ndarray,
                                 n_valid: int, src: dict, ref: dict,
                                 score_thresh: float = 0.2):
    """Dense point correspondences from the fine Sinkhorn (host numpy).

    fla: [K, M+1, M+1] log assignments for the K padded superpoint pairs
    (first ``n_valid`` real). Keeps mutual-argmax point pairs whose assignment
    mass clears ``score_thresh``. Coordinates are the patches' ABSOLUTE
    points. Returns (src_pts [C,3], ref_pts [C,3], scores [C]) or None."""
    m = fla.shape[1] - 1
    src_abs = src["patch"] + src["sp"][:, None, :]
    ref_abs = ref["patch"] + ref["sp"][:, None, :]
    out_s, out_r, out_w = [], [], []
    for k in range(min(n_valid, len(fla))):
        i, j = int(idx_pairs[k, 0]), int(idx_pairs[k, 1])
        a = np.exp(fla[k][:m, :m].astype(np.float32))
        a = a * src["pmask"][i][:, None] * ref["pmask"][j][None, :]
        best_j = a.argmax(axis=1)
        best_i = a.argmax(axis=0)
        rows = np.arange(m)
        w = a[rows, best_j]
        keep = (best_i[best_j] == rows) & (w > score_thresh) & src["pmask"][i]
        if not keep.any():
            continue
        out_s.append(src_abs[i][keep])
        out_r.append(ref_abs[j][best_j[keep]])
        out_w.append(w[keep])
    if not out_s:
        return None
    return (np.concatenate(out_s).astype(np.float32),
            np.concatenate(out_r).astype(np.float32),
            np.concatenate(out_w).astype(np.float32))


def _softmax(x, axis):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def weighted_kabsch(src: np.ndarray, ref: np.ndarray,
                    w: np.ndarray) -> np.ndarray:
    w = np.maximum(w, 1e-9)
    w = w / w.sum()
    cs = (w[:, None] * src).sum(0)
    cr = (w[:, None] * ref).sum(0)
    h = (src - cs).T @ (w[:, None] * (ref - cr))
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    r = vt.T @ np.diag([1.0, 1.0, d]) @ u.T
    t = np.eye(4)
    t[:3, :3] = r
    t[:3, 3] = cr - r @ cs
    return t


class LearnedBackend:
    """GeoRegModel-based backend satisfying reg/backend.RegistrationBackend."""

    def __init__(self, params=None, checkpoint: str | None = None,
                 cfg: GeoModelConfig = GeoModelConfig(),
                 n_super: int = 128, patch_m: int = 32,
                 voxel_size: float = 0.05, max_points: int = 8192,
                 top_pairs: int = 24, inlier_thresh: float = 0.15,
                 refine_icp: bool = True, seed: int = 0,
                 fine: bool = True, fine_score_thresh: float = 0.2,
                 min_fine_corrs: int = 12, hypotheses: int = 3,
                 max_refine: int = 3, retries: int = 2,
                 retry_score_thresh: float = 0.45):
        import jax

        if params is None and checkpoint is not None:
            import json
            import os

            from sgaligner_tpu.reg.train_geo import load_checkpoint

            params = load_checkpoint(checkpoint)
            meta_path = os.path.join(checkpoint, "geo_meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    meta = json.load(f)
                cfg = GeoModelConfig(**meta["cfg"])
                n_super = meta["prep"]["n_super"]
                patch_m = meta["prep"]["patch_m"]
                voxel_size = meta["prep"]["voxel_size"]
        if params is None:
            raise ValueError("LearnedBackend needs params= or checkpoint=")
        self.params = params
        self.cfg = cfg
        self.n_super = n_super
        self.patch_m = patch_m
        self.voxel_size = voxel_size
        self.max_points = max_points
        self.top_pairs = top_pairs
        self.inlier_thresh = inlier_thresh
        self.refine_icp = refine_icp
        self.seed = seed
        self.fine = fine
        self.fine_score_thresh = fine_score_thresh
        self.min_fine_corrs = min_fine_corrs
        self.hypotheses = hypotheses
        self.max_refine = max_refine
        self.retries = retries
        self.retry_score_thresh = retry_score_thresh
        model = GeoRegModel(cfg)
        self._apply = jax.jit(partial(model.apply, {"params": params}))
        from sgaligner_tpu.reg.geo_model import fine_log_assign

        self._fine_assign = jax.jit(
            partial(fine_log_assign, iters=cfg.sinkhorn_iters))

    def register(self, src_points: np.ndarray, ref_points: np.ndarray,
                 gt_transform: np.ndarray | None = None) -> dict | None:
        """Score-gated re-seeded attempts: FPS superpoint placement is the
        luck factor on feature-poor (planar, self-similar) scans — a retry
        with different superpoints/patches often lands >=3 good
        correspondences where the first draw landed 1-2 (measured on the
        real example scans). Retries only trigger while the verification
        score stays below ``retry_score_thresh``, so easy pairs pay one
        attempt."""
        best = None
        for attempt in range(1 + self.retries):
            res = self._register_once(src_points, ref_points,
                                      seed=self.seed + 1009 * attempt)
            if res is None:
                continue
            if best is None or res["fit_score"] > best["fit_score"]:
                best = res
            if best["fit_score"] >= self.retry_score_thresh:
                break
        return best

    def _register_once(self, src_points: np.ndarray, ref_points: np.ndarray,
                       seed: int) -> dict | None:
        rng = np.random.default_rng(seed)
        src = _prep_cloud(src_points, self.n_super, self.patch_m,
                          self.voxel_size, self.max_points, rng)
        ref = _prep_cloud(ref_points, self.n_super, self.patch_m,
                          self.voxel_size, self.max_points, rng)
        if src["mask"].sum() < 4 or ref["mask"].sum() < 4:
            return None
        out = self._apply(src["sp"], ref["sp"], src["inv"], ref["inv"],
                          src["eig"], ref["eig"],
                          src["pmask"], ref["pmask"], src["mask"], ref["mask"])
        corr = extract_correspondences(out, src, ref, self.top_pairs)
        if corr is None:
            return None
        src_c, ref_c, scores, idx_pairs = corr

        # fine stage: point-level Sinkhorn inside the matched patches gives
        # DENSE correspondences (the structure the reference's evaluator
        # consumes, registration_evaluator.py:104-108)
        fine = None
        if self.fine:
            n_valid = len(idx_pairs)
            pad = np.zeros((self.top_pairs, 2), np.int32)
            pad[:n_valid] = idx_pairs
            fla = np.asarray(self._fine_assign(
                out["src_pf"], out["ref_pf"], src["pmask"], ref["pmask"],
                pad, out["fine_temp"], out["fine_alpha"]))
            fine = extract_fine_correspondences(
                fla, pad, n_valid, src, ref, self.fine_score_thresh)
            if fine is not None and len(fine[0]) < self.min_fine_corrs:
                fine = None

        from sgaligner_tpu.reg.ransac import find_rigid_transforms_topk
        from sgaligner_tpu.utils.pointcloud import (apply_transform,
                                                    get_nearest_neighbor)

        def icp_refine(est):
            if not self.refine_icp:
                return est
            from sgaligner_tpu.reg.icp import icp_refine_host

            # coarse->fine trim schedule: a wide first pass pulls a
            # decimeter-off init into the basin; the tight second pass
            # stops non-overlap points from biasing the translation
            for trim in (6.0, 2.0, 1.0):
                est, _ = icp_refine_host(
                    src["points"], ref["points"], init_transform=est,
                    iters=10, max_corr_dist=trim * self.voxel_size,
                    seed=seed)
            return est

        def fit_score(est):
            """Fraction of src points landing on ref within 2 voxels —
            candidate verification (wrong-consensus fits score ~0)."""
            moved = apply_transform(src["points"], est)
            d = get_nearest_neighbor(moved, ref["points"])
            return float((d < 2.0 * self.voxel_size).mean())

        # candidate transforms: a DIVERSE top-k of RANSAC consensus clusters
        # from the dense fine correspondences (tight threshold — they are
        # voxel-accurate) and from the superpoint centers (loose). Under low
        # overlap the LARGEST consensus is often a wrong self-similarity
        # cluster while the right one ranks 2nd/3rd — verification against
        # the raw clouds (fit_score) picks reliably once the right cluster is
        # in the pool (measured: in 6/6 low-overlap misses of the
        # single-winner scheme, gt outscored the chosen fit).
        hyps = []
        if fine is not None:
            f_thresh = max(1.5 * self.voxel_size, 0.075)
            for tf in find_rigid_transforms_topk(
                    fine[0], fine[1], threshold=f_thresh, k=self.hypotheses,
                    max_iters=1000, seed=seed):
                hyps.append((tf, fine))
        for tf in find_rigid_transforms_topk(
                src_c, ref_c, threshold=self.inlier_thresh, k=self.hypotheses,
                max_iters=1000, seed=seed):
            hyps.append((tf, (src_c, ref_c, scores)))
        if not hyps:
            hyps = [(weighted_kabsch(src_c, ref_c, scores),
                     (src_c, ref_c, scores))]

        # cheap pre-score picks the ICP budget's worth of candidates
        pre = sorted(hyps, key=lambda h: -fit_score(h[0]))[: self.max_refine]
        scored = [(fit_score(est), est, corrs)
                  for tf, corrs in pre for est in (icp_refine(tf),)]
        best_score, est, (src_c, ref_c, scores) = max(scored,
                                                      key=lambda c: c[0])

        return {
            "estimated_transform": est,
            "src_corr_points": src_c,
            "ref_corr_points": ref_c,
            "corr_scores": scores,
            "fit_score": best_score,
        }
