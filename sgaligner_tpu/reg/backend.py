"""Pluggable point-registration backends.

The reference hard-wires GeoTransformer (CUDA submodule) as the point-level
correspondence engine (/root/reference/src/engine/registration_evaluator.py:24-27,
58-90). Here the evaluator consumes a *backend interface* with the same output
contract as GeoTransformer inference (estimated_transform, src/ref_corr_points,
corr_scores; registration_evaluator.py:104-108):

* ``MutualNNBackend`` — self-contained classical default: voxel downsample,
  mutual nearest-neighbor correspondences, distance-kernel scores, rigid fit via
  the batched TPU RANSAC. Valid for the reference's evaluation setting where
  subscan pairs share a world frame (gt_transform == I,
  inference_align_reg.py:168).
* ``GeoTransformerBackend`` — adapter for an external GeoTransformer checkout +
  3DMatch checkpoint (torch). Kept out-of-scope to retrain (SURVEY §2.2); raises
  a clear error when the dependency is absent.
"""

from __future__ import annotations

from typing import Protocol

import numpy as np

from sgaligner_tpu.reg.ransac import find_rigid_transform
from sgaligner_tpu.utils.pointcloud import get_nearest_neighbor


class RegistrationBackend(Protocol):
    def register(self, src_points: np.ndarray, ref_points: np.ndarray,
                 gt_transform: np.ndarray | None = None) -> dict | None: ...


def voxel_downsample(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """First-point-per-voxel downsampling (Open3D voxel_down_sample role)."""
    if len(points) == 0:
        return points
    keys = np.floor(points / voxel_size).astype(np.int64)
    _, first = np.unique(keys, axis=0, return_index=True)
    return points[np.sort(first)]


class MutualNNBackend:
    def __init__(self, voxel_size: float = 0.025, score_sigma: float = 0.05,
                 max_points: int = 10000, ransac_threshold: float = 0.03,
                 ransac_iters: int = 1000, seed: int = 0,
                 refine_icp: bool = False, icp_iters: int = 10,
                 coarse: str = "none"):
        self.voxel_size = voxel_size
        self.score_sigma = score_sigma
        self.max_points = max_points
        self.ransac_threshold = ransac_threshold
        self.ransac_iters = ransac_iters
        self.seed = seed
        self.refine_icp = refine_icp
        self.icp_iters = icp_iters
        # "pca": principal-axes coarse alignment BEFORE NN matching — needed
        # when src/ref are not co-registered (non-identity gt); "none" keeps
        # the reference's same-world-frame evaluation semantics.
        self.coarse = coarse

    def register(self, src_points: np.ndarray, ref_points: np.ndarray,
                 gt_transform: np.ndarray | None = None) -> dict | None:
        rng = np.random.default_rng(self.seed)
        # same 10k-point cap as the reference (registration_evaluator.py:59-66)
        if src_points.shape[0] > self.max_points:
            src_points = src_points[rng.choice(len(src_points), self.max_points,
                                               replace=False)]
        if ref_points.shape[0] > self.max_points:
            ref_points = ref_points[rng.choice(len(ref_points), self.max_points,
                                               replace=False)]

        src_d = voxel_downsample(src_points, self.voxel_size)
        ref_d = voxel_downsample(ref_points, self.voxel_size)
        if len(src_d) < 3 or len(ref_d) < 3:
            return None

        # correspondences are discovered in a (coarsely) aligned frame but
        # RETURNED in the original frames — the rigid fit below re-estimates
        # the FULL transform from them
        src_m = src_d
        if self.coarse == "pca":
            from sgaligner_tpu.reg.coarse import pca_coarse_align
            from sgaligner_tpu.utils.pointcloud import apply_transform

            t0 = pca_coarse_align(src_d, ref_d, seed=self.seed)
            src_m = apply_transform(src_d, t0)

        d_sr, i_sr = get_nearest_neighbor(src_m, ref_d, return_index=True)
        _, i_rs = get_nearest_neighbor(ref_d, src_m, return_index=True)
        mutual = i_rs[i_sr] == np.arange(len(src_d))
        if mutual.sum() < 3:
            return None

        src_corr = src_d[mutual]
        ref_corr = ref_d[i_sr[mutual]]
        scores = np.exp(-d_sr[mutual] / self.score_sigma)

        est, _ = find_rigid_transform(src_corr.astype(np.float32),
                                      ref_corr.astype(np.float32),
                                      threshold=self.ransac_threshold,
                                      max_iters=self.ransac_iters,
                                      seed=self.seed)
        if est is None:
            return None
        if self.refine_icp:
            from sgaligner_tpu.reg.icp import icp_refine_host

            est, _ = icp_refine_host(src_d, ref_d, init_transform=est,
                                     iters=self.icp_iters,
                                     max_corr_dist=4 * self.voxel_size,
                                     seed=self.seed)
        return {
            "estimated_transform": est,
            "src_corr_points": src_corr,
            "ref_corr_points": ref_corr,
            "corr_scores": scores,
        }


class GeoTransformerBackend:
    """Adapter around an external GeoTransformer checkout (torch/CUDA).

    Interface parity with registration_evaluator.py:58-90: builds the stack-mode
    collated input and returns the model's output dict. Requires the
    ``geotransformer`` package importable and a 3DMatch snapshot path.
    """

    def __init__(self, snapshot: str, neighbor_limits=(38, 36, 36, 38)):
        try:
            import torch  # noqa: F401
            from GeoTransformer.config import make_cfg  # type: ignore
            from GeoTransformer.model import create_model  # type: ignore
            from geotransformer.utils.data import (  # type: ignore
                registration_collate_fn_stack_mode,
            )
        except ImportError as e:
            raise ImportError(
                "GeoTransformerBackend needs an external GeoTransformer checkout "
                "on PYTHONPATH (see reference .gitmodules). Use backend='ransac' "
                "(MutualNNBackend) for the self-contained path.") from e
        import torch

        self._torch = torch
        self._collate = registration_collate_fn_stack_mode
        self.cfg = make_cfg()
        self.model = create_model(self.cfg)
        state = torch.load(snapshot, map_location="cpu")
        self.model.load_state_dict(state["model"], strict=True)
        self.model.eval()
        self.neighbor_limits = list(neighbor_limits)
        self.max_points = 10000

    def register(self, src_points, ref_points, gt_transform=None):
        torch = self._torch
        rng = np.random.default_rng(0)
        if src_points.shape[0] > self.max_points:
            src_points = src_points[rng.choice(len(src_points), self.max_points,
                                               replace=False)]
        if ref_points.shape[0] > self.max_points:
            ref_points = ref_points[rng.choice(len(ref_points), self.max_points,
                                               replace=False)]
        data = {
            "ref_points": ref_points.astype(np.float32),
            "src_points": src_points.astype(np.float32),
            "ref_feats": np.ones_like(ref_points[:, :1], np.float32),
            "src_feats": np.ones_like(src_points[:, :1], np.float32),
            "transform": (gt_transform if gt_transform is not None
                          else np.eye(4)).astype(np.float32),
        }
        with torch.no_grad():
            data = self._collate([data], self.cfg.backbone.num_stages,
                                 self.cfg.backbone.init_voxel_size,
                                 self.cfg.backbone.init_radius,
                                 self.neighbor_limits)
            try:
                out = self.model(data)
            except Exception:
                return None
        return {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
                for k, v in out.items()}


def build_backend(cfg, reg_snapshot: str | None = None) -> RegistrationBackend:
    if cfg.reg_model.backend == "geotransformer":
        if not reg_snapshot:
            raise ValueError("geotransformer backend needs --reg_snapshot")
        return GeoTransformerBackend(reg_snapshot,
                                     neighbor_limits=cfg.reg_model.neighbor_limits)
    if cfg.reg_model.backend == "learned":
        # self-contained learned coarse-to-fine registration (reg/learned.py);
        # --reg_snapshot points at a reg/train_geo.py checkpoint dir (default:
        # the pretrained synthetic checkpoint shipped in checkpoints/geo_reg)
        import os

        from sgaligner_tpu.reg.learned import LearnedBackend

        ckpt = reg_snapshot or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "checkpoints", "geo_reg")
        return LearnedBackend(checkpoint=ckpt)
    return MutualNNBackend(ransac_threshold=cfg.reg_model.ransac_threshold,
                           ransac_iters=cfg.reg_model.ransac_max_iters,
                           coarse=getattr(cfg.reg_model, "coarse", "none"))
