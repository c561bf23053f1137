"""Inference testers: alignment+registration, overlap detection, mosaicking.

Runtime equivalents of the reference testers
(/root/reference/src/inference/sgaligner/inference_align_reg.py:22-189,
inference_find_overlapper.py:21-125, inference_mosaicking.py:68-211) over the
padded pipeline: the model forward + similarity matrices run as one jitted
program per batch; per-pair host glue (node-corr extraction, cloud loading,
registration) follows.

Known upstream bugs fixed (documented in SURVEY.md §2 items 18, 20):
* the overlapper's nonexistent ``subscans_scenes_dir`` attribute and its
  tuple-vs-float corr-score comparison,
* EVA's single-module eval referencing ``embedding`` before assignment.
"""

from __future__ import annotations

import os.path as osp
from typing import Any

import jax
import numpy as np

from sgaligner_tpu.align import alignment
from sgaligner_tpu.core import checkpoint as ckpt
from sgaligner_tpu.core.config import Config
from sgaligner_tpu.data.batch import BatchSpec, collate, pack_pair
from sgaligner_tpu.engine.factory import build_model, loss_kind
from sgaligner_tpu.engine.train_step import _apply_model, make_eval_step
from sgaligner_tpu.ops import metrics as M
from sgaligner_tpu.parallel.mesh import make_mesh, shard_batch
from sgaligner_tpu.utils.io import load_pkl_data, load_plydata_npy
from sgaligner_tpu.utils.logging import Logger, SummaryBoard
from sgaligner_tpu.utils.pointcloud import compute_pcl_overlap


class BaseTester:
    """Snapshot resolution + jitted forward (base_tester.py:14-79 role)."""

    def __init__(self, cfg: Config, snapshot: str | None = None,
                 test_epoch: int | None = None, test_iter: int | None = None,
                 log_file: str | None = None):
        self.cfg = cfg
        self.logger = Logger(log_file)
        self.mesh = make_mesh(cfg.tpu.dp)
        self.model = build_model(cfg, platform=self.mesh.devices.flat[0].platform)
        self.kind = loss_kind(cfg)
        self.modules = tuple(cfg.modules)
        self.key_modality = "joint" if len(self.modules) > 1 else self.modules[0]

        if snapshot is None and test_epoch is not None:
            snapshot = osp.join(cfg.snapshot_dir, f"epoch-{test_epoch}")
        if snapshot is None and test_iter is not None:
            # the reference resolves --test_iter to iter-<n>.pth.tar
            # (base_tester.py:28-34); honor both our orbax layout and a torch
            # import, and fail loudly instead of silently ignoring the flag
            cands = [osp.join(cfg.snapshot_dir, f"iter-{test_iter}"),
                     osp.join(cfg.snapshot_dir, f"iter-{test_iter}.pth.tar")]
            snapshot = next((c for c in cands if osp.exists(c)), None)
            if snapshot is None:
                raise FileNotFoundError(
                    f"--test_iter {test_iter}: none of {cands} exist")
        if snapshot is None:
            snapshot = ckpt.latest_snapshot(cfg.snapshot_dir)
        if snapshot is None:
            raise FileNotFoundError(
                f"no snapshot found under {cfg.snapshot_dir}; pass --snapshot")
        self.snapshot_path = snapshot
        self.params, self.batch_stats = self._load(snapshot)
        self._fwd = jax.jit(
            lambda p, bs, b: _apply_model(self.model, p, bs, b, False, None)[0])
        self.eval_step = make_eval_step(self.model, self.modules, kind=self.kind,
                                        zoom=cfg.loss.zoom,
                                        ks=tuple(cfg.metrics.all_k),
                                        with_sim=bool(cfg.registration))
        self.logger.info(f"loaded snapshot {snapshot}")

    def _load(self, snapshot: str):
        if snapshot.endswith((".pth.tar", ".pth", ".tar")):
            payload = ckpt.load_torch_snapshot(snapshot, self.modules,
                                               tuple(self.cfg.model.heads))
            return payload["params"], payload.get("batch_stats", {})
        payload = ckpt.load_snapshot(snapshot)
        params = payload["params"]
        model_params = params["model"] if "model" in params else params
        return model_params, payload.get("batch_stats", {})

    def forward(self, batch: dict[str, np.ndarray]) -> np.ndarray:
        """Returns key-modality embeddings reshaped [B, 2N, D] (host)."""
        sharded = shard_batch(batch, self.mesh)
        embs = self._fwd(self.params, self.batch_stats, sharded)
        b, two_n = batch["obj_mask"].shape
        emb = embs[self.key_modality].reshape(b, two_n, -1)
        return emb

    def sim_matrices(self, batch: dict[str, np.ndarray]) -> np.ndarray:
        emb = self.forward(batch)
        import jax.numpy as jnp

        sim = M.cosine_sim_matrix(jnp.asarray(emb),
                                  jnp.asarray(batch["obj_mask"]))
        return np.asarray(jax.device_get(sim))


class AlignRegTester(BaseTester):
    """inference_align_reg: node-matching metrics + optional registration."""

    def __init__(self, cfg: Config, dataset, loader,
                 registration_evaluator=None, **kw):
        super().__init__(cfg, **kw)
        self.dataset = dataset
        self.loader = loader
        self.reg_evaluator = registration_evaluator
        self.reg_k = cfg.reg_model.K
        self.run_reg = cfg.registration and registration_evaluator is not None

    def run(self) -> dict[str, Any]:
        eval_params = {"model": self.params, "loss": {}}
        # alignment metrics: aggregate the jitted components
        rr_sum = rr_count = 0.0
        hits = {k: [0.0, 0.0] for k in self.cfg.metrics.all_k}
        sgar_sums = {"2": 0.0, "50": 0.0, "100": 0.0}
        n_pairs = 0.0
        normal_board, aligner_board = SummaryBoard(), SummaryBoard()

        pair_idx = 0
        for batch in self.loader:
            b = batch["obj_mask"].shape[0]
            sharded = shard_batch(batch, self.mesh)
            # masked eval step needs loss params only for the loss value; the
            # loss output is ignored here but needs well-formed log_vars
            import jax.numpy as jnp

            eval_params["loss"] = {
                "ial_log_vars": jnp.zeros(len(self.modules)),
                "icl_log_vars": jnp.zeros(len(self.modules)),
            }
            out = jax.device_get(
                self.eval_step(eval_params, self.batch_stats, sharded))
            rr_sum += float(out["rr_sum"]); rr_count += float(out["rr_count"])
            for k in self.cfg.metrics.all_k:
                c, t = out[f"hits@{k}"]
                hits[k][0] += float(c); hits[k][1] += float(t)
            pv = np.asarray(out["pair_valid"])[:b]
            n_pairs += pv.sum()
            for mode in sgar_sums:
                sgar_sums[mode] += float(
                    (np.asarray(out["sgar"][mode])[:b] * pv).sum())

            if self.run_reg:
                # sim matrices come from THE SAME jitted forward (the reference
                # ran a second model forward per batch here — weak #5 in
                # round-1 review; eval_step returns them when registration on)
                sim = np.asarray(out["sim"])
                for i in range(b):
                    self._register_pair(batch, sim, i, pair_idx + i,
                                        normal_board, aligner_board)
            pair_idx += b

        results: dict[str, Any] = {
            "mrr": rr_sum / max(rr_count, 1.0),
        }
        for k in self.cfg.metrics.all_k:
            results[f"hits@{k}"] = hits[k][0] / max(hits[k][1], 1.0)
        for mode, s in sgar_sums.items():
            results[f"sgar@{mode}"] = s / max(n_pairs, 1.0)
        if self.run_reg:
            results["normal_registration"] = normal_board.summary()
            results["aligner_registration"] = aligner_board.summary()
        self.logger.info("alignment: " + ", ".join(
            f"{k}: {v:.4f}" for k, v in results.items()
            if isinstance(v, float)))
        return results

    def _register_pair(self, batch, sim, i, dataset_idx, normal_board,
                       aligner_board) -> None:
        n = batch["obj_mask"].shape[1] // 2
        n_src, n_ref = int(batch["n_src"][i]), int(batch["n_ref"][i])
        # reference gates registration on having anchors (inference_align_reg.py:122)
        if n_src == 0 or n_ref == 0 or not batch["anchor_mask"][i].any():
            return
        node_corrs = alignment.compute_node_corrs(sim[i], n_src, n, self.reg_k)
        node_corrs = alignment.get_node_corrs_objects_ids(
            node_corrs, batch["obj_ids"][i])

        src_scan_id, ref_scan_id = self.dataset.pair_scan_ids(dataset_idx)
        scans_dir = self.dataset.scans_scenes_dir
        src_points, src_ply = load_plydata_npy(
            osp.join(scans_dir, src_scan_id, "data.npy"), return_ply_data=True)
        ref_points, ref_ply = load_plydata_npy(
            osp.join(scans_dir, ref_scan_id, "data.npy"), return_ply_data=True)
        pcl_center = src_points.mean(axis=0)  # val centering (scan3r.py:76)

        # whole-scene cloud: subscan ids are '<scan>_<suffix>'
        raw_points = None
        if "_" in src_scan_id and self.cfg.data.root_dir:
            scan_id = src_scan_id[: src_scan_id.index("_")]
            raw_path = osp.join(self.cfg.data.root_dir, "scans", scan_id,
                                "data.npy")
            if osp.exists(raw_path):
                raw_points = load_plydata_npy(raw_path) - pcl_center
        if raw_points is None:
            raw_points = np.concatenate([src_points, ref_points]) - pcl_center

        # gt transform: identity in the reference's setting; a stored per-pair
        # transform (rescan-style) is conjugated by the centering translation
        # (both clouds get -pcl_center): t' = R c + t - c
        gt = self.dataset.pair_gt_transform(dataset_idx)
        identity_gt = np.allclose(gt, np.eye(4))
        gt_c = gt.copy()
        gt_c[:3, 3] = gt[:3, :3] @ pcl_center + gt[:3, 3] - pcl_center

        reg = {
            "node_corrs": node_corrs,
            "src_points": src_points - pcl_center,
            "ref_points": ref_points - pcl_center,
            "src_plydata": src_ply,
            "ref_plydata": ref_ply,
            "raw_points": raw_points,
            "gt_transform": gt_c,
        }
        # GT correspondences via exact-match overlap in the gt-ALIGNED frame
        # (reference: same frame, point_cloud.py:91-103); the f32 transform
        # round-trip needs a loose radius in the non-identity case
        from sgaligner_tpu.utils.pointcloud import apply_transform

        src_al = (reg["src_points"] if identity_gt
                  else apply_transform(reg["src_points"], gt_c))
        thresh = 1e-7 if identity_gt else 1e-4
        _, gt_src_idx = compute_pcl_overlap(src_al, reg["ref_points"], thresh)
        _, gt_ref_idx = compute_pcl_overlap(reg["ref_points"], src_al, thresh)
        reg["gt_src_corr_points"] = reg["src_points"][gt_src_idx]
        reg["gt_ref_corr_points"] = reg["ref_points"][gt_ref_idx]

        normal, aligner = self.reg_evaluator.run_registration(reg)
        if normal is not None and aligner is not None:
            normal_board.update_from_dict(normal)
            aligner_board.update_from_dict(aligner)


class OverlapTester(BaseTester):
    """inference_find_overlapper: overlap-vs-not classification P/R/F1."""

    def __init__(self, cfg: Config, dataset, loader, registration_evaluator,
                 **kw):
        super().__init__(cfg, **kw)
        self.dataset = dataset
        self.loader = loader
        self.reg_evaluator = registration_evaluator
        self.alignment_thresh = cfg.model.alignment_thresh
        self.corr_score_thresh = cfg.reg_model.corr_score_thresh

    def run(self) -> dict[str, Any]:
        aligner_data = {"true": [], "pred": []}
        registration_data = {"true": [], "pred": []}
        pair_idx = 0
        for batch in self.loader:
            b = batch["obj_mask"].shape[0]
            sim = self.sim_matrices(batch)
            n = batch["obj_mask"].shape[1] // 2
            for i in range(b):
                n_src, n_ref = int(batch["n_src"][i]), int(batch["n_ref"][i])
                overlap = float(batch["overlap"][i])
                src_scan_id, ref_scan_id = self.dataset.pair_scan_ids(pair_idx + i)
                scans_dir = self.dataset.scans_scenes_dir
                src_points = load_plydata_npy(
                    osp.join(scans_dir, src_scan_id, "data.npy"))
                ref_points = load_plydata_npy(
                    osp.join(scans_dir, ref_scan_id, "data.npy"))
                pcl_center = src_points.mean(axis=0)
                reg = {"src_points": src_points - pcl_center,
                       "ref_points": ref_points - pcl_center,
                       "gt_transform": np.eye(4)}
                res = self.reg_evaluator.run_normal_registration(
                    reg, evaluate_registration=False)
                if res is None:
                    continue
                _, mean_corr_score = res
                score = alignment.compute_alignment_score(sim[i], n_src, n_ref, n)
                registration_data["pred"].append(
                    1.0 if mean_corr_score > self.corr_score_thresh else 0.0)
                registration_data["true"].append(1.0 if overlap > 0.0 else 0.0)
                aligner_data["pred"].append(
                    1.0 if score > self.alignment_thresh else 0.0)
                aligner_data["true"].append(1.0 if overlap > 0.0 else 0.0)
            pair_idx += b

        results = {
            "aligner_overlapper": alignment.precision_recall_f1(
                aligner_data["true"], aligner_data["pred"]),
            "registration_overlapper": alignment.precision_recall_f1(
                registration_data["true"], registration_data["pred"]),
        }
        for name, m in results.items():
            self.logger.info(f"{name}: " + ", ".join(
                f"{k}: {v:.4f}" for k, v in m.items()))
        return results


class MosaickTester(BaseTester):
    """inference_mosaicking: incremental multi-subscan reconstruction."""

    def __init__(self, cfg: Config, registration_evaluator,
                 scan_subscan_map: dict[str, list[str]],
                 subscans_dir: str, max_scans: int | None = 2, **kw):
        super().__init__(cfg, **kw)
        self.reg_evaluator = registration_evaluator
        # reference truncates to the first 2 scans (inference_mosaicking.py:101)
        keys = list(scan_subscan_map)[:max_scans] if max_scans else \
            list(scan_subscan_map)
        self.scan_subscan_map = {k: scan_subscan_map[k] for k in keys}
        self.subscans_dir = subscans_dir
        self.pc_res = cfg.val.pc_res

    def _load_pair_batch(self, src_id: str, ref_id: str):
        """load_subscan_pair (inference_mosaicking.py:20-66) -> PairBatch."""
        scenes = osp.join(self.subscans_dir, "scans")
        files = osp.join(self.subscans_dir, "files", self.cfg.val.data_mode)
        src_points = load_plydata_npy(osp.join(scenes, src_id, "data.npy"))
        center = src_points.mean(axis=0)
        src = load_pkl_data(osp.join(files, "data", f"{src_id}.pkl"))
        ref = load_pkl_data(osp.join(files, "data", f"{ref_id}.pkl"))

        spec = BatchSpec(1, self.cfg.tpu.max_objects, self.pc_res,
                         self.cfg.model.rel_dim, self.cfg.model.attr_dim)
        from sgaligner_tpu.data.scan3r import Scan3RDataset

        fit = Scan3RDataset._fit_dim
        sample = pack_pair(
            spec,
            src_points=(src["obj_points"][self.pc_res] - center).astype(np.float32),
            ref_points=(ref["obj_points"][self.pc_res] - center).astype(np.float32),
            src_bow_rel=fit(src["bow_vec_object_edge_feats"].astype(np.float32),
                            spec.rel_dim, "relation"),
            ref_bow_rel=fit(ref["bow_vec_object_edge_feats"].astype(np.float32),
                            spec.rel_dim, "relation"),
            src_bow_attr=fit(src["bow_vec_object_attr_feats"].astype(np.float32),
                             spec.attr_dim, "attribute"),
            ref_bow_attr=fit(ref["bow_vec_object_attr_feats"].astype(np.float32),
                             spec.attr_dim, "attribute"),
            src_rel_pose=src["rel_trans"].astype(np.float32),
            ref_rel_pose=ref["rel_trans"].astype(np.float32),
            src_edges=np.asarray(src["edges"], np.int64),
            ref_edges=np.asarray(ref["edges"], np.int64),
            e1i=np.zeros(0, np.int64), e2i=np.zeros(0, np.int64),
            e1j=np.arange(len(src["objects_id"])),
            e2j=np.arange(len(ref["objects_id"])),
            src_obj_ids=np.asarray(src["objects_id"], np.int64),
            ref_obj_ids=np.asarray(ref["objects_id"], np.int64),
        )
        return collate([sample]), center

    def run(self) -> dict[str, Any]:
        from sgaligner_tpu.reg.metrics import compute_mosaicking_error
        from sgaligner_tpu.utils.pointcloud import apply_transform

        boards = {"aligner_mosaicking_metrics": SummaryBoard(),
                  "normal_mosaicking_metrics": SummaryBoard()}
        scenes = osp.join(self.subscans_dir, "scans")

        for scan_id, subscan_ids in self.scan_subscan_map.items():
            if len(subscan_ids) == 0:
                continue
            origin_id = subscan_ids[0]
            origin_points = load_plydata_npy(
                osp.join(scenes, origin_id, "data.npy"))
            recon_aligner = [origin_points]
            recon_normal = [origin_points]
            gt_points = [origin_points]

            for src_id in subscan_ids[1:]:
                batch, center = self._load_pair_batch(src_id, origin_id)
                sim = self.sim_matrices(batch)
                n = batch["obj_mask"].shape[1] // 2
                n_src = int(batch["n_src"][0])
                node_corrs = alignment.compute_node_corrs(sim[0], n_src, n, k=1)
                node_corrs = alignment.get_node_corrs_objects_ids(
                    node_corrs, batch["obj_ids"][0])

                src_points, src_ply = load_plydata_npy(
                    osp.join(scenes, src_id, "data.npy"), return_ply_data=True)
                ref_points, ref_ply = load_plydata_npy(
                    osp.join(scenes, origin_id, "data.npy"), return_ply_data=True)
                gt_points.append(src_points)

                reg = {"node_corrs": node_corrs,
                       "src_points": src_points - center,
                       "ref_points": ref_points - center,
                       "src_plydata": src_ply, "ref_plydata": ref_ply,
                       "gt_transform": np.eye(4)}
                est_aligner = self.reg_evaluator.run_aligner_registration(
                    reg, evaluate_registration=False)
                res_normal = self.reg_evaluator.run_normal_registration(
                    reg, evaluate_registration=False)
                if res_normal is None or est_aligner is None:
                    continue
                est_normal = res_normal[0]
                recon_aligner.append(apply_transform(src_points, est_aligner))
                recon_normal.append(apply_transform(src_points, est_normal))

            gt = np.concatenate(gt_points)
            boards["aligner_mosaicking_metrics"].update_from_dict(
                compute_mosaicking_error(np.concatenate(recon_aligner), gt))
            boards["normal_mosaicking_metrics"].update_from_dict(
                compute_mosaicking_error(np.concatenate(recon_normal), gt))

        results = {k: b.summary() for k, b in boards.items()}
        for name, m in results.items():
            self.logger.info(f"{name}: " + ", ".join(
                f"{k}: {v:.4f}" for k, v in m.items()))
        return results
