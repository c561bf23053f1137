"""Subscan generation from raw 3RScan scenes.

Behavioral port of /root/reference/preprocessing/scan3r/subgenscan3r.py:14-238:
walk each scene's camera trajectory, accumulate per-frame visible points
(pinhole projection with the reference's bound quirk, utils/pointcloud.py) until
a random 20-50% of the scene's points are covered, emit the subscan's structured
``data.npy`` plus carved objects/relationships entries; then compute pairwise
subscan overlaps (exact-match point overlap, keep 0.1<=ratio<=0.9, record the
anchor object ids), subsample to ``subscenes_per_scene`` subscans, and write the
filtered anchors json.

The frame-visibility projection is vectorized over frame chunks (the reference
projects one frame per python iteration); the accumulate-until-threshold scan
over frames stays sequential by construction.
"""

from __future__ import annotations

import itertools
import os
import os.path as osp
import random

import numpy as np

from sgaligner_tpu.core.config import Config
from sgaligner_tpu.utils import io, scan3r_io
from sgaligner_tpu.utils.pointcloud import (
    compute_pcl_overlap,
    get_visible_pts_from_cam_pose,
)


class SubGenScan3R:
    def __init__(self, cfg: Config, split: str = "train"):
        self.cfg = cfg
        self.scene_dir = osp.join(cfg.data.root_dir, "scans")
        self.file_dir = osp.join(cfg.data.root_dir, "files")
        self.out_dir = cfg.data.subscan_dir
        self.scene_out_dir = osp.join(self.out_dir, "scans")
        self.file_out_dir = osp.join(self.out_dir, "files")
        self.split = split
        io.ensure_dir(self.scene_out_dir)
        io.ensure_dir(self.file_out_dir)
        random.seed(cfg.seed)

        self.scan_ids = scan3r_io.get_scan_ids(self.file_dir, split)
        self.scan_rels = io.load_json(
            osp.join(self.file_dir, "relationships.json"))["scans"]
        self.scan_objs = io.load_json(
            osp.join(self.file_dir, "objects.json"))["scans"]

        self.num_subscans_per_scan = cfg.preprocess.subscenes_per_scene
        self.subscene_rels = {"scans": []}
        self.subscene_objs = {"scans": []}
        self.obj_pt_scene_thresh = cfg.preprocess.min_obj_points
        self.label_file_name = (cfg.data.label_file_name
                                or "labels.instances.align.annotated.v2.ply")
        self.save_name = "data.npy"
        self.skip: int | None = None

    def __len__(self) -> int:
        return len(self.scan_ids)

    # -- per scene ---------------------------------------------------------
    def gen_scene_graph(self, scan_id: str, idx: int, ply_data,
                        visible_pts_mask: np.ndarray) -> dict:
        """Carve the scene graph to the subscan (subgenscan3r.py:51-85)."""
        obj_json_scan = next(o for o in self.scan_objs
                             if o["scan"] == scan_id)["objects"]
        subscan_id = f"{scan_id}_{idx}"
        visible_pts_idx = np.where(visible_pts_mask)[0]

        visible_pcl, visible_obj_ids = scan3r_io.create_ply_data(
            ply_data, visible_pts_idx)
        unique_ids = np.unique(visible_obj_ids)

        subscan_obj = [o for o in obj_json_scan if int(o["id"]) in unique_ids]
        self.subscene_objs["scans"].append(
            {"scan": subscan_id, "objects": subscan_obj})

        scan_rels = next(r for r in self.scan_rels
                         if r["scan"] == scan_id)["relationships"]
        counts = {int(i): int((visible_obj_ids == i).sum()) for i in unique_ids}
        subscan_rels = [
            [sub_id, ob_id, rel_id, rel_name]
            for (sub_id, ob_id, rel_id, rel_name) in scan_rels
            if counts.get(int(sub_id), 0) > self.obj_pt_scene_thresh
            and counts.get(int(ob_id), 0) > self.obj_pt_scene_thresh
        ]
        self.subscene_rels["scans"].append(
            {"relationships": subscan_rels, "scan": subscan_id})
        return {"pcl": visible_pcl, "subscan_id": subscan_id}

    def generate_scan(self, idx: int) -> int:
        """Trajectory walk for one scene (subgenscan3r.py:159-238)."""
        scan_id = self.scan_ids[idx]
        frame_idxs = scan3r_io.load_frame_idxs(self.scene_dir, scan_id,
                                               skip=self.skip)
        frame_poses = scan3r_io.load_all_poses(self.scene_dir, scan_id,
                                               frame_idxs)
        ply_data = scan3r_io.read_ply_vertices(
            osp.join(self.scene_dir, scan_id, self.label_file_name))
        scene_pts = np.stack([ply_data["x"], ply_data["y"], ply_data["z"]]).T
        if scene_pts.shape[0] == 0:
            return 0

        intrinsic_info = scan3r_io.load_intrinsics(self.scene_dir, scan_id)
        max_pts_subscan = random.randint(int(0.2 * scene_pts.shape[0]),
                                         int(0.5 * scene_pts.shape[0]))
        curr_visible = np.zeros(scene_pts.shape[0], bool)

        subscan_idx = 0
        for frame_cnt in range(len(frame_idxs)):
            frame_visible = get_visible_pts_from_cam_pose(
                scene_pts, frame_poses[frame_cnt], intrinsic_info)
            curr_visible |= frame_visible
            if curr_visible.sum() >= max_pts_subscan:
                subscan = self.gen_scene_graph(scan_id, subscan_idx, ply_data,
                                               curr_visible)
                out = osp.join(self.scene_out_dir, subscan["subscan_id"])
                io.ensure_dir(out)
                np.save(osp.join(out, self.save_name), subscan["pcl"])
                subscan_idx += 1
                curr_visible = np.zeros(scene_pts.shape[0], bool)
        return subscan_idx

    def generate_all(self) -> None:
        for idx in range(len(self)):
            n = self.generate_scan(idx)
            print(f"[INFO] {self.scan_ids[idx]}: {n} subscans")

    # -- overlap + metadata --------------------------------------------------
    def calculate_overlap(self) -> None:
        """Pairwise subscan overlap per scene (subgenscan3r.py:90-120)."""
        anchor_file = osp.join(self.file_out_dir,
                               f"anchors_{self.split}_all.json")
        all_subscan_ids = os.listdir(self.scene_out_dir)
        overlap_data = []
        for scan_id in self.scan_ids:
            subscan_ids = [s for s in all_subscan_ids if s.startswith(scan_id)]
            ply_all = [np.load(osp.join(self.scene_out_dir, s, "data.npy"))
                       for s in subscan_ids]
            for a, b in itertools.combinations(range(len(subscan_ids)), 2):
                src_ply, ref_ply = ply_all[a], ply_all[b]
                src_pts = np.stack([src_ply["x"], src_ply["y"], src_ply["z"]]).T
                ref_pts = np.stack([ref_ply["x"], ref_ply["y"], ref_ply["z"]]).T
                ratio, common_idx = compute_pcl_overlap(src_pts, ref_pts)
                if 0.1 <= ratio <= 0.9:
                    anchor_ids = np.unique(src_ply["objectId"][common_idx])
                    overlap_data.append({
                        "src": subscan_ids[a], "ref": subscan_ids[b],
                        "overlap": ratio,
                        "anchorIds": anchor_ids.tolist(),
                    })
        io.write_json(overlap_data, anchor_file)

    def write_metadata(self) -> None:
        """Subsample subscans + filter anchors (subgenscan3r.py:122-157)."""
        io.write_json(self.subscene_rels, osp.join(
            self.file_out_dir, f"relationships_subscenes_{self.split}.json"))
        io.write_json(self.subscene_objs, osp.join(
            self.file_out_dir, f"objects_subscenes_{self.split}.json"))

        all_subscan_ids = np.array([
            s for s in os.listdir(self.scene_out_dir)
            if "_" in s and s[: s.index("_")] in self.scan_ids])

        # the reference seeds only `random`, leaving np.random.choice here
        # nondeterministic (subgenscan3r.py:139); we seed it for reproducibility
        rng = np.random.default_rng(self.cfg.seed)
        chosen = []
        for scan_id in self.scan_ids:
            per_scan = [s for s in all_subscan_ids if s.startswith(scan_id)]
            if len(per_scan) > self.num_subscans_per_scan:
                per_scan = list(rng.choice(
                    per_scan, self.num_subscans_per_scan, replace=False))
            chosen.append(per_scan)
        subscan_ids = np.concatenate([np.array(c, dtype=object) for c in chosen]) \
            if chosen else np.array([])

        anchors_all = io.load_json(
            osp.join(self.file_out_dir, f"anchors_{self.split}_all.json"))
        kept = [a for a in anchors_all
                if a["src"] in subscan_ids and a["ref"] in subscan_ids]

        np.savetxt(osp.join(self.file_out_dir,
                            f"{self.split}_scans_subscenes.txt"),
                   subscan_ids, fmt="%s")
        io.write_json(kept, osp.join(self.file_out_dir,
                                     f"anchors_{self.split}.json"))

        # carry the relation vocab into the subscan workspace so downstream
        # preprocessing is self-contained
        vocab_src = osp.join(self.file_dir, "relationships.txt")
        if osp.exists(vocab_src):
            import shutil

            shutil.copy(vocab_src,
                        osp.join(self.file_out_dir, "relationships.txt"))
