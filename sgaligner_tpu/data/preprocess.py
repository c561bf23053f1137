"""Offline graph preprocessing: raw subscans -> per-subscan pkl dicts.

Behavioral port of /root/reference/preprocessing/scan3r/preprocess.py:40-374:
per-object FPS point sets at each configured resolution, convex-hull barycenters,
relative translations to the max-out-degree root object, dense 'none'-relation
completion, id->idx edge reindexing, plus the two bag-of-words passes (41-d
relation vocab; attribute vocab seeded from obj_attr.pkl and grown over the
split). Graph-perturbation modes (remove_nodes / remove_edges /
change_node_semantic / change_edge_semantic) reproduce the paper's robustness
ablations (preprocess.py:17-38,61-83,123-149).

TPU-native difference: FPS for all objects of a scan runs as ONE batched device
call (ops/fps.py) instead of the reference's O(N·npoint) numpy loop per object;
a numpy fallback keeps preprocessing runnable without an accelerator.
"""

from __future__ import annotations

import os.path as osp
from dataclasses import dataclass

import numpy as np
from scipy.spatial import ConvexHull, QhullError

from sgaligner_tpu.core.config import Config
from sgaligner_tpu.utils import io
from sgaligner_tpu.utils.pointcloud import pcl_farthest_sample


@dataclass
class PerturbArgs:
    """Reference CLI flags (preprocess.py:17-38)."""

    remove_node: bool = False
    remove_edge: bool = False
    change_node_semantic: bool = False
    change_edge_semantic: bool = False

    @property
    def mode(self) -> str:
        if self.remove_node:
            return "node_removed"
        if self.remove_edge:
            return "edge_removed"
        if self.change_node_semantic:
            return "node_semantic_changed"
        if self.change_edge_semantic:
            return "edge_semantic_changed"
        return "orig"


def _batched_fps(obj_pcls: list[np.ndarray], npoint: int,
                 rng: np.random.Generator, use_device: bool = True
                 ) -> list[np.ndarray]:
    """FPS every object of a scan in one padded device call (ops/fps.py)."""
    small = [p for p in obj_pcls if len(p) < npoint]
    if not use_device or len(obj_pcls) == 0:
        return [pcl_farthest_sample(p, npoint, rng=rng) for p in obj_pcls]

    out: list[np.ndarray | None] = [None] * len(obj_pcls)
    big_idx = [i for i, p in enumerate(obj_pcls) if len(p) >= npoint]
    for i, p in enumerate(obj_pcls):
        if len(p) < npoint:  # reference: random choice WITH replacement
            out[i] = p[rng.choice(len(p), npoint, replace=True)]
    if big_idx:
        try:
            from sgaligner_tpu.ops.fps import fps_sample

            n_max = max(len(obj_pcls[i]) for i in big_idx)
            pts = np.zeros((len(big_idx), n_max, 3), np.float32)
            mask = np.zeros((len(big_idx), n_max), bool)
            starts = np.zeros(len(big_idx), np.int32)
            for j, i in enumerate(big_idx):
                p = obj_pcls[i]
                pts[j, : len(p)] = p[:, :3]
                mask[j, : len(p)] = True
                starts[j] = rng.integers(0, len(p))
            sampled = np.asarray(fps_sample(pts, npoint, starts, mask))
            for j, i in enumerate(big_idx):
                out[i] = sampled[j]
        except Exception:  # no usable accelerator backend — host fallback
            for i in big_idx:
                out[i] = pcl_farthest_sample(obj_pcls[i], npoint, rng=rng)
    return out  # type: ignore[return-value]


def _hull_barycenter(pcl: np.ndarray) -> np.ndarray:
    """Convex-hull vertex mean (preprocess.py:93-96); degenerate -> plain mean."""
    try:
        hull = ConvexHull(pcl)
        return hull.points[hull.vertices].mean(axis=0)
    except (QhullError, ValueError):
        return pcl.mean(axis=0)


def process_scan(data_dir: str, rel_data: dict, obj_data: dict,
                 args: PerturbArgs, cfg: Config, rel2idx: dict[str, int],
                 rng: np.random.Generator | None = None,
                 use_device_fps: bool = True):
    """One subscan -> pkl dict (preprocess.py:40-211). Returns -1 on rejects."""
    rng = rng or np.random.default_rng()
    scan_id = rel_data["scan"]
    if len(rel_data["relationships"]) == 0:
        return -1

    ply_data = np.load(osp.join(data_dir, "scans", scan_id, "data.npy"))
    points = np.stack([ply_data["x"], ply_data["y"], ply_data["z"]]).T

    object_data = obj_data["objects"]
    if args.remove_node:
        keep = int(((100 - rng.integers(15, 41)) / 100.0) * len(object_data))
        idxs = rng.choice(len(object_data), keep, replace=False)
        object_data = [object_data[i] for i in idxs]

    change_obj_indices: np.ndarray = np.array([], int)
    orig_objects_ids: list[int] = []
    if args.change_node_semantic:
        n_change = int((rng.integers(15, 41) / 100.0) * len(object_data))
        change_obj_indices = rng.choice(len(object_data), n_change, replace=False)
        orig_objects_ids = [int(o["id"]) for o in object_data]

    objects_ids, global_objects_ids, objects_cat = [], [], []
    objects_attributes, barry_centers, obj_pcls = [], [], []
    for idx, obj in enumerate(object_data):
        attribute = [item for sublist in obj.get("attributes", {}).values()
                     for item in sublist]
        object_id = int(obj["id"])
        if args.change_node_semantic and idx in change_obj_indices:
            # The reference draws a replacement id here but never uses it for
            # the point lookup (preprocess.py:80-86, dead variable); we keep
            # the rng draws for stream-compatibility of the perturbation mode.
            swap = int(rng.choice(orig_objects_ids))
            while swap == object_id:
                swap = int(rng.choice(orig_objects_ids))
        obj_pcl = points[ply_data["objectId"] == object_id]
        if obj_pcl.shape[0] < cfg.preprocess.min_obj_points:
            continue
        barry_centers.append(_hull_barycenter(obj_pcl))
        obj_pcls.append(obj_pcl)
        objects_ids.append(object_id)
        global_objects_ids.append(int(obj["global_id"]))
        objects_cat.append(int(obj["global_id"]))
        objects_attributes.append(attribute)
    if len(objects_ids) < 2:
        return -1

    object_points = {}
    for res in cfg.preprocess.pc_resolutions:
        object_points[res] = np.array(
            _batched_fps(obj_pcls, res, rng, use_device=use_device_fps))
        # reference quirk (preprocess.py:98-100): each resolution re-samples
        # from the PREVIOUS resolution's output, not the raw cloud
        obj_pcls = list(object_points[res])

    object_id2idx = {v: i for i, v in enumerate(objects_ids)}

    relationships = list(rel_data["relationships"])
    if args.remove_edge:
        keep = int(((100 - rng.integers(15, 41)) / 100.0) * len(relationships))
        idxs = rng.choice(len(relationships), keep, replace=False)
        relationships = [relationships[i] for i in idxs]

    rel_change_indices: np.ndarray = np.array([], int)
    choose_from_rels: list[str] = []
    if args.change_edge_semantic:
        n_change = int((rng.integers(15, 41) / 100.0) * len(relationships))
        rel_change_indices = rng.choice(len(relationships), n_change, replace=False)
        choose_from_rels = [r for r in rel2idx if r not in ("none", "inside")]

    triples, pairs, edges_cat = [], [], []
    for idx, triple in enumerate(relationships):
        sub, obj = int(triple[0]), int(triple[1])
        rel_name = triple[3]
        if rel_name not in rel2idx:
            raise ValueError(f"unknown relation {rel_name!r}")
        rel_id = int(rel2idx[rel_name])
        if sub in objects_ids and obj in objects_ids:
            if args.change_edge_semantic and idx in rel_change_indices:
                new_name = rng.choice(choose_from_rels)
                while new_name == rel_name:
                    new_name = rng.choice(choose_from_rels)
                rel_name, rel_id = new_name, rel2idx[new_name]
            if rel_name == "inside":
                raise AssertionError("'inside' relation should not appear "
                                     "(preprocess.py:151-152)")
            triples.append([sub, obj, rel_id])
            edges_cat.append(rel2idx[rel_name])
            if [sub, obj] not in pairs:
                pairs.append([sub, obj])
    if len(pairs) == 0:
        return -1

    # Root object: highest out-degree over the edge id multiset (:164-167)
    all_edge_ids = np.array(pairs).flatten()
    root_obj_id = int(np.argmax(np.bincount(all_edge_ids)))
    root_obj_idx = object_id2idx[root_obj_id]
    rel_trans = np.array([np.subtract(barry_centers[root_obj_idx], c)
                          for c in barry_centers])

    # 'none'-relation completion to a dense directed edge set (:176-182)
    pair_set = {tuple(p) for p in pairs}
    for i in objects_ids:
        for j in objects_ids:
            if i == j or (i, j) in pair_set:
                continue
            triples.append([i, j, rel2idx["none"]])
            pairs.append([i, j])
            pair_set.add((i, j))
            edges_cat.append(rel2idx["none"])

    edges = np.array([[object_id2idx[s], object_id2idx[o]] for s, o in pairs],
                     dtype=np.int64)

    return {
        "scan_id": scan_id,
        "objects_id": np.array(objects_ids),
        "global_objects_id": np.array(global_objects_ids),
        "objects_cat": np.array(objects_cat),
        "triples": triples,
        "pairs": pairs,
        "edges": edges,
        "obj_points": object_points,
        "objects_count": len(objects_ids),
        "edges_count": len(edges),
        "object_id2idx": object_id2idx,
        "object_attributes": objects_attributes,
        "edges_cat": edges_cat,
        "rel_trans": rel_trans,
        "root_obj_id": root_obj_id,
    }


def make_bow_vector(sentence: list[str], word2idx: dict[str, int]) -> np.ndarray:
    vec = np.zeros(len(word2idx))
    for word in sentence:
        if word not in word2idx:
            raise ValueError(f"word {word!r} not in vocabulary")
        vec[word2idx[word]] += 1
    return vec


def calculate_bow_node_edge_feats(data_write_dir: str, rel2idx: dict[str, int]):
    """Per-object outgoing-relation BoW (preprocess.py:280-326)."""
    import os

    scan_ids = sorted(s[:-4] for s in os.listdir(osp.join(data_write_dir, "data")))
    idx2rel = {v: k for k, v in rel2idx.items()}
    word2ix = {key: i for i, key in enumerate(rel2idx)}

    for scan_id in scan_ids:
        fn = osp.join(data_write_dir, "data", f"{scan_id}.pkl")
        d = io.load_pkl_data(fn)
        names: list[list[str] | None] = [None] * len(d["objects_id"])
        for idx, edge in enumerate(d["edges"]):
            rel_name = idx2rel[d["triples"][idx][2]]
            ent = edge[0]
            names[ent] = [rel_name] if names[ent] is None else names[ent] + [rel_name]
        feats = np.stack([make_bow_vector(n or [], word2ix) for n in names])
        d["bow_vec_object_edge_feats"] = feats
        assert feats.shape[0] == d["objects_count"]
        io.write_pkl_data(d, fn)


def calculate_bow_node_attr_feats(data_write_dir: str,
                                  base_vocab: dict[str, int] | None = None):
    """Attribute BoW with split-grown vocab (preprocess.py:328-361)."""
    import os

    scan_ids = sorted(s[:-4] for s in os.listdir(osp.join(data_write_dir, "data")))
    word2ix = dict(base_vocab or {})
    for scan_id in scan_ids:
        d = io.load_pkl_data(osp.join(data_write_dir, "data", f"{scan_id}.pkl"))
        for object_attr in d["object_attributes"]:
            for attr in object_attr:
                if attr not in word2ix:
                    word2ix[attr] = len(word2ix)

    for scan_id in scan_ids:
        fn = osp.join(data_write_dir, "data", f"{scan_id}.pkl")
        d = io.load_pkl_data(fn)
        feats = np.stack([make_bow_vector(a, word2ix)
                          for a in d["object_attributes"]]) \
            if d["object_attributes"] else np.zeros((0, len(word2ix)))
        d["bow_vec_object_attr_feats"] = feats
        assert feats.shape[0] == d["objects_count"]
        io.write_pkl_data(d, fn)
    return word2ix


def process_split(cfg: Config, args: PerturbArgs, split: str,
                  rel2idx: dict[str, int], seed: int | None = None,
                  use_device_fps: bool = True) -> tuple[str, str]:
    """Full split pass (preprocess.py:213-267): process scans, rewrite anchors."""
    data_dir = (cfg.data.root_dir if cfg.scan_type == "scan"
                else cfg.data.subscan_dir)
    data_write_dir = osp.join(data_dir, "files", args.mode)
    io.ensure_dir(osp.join(data_write_dir, "data"))

    suffix = "" if cfg.scan_type == "scan" else f"_subscenes_{split}"
    rel_json = io.load_json(osp.join(
        data_dir, "files", f"relationships{suffix}.json"))["scans"]
    obj_json = io.load_json(osp.join(
        data_dir, "files", f"objects{suffix}.json"))["scans"]
    ids_fn = (f"{split}_scans.txt" if cfg.scan_type == "scan"
              else f"{split}_scans_subscenes.txt")
    subscan_ids = np.atleast_1d(np.genfromtxt(
        osp.join(data_dir, "files", ids_fn), dtype=str))

    rng = np.random.default_rng(cfg.seed if seed is None else seed)
    rel_by_scan = {r["scan"]: r for r in rel_json}
    obj_by_scan = {o["scan"]: o for o in obj_json}

    processed = []
    for scan_id in subscan_ids:
        if scan_id not in rel_by_scan or scan_id not in obj_by_scan:
            continue
        d = process_scan(data_dir, rel_by_scan[scan_id], obj_by_scan[scan_id],
                         args, cfg, rel2idx, rng=rng,
                         use_device_fps=use_device_fps)
        if isinstance(d, int):
            continue
        processed.append(scan_id)
        io.write_pkl_data(d, osp.join(data_write_dir, "data", f"{scan_id}.pkl"))

    anchor_fn = f"anchors{cfg.preprocess.anchor_type_name}_{split}.json"
    raw_anchors = io.load_json(osp.join(data_dir, "files", anchor_fn))
    kept = [a for a in raw_anchors
            if a["src"] in processed and a["ref"] in processed]
    io.write_json(kept, osp.join(data_write_dir, anchor_fn))
    np.savetxt(osp.join(data_write_dir, ids_fn), np.array(processed), fmt="%s")
    return data_dir, data_write_dir
