"""Demo: point-modality alignment directly from two raw ``data.npy`` scenes.

Covers BASELINE.json config #1 ("example_data scene_1/scene_2 pair:
point-modality-only alignment inference"): no preprocessed pkl needed — objects
are carved from the structured clouds by objectId, FPS-sampled on device, run
through a point-only MultiModalEncoder, and the cross-scene node matches +
similarity ranks are printed.

    python -m sgaligner_tpu.cli.demo_align --src .../scene_1/data.npy \
        --ref .../scene_2/data.npy [--snapshot <ckpt>] [--pc_res 512]
"""

from __future__ import annotations

import argparse
import json

import numpy as np

def objects_from_npy(path: str, pc_res: int, min_points: int,
                     rng: np.random.Generator):
    from sgaligner_tpu.utils.io import load_plydata_npy
    from sgaligner_tpu.utils.pointcloud import pcl_farthest_sample

    points, ply = load_plydata_npy(path, return_ply_data=True)
    obj_ids = []
    obj_points = []
    for oid in np.unique(ply["objectId"]):
        if oid == 0:
            continue
        pts = points[ply["objectId"] == oid]
        if len(pts) < min_points:
            continue
        obj_ids.append(int(oid))
        obj_points.append(pcl_farthest_sample(pts, pc_res, rng=rng))
    return np.array(obj_ids), np.stack(obj_points).astype(np.float32)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True, help="src scene data.npy")
    parser.add_argument("--ref", required=True, help="ref scene data.npy")
    parser.add_argument("--snapshot", default=None,
                        help="trained point-model snapshot (random init if absent)")
    parser.add_argument("--pc_res", type=int, default=512)
    parser.add_argument("--min_obj_points", type=int, default=50)
    parser.add_argument("--k", type=int, default=1)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax

    from sgaligner_tpu.align import alignment
    from sgaligner_tpu.core import checkpoint as ckpt
    from sgaligner_tpu.data.batch import BatchSpec, collate, pack_pair
    from sgaligner_tpu.models.sg_aligner import MultiModalEncoder
    from sgaligner_tpu.ops import metrics as M

    rng = np.random.default_rng(42)
    src_ids, src_pts = objects_from_npy(args.src, args.pc_res,
                                        args.min_obj_points, rng)
    ref_ids, ref_pts = objects_from_npy(args.ref, args.pc_res,
                                        args.min_obj_points, rng)
    center = src_pts.reshape(-1, 3).mean(axis=0)
    src_pts, ref_pts = src_pts - center, ref_pts - center

    n_max = 1 << int(np.ceil(np.log2(max(len(src_ids), len(ref_ids), 8))))
    spec = BatchSpec(1, n_max, args.pc_res)
    sample = pack_pair(
        spec,
        src_points=src_pts, ref_points=ref_pts,
        src_bow_rel=np.zeros((len(src_ids), spec.rel_dim), np.float32),
        ref_bow_rel=np.zeros((len(ref_ids), spec.rel_dim), np.float32),
        src_bow_attr=np.zeros((len(src_ids), spec.attr_dim), np.float32),
        ref_bow_attr=np.zeros((len(ref_ids), spec.attr_dim), np.float32),
        src_rel_pose=np.zeros((len(src_ids), 3), np.float32),
        ref_rel_pose=np.zeros((len(ref_ids), 3), np.float32),
        src_edges=np.zeros((0, 2), np.int64),
        ref_edges=np.zeros((0, 2), np.int64),
        e1i=np.zeros(0, np.int64), e2i=np.zeros(0, np.int64),
        e1j=np.arange(len(src_ids)), e2j=np.arange(len(ref_ids)),
        src_obj_ids=src_ids, ref_obj_ids=ref_ids,
    )
    batch = collate([sample])

    model = MultiModalEncoder(modules=("point",))
    if args.snapshot:
        if args.snapshot.endswith((".pth.tar", ".pth", ".tar")):
            params = ckpt.load_torch_snapshot(args.snapshot, ("point",))["params"]
        else:
            payload = ckpt.load_snapshot(args.snapshot)
            params = payload["params"].get("model", payload["params"])
    else:
        params = model.init(jax.random.key(0), batch, train=False)["params"]
        print("[WARN] no snapshot given — using random init (structure of the "
              "pipeline only; matches are meaningless)")

    embs = jax.jit(lambda p, b: model.apply({"params": p}, b, train=False))(
        params, batch)
    emb = embs["point"].reshape(1, 2 * n_max, -1)
    sim = np.asarray(M.cosine_sim_matrix(emb, batch["obj_mask"]))

    node_corrs = alignment.compute_node_corrs(sim[0], len(src_ids), n_max,
                                              k=args.k)
    pairs = alignment.get_node_corrs_objects_ids(node_corrs,
                                                 batch["obj_ids"][0])
    score = alignment.compute_alignment_score(sim[0], len(src_ids),
                                              len(ref_ids), n_max)
    print(json.dumps({
        "src_objects": len(src_ids),
        "ref_objects": len(ref_ids),
        "alignment_score": score,
        "node_matches(src_obj_id -> ref_obj_id)": pairs,
    }, default=int))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
