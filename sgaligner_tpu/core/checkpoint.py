"""Checkpoint / resume with the reference's snapshot semantics.

The reference writes per-epoch ``epoch-N.pth.tar`` (model+epoch+iteration) plus a
rolling ``snapshot.pth.tar`` that adds optimizer state
(/root/reference/src/engine/base_trainer.py:80-102), resumes from it
(epoch_based_trainer.py:179-193), and testers load strictly
(base_tester.py:57-62). Here snapshots are orbax checkpoints with the same
epoch/iteration metadata:

    <snapshot_dir>/epoch-<N>/      params (+ batch_stats) only
    <snapshot_dir>/snapshot/       + opt_state + train rng  (rolling)
    <snapshot_dir>/best_snapshot/  best-val params

`load_torch_snapshot` imports a reference ``.pth.tar`` into our parameter tree
(key mapping for MultiModalEncoder / EVA) for checkpoint-parity evaluation.
"""

from __future__ import annotations

import json
import os
import os.path as osp
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp


def _meta_path(d: str) -> str:
    return osp.join(d, "meta.json")


def save_snapshot(
    snapshot_dir: str,
    name: str,
    params,
    batch_stats=None,
    opt_state=None,
    rng=None,
    epoch: int = 0,
    iteration: int = 0,
) -> str:
    """Write one snapshot (atomically replacing an existing one of that name)."""
    path = osp.join(osp.abspath(snapshot_dir), name)
    if osp.exists(path):
        shutil.rmtree(path)
    payload = {"params": params}
    if batch_stats:
        payload["batch_stats"] = batch_stats
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if rng is not None:
        payload["rng"] = rng
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload)
    with open(_meta_path(path), "w") as f:
        json.dump({"epoch": epoch, "iteration": iteration,
                   "keys": sorted(payload.keys())}, f)
    return path


def load_snapshot(path: str, target=None) -> dict:
    """Load a snapshot; returns {'params', 'batch_stats'?, 'opt_state'?, 'rng'?,
    'epoch', 'iteration'}. ``target`` (same-structure pytree of arrays) enables
    strict structure checking like the testers' strict load."""
    path = osp.abspath(path)
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        if target is not None:
            payload = ckptr.restore(path, target)
        else:
            payload = ckptr.restore(path)
    payload = dict(payload)
    payload["epoch"] = meta["epoch"]
    payload["iteration"] = meta["iteration"]
    return payload


def latest_snapshot(snapshot_dir: str) -> str | None:
    rolling = osp.join(snapshot_dir, "snapshot")
    if osp.isdir(rolling):
        return rolling
    epochs = [d for d in os.listdir(snapshot_dir) if d.startswith("epoch-")] \
        if osp.isdir(snapshot_dir) else []
    if not epochs:
        return None
    best = max(epochs, key=lambda d: int(d.split("-")[1]))
    return osp.join(snapshot_dir, best)


# ---------------------------------------------------------------------------
# Torch checkpoint import (reference .pth.tar -> our param tree)
# ---------------------------------------------------------------------------

def _strip_module_prefix(state_dict: dict) -> dict:
    """DDP 'module.' prefix handling (base_trainer.py:110-121)."""
    return {k.removeprefix("module."): v for k, v in state_dict.items()}


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def torch_state_dict_to_params(state_dict: dict, modules: tuple[str, ...],
                               heads: tuple[int, ...] = (2, 2)
                               ) -> tuple[dict, dict]:
    """Map a reference MultiModalEncoder state_dict to our flax param tree.

    Key correspondences (reference sg_aligner.py:54-69):
      object_encoder.conv{1,2,3}.{weight,bias}  -> object_encoder/conv{i}/{kernel,bias}
         (torch Conv1d k=1 weight [out,in,1] -> Dense kernel [in,out])
      object_embedding / structure_embedding / meta_embedding_{rel,attr}
         (torch Linear weight [out,in] -> Dense kernel [in,out])
      structure_encoder.layer_stack.{i}.{lin_src.weight,att_src,att_dst,bias}
         (PyG GATConv: lin weight [H*out,in] -> [in,H,out]; att [1,H,out] -> [H,out])
      fusion.weight -> fusion/weight
    BatchNorm running stats of the parity-mode PointNet are ignored (their
    outputs are discarded upstream, pointnet.py:141-159).
    """
    sd = _strip_module_prefix(state_dict)
    params: dict = {}

    def dense_from_linear(prefix_t: str):
        w = _t(sd[f"{prefix_t}.weight"]).T  # [in, out]
        out = {"kernel": w}
        if f"{prefix_t}.bias" in sd:
            out["bias"] = _t(sd[f"{prefix_t}.bias"])
        return out

    batch_stats: dict = {}

    def conv1d_kernel(key):  # torch Conv1d k=1 weight [out, in, 1] -> [in, out]
        return _t(sd[key])[:, :, 0].T

    def bn_into(params_dst: dict, stats_dst: dict, prefix_t: str, name: str):
        """torch BatchNorm1d -> MaskedBatchNorm params + batch_stats."""
        params_dst[name] = {"scale": _t(sd[f"{prefix_t}.weight"]),
                            "bias": _t(sd[f"{prefix_t}.bias"])}
        stats_dst[name] = {"mean": _t(sd[f"{prefix_t}.running_mean"]),
                           "var": _t(sd[f"{prefix_t}.running_var"])}

    if "point" in modules:
        enc = {}
        for i in (1, 2, 3):
            key = f"object_encoder.conv{i}.weight"
            if key in sd:
                layer = {"kernel": conv1d_kernel(key)}
                bkey = f"object_encoder.conv{i}.bias"
                if bkey in sd:
                    layer["bias"] = _t(sd[bkey])
                enc[f"conv{i}"] = layer
        if enc:
            params["object_encoder"] = enc
    elif "pct" in modules and "object_encoder.embedding.conv1.weight" in sd:
        # NaivePCT (reference pct.py:275-317) -> models/pct.py tree
        enc: dict = {}
        enc_bs: dict = {}
        for i in (1, 2):
            enc[f"emb{i-1}"] = {
                "kernel": conv1d_kernel(f"object_encoder.embedding.conv{i}.weight")}
            bn_into(enc, enc_bs, f"object_encoder.embedding.bn{i}",
                    f"emb{i-1}_bn")
        for s in (1, 2, 3, 4):
            p = f"object_encoder.sa{s}"
            sa = {
                # q and k share one weight upstream (pct.py:199)
                "qk": {"kernel": conv1d_kernel(f"{p}.q_conv.weight")},
                "v": {"kernel": conv1d_kernel(f"{p}.v_conv.weight"),
                      "bias": _t(sd[f"{p}.v_conv.bias"])},
                "trans": {"kernel": conv1d_kernel(f"{p}.trans_conv.weight"),
                          "bias": _t(sd[f"{p}.trans_conv.bias"])},
            }
            sa_bs: dict = {}
            bn_into(sa, sa_bs, f"{p}.after_norm", "after_norm")
            enc[f"sa{s}"] = sa
            enc_bs[f"sa{s}"] = sa_bs
        # nn.Sequential(conv1d, BN, leaky_relu) -> "linear" + "linear_bn"
        enc["linear"] = {"kernel": conv1d_kernel("object_encoder.linear.0.weight")}
        bn_into(enc, enc_bs, "object_encoder.linear.1", "linear_bn")
        enc["linear1"] = {"kernel": _t(sd["object_encoder.linear1.weight"]).T}
        bn_into(enc, enc_bs, "object_encoder.bn1", "bn1")
        enc["linear2"] = dense_from_linear("object_encoder.linear2")
        bn_into(enc, enc_bs, "object_encoder.bn2", "bn2")
        params["object_encoder"] = enc
        batch_stats["object_encoder"] = enc_bs

    if ("point" in modules or "pct" in modules) and \
            "object_embedding.weight" in sd:
        params["object_embedding"] = dense_from_linear("object_embedding")

    if "gat" in modules or "gcn" in modules:
        se = {}
        i = 0
        while f"structure_encoder.layer_stack.{i}.att_src" in sd or \
              f"structure_encoder.layer_stack.{i}.lin.weight" in sd or \
              f"structure_encoder.layer_stack.{i}.lin_src.weight" in sd or \
              f"structure_encoder.layer_stack.{i}.weight" in sd:
            p = f"structure_encoder.layer_stack.{i}"
            layer = {}
            if f"{p}.att_src" in sd:  # GATConv
                h = heads[i] if i < len(heads) else heads[-1]
                for lin_name in ("lin", "lin_src"):  # PyG version differences
                    wkey = f"{p}.{lin_name}.weight"
                    if wkey in sd:
                        w = _t(sd[wkey])  # [H*out, in]
                        din = w.shape[1]
                        dout = w.shape[0] // h
                        layer["weight"] = w.reshape(h, dout, din).transpose(2, 0, 1)
                        break
                layer["att_src"] = _t(sd[f"{p}.att_src"]).reshape(h, -1)
                layer["att_dst"] = _t(sd[f"{p}.att_dst"]).reshape(h, -1)
                if f"{p}.bias" in sd:
                    layer["bias"] = _t(sd[f"{p}.bias"])
                se[f"gat{i}"] = layer
            else:  # GCNConv
                for lin_name in ("lin.weight", "weight"):
                    wkey = f"{p}.{lin_name}"
                    if wkey in sd:
                        layer["weight"] = _t(sd[wkey]).T
                        break
                if f"{p}.bias" in sd:
                    layer["bias"] = _t(sd[f"{p}.bias"])
                se[f"gcn{i}"] = layer
            i += 1
        if se:
            params["structure_encoder"] = se
        if "structure_embedding.weight" in sd:
            params["structure_embedding"] = dense_from_linear("structure_embedding")

    if "rel" in modules and "meta_embedding_rel.weight" in sd:
        params["meta_embedding_rel"] = dense_from_linear("meta_embedding_rel")
    if "attr" in modules and "meta_embedding_attr.weight" in sd:
        params["meta_embedding_attr"] = dense_from_linear("meta_embedding_attr")
    if "fusion.weight" in sd:
        params["fusion"] = {"weight": _t(sd["fusion.weight"])}

    return (jax.tree.map(np.asarray, params),
            jax.tree.map(np.asarray, batch_stats))


def load_torch_snapshot(path: str, modules: tuple[str, ...],
                        heads: tuple[int, ...] = (2, 2)) -> dict:
    """Load a reference .pth.tar and return (params_tree, metadata)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = blob.get("model", blob.get("state_dict", blob))
    params, batch_stats = torch_state_dict_to_params(state_dict, modules, heads)
    meta = {"epoch": int(blob.get("epoch", 0)),
            "iteration": int(blob.get("iteration", 0))}
    return {"params": params, "batch_stats": batch_stats, **meta}
