"""Self-contained trainer for the learned registration model (geo_model.py).

Trains on synthetic partial-overlap rigid pairs (reg/synthetic_pairs.py) —
no external dataset/checkpoint, unlike the reference's GeoTransformer whose
3DMatch checkpoint must be downloaded (registration_evaluator.py:24-27).

Loss: SuperGlue-style negative log-likelihood over the Sinkhorn assignment —
gt superpoint pairs (mutual-nearest under the gt transform within
``match_radius``) are pulled up, unmatched real superpoints are supervised
into the dustbin. Point-level precision is NOT learned: the backend
(reg/learned.py) fits a coarse transform from the matched superpoint CENTERS
and lets ICP recover voxel-level accuracy, so only the global association
needs supervision.

CLI: ``python -m sgaligner_tpu.reg.train_geo --steps 2000 --out runs/geo``
(also scripts/train_registration.sh). The checkpoint directory is consumed by
``reg/learned.py::LearnedBackend(checkpoint=...)`` /
``reg_model.backend: learned``. ``--overlap_lo/hi`` set the curriculum range.
"""

from __future__ import annotations

import os
from functools import partial

import numpy as np

from sgaligner_tpu.reg.geo_model import GeoModelConfig, GeoRegModel
from sgaligner_tpu.reg.synthetic_pairs import make_pair


def gt_superpoint_matches(src_sp, ref_sp, src_mask, ref_mask, gt,
                          match_radius: float):
    """Mutual-nearest superpoint pairs under gt (host numpy).

    Returns (pairs [K, 2] int32, src_unmatched [S] bool, ref_unmatched [S])."""
    s_w = src_sp @ gt[:3, :3].T + gt[:3, 3]
    d = np.linalg.norm(s_w[:, None, :] - ref_sp[None, :, :], axis=-1)
    d = np.where(src_mask[:, None] & ref_mask[None, :], d, np.inf)
    i_sr = d.argmin(axis=1)
    i_rs = d.argmin(axis=0)
    mutual = (i_rs[i_sr] == np.arange(len(src_sp))) & src_mask
    near = d[np.arange(len(src_sp)), i_sr] < match_radius
    sel = mutual & near
    pairs = np.stack([np.flatnonzero(sel), i_sr[sel]], axis=1).astype(np.int32)
    src_un = src_mask & ~sel
    ref_un = ref_mask.copy()
    ref_un[pairs[:, 1]] = False
    return pairs, src_un, ref_un


def _prep_training_pair(rng, cfg_prep):
    from sgaligner_tpu.reg.learned import _prep_cloud

    ov = cfg_prep["overlap"]
    if isinstance(ov, (tuple, list)):          # curriculum: sample per pair
        ov = float(rng.uniform(ov[0], ov[1]))
    src_pts, ref_pts, gt = make_pair(
        rng, n_points=cfg_prep["n_points"], overlap=ov,
        max_angle_deg=cfg_prep["max_angle_deg"],
        max_trans=cfg_prep["max_trans"])
    src = _prep_cloud(src_pts, cfg_prep["n_super"], cfg_prep["patch_m"],
                      cfg_prep["voxel_size"], cfg_prep["max_points"], rng)
    ref = _prep_cloud(ref_pts, cfg_prep["n_super"], cfg_prep["patch_m"],
                      cfg_prep["voxel_size"], cfg_prep["max_points"], rng)
    s = cfg_prep["n_super"]
    pairs, src_un, ref_un = gt_superpoint_matches(
        src["sp"], ref["sp"], src["mask"], ref["mask"], gt,
        cfg_prep["match_radius"])
    # pad gt pairs to a static count
    kmax = s
    pmat = np.zeros((kmax, 2), np.int32)
    pvalid = np.zeros((kmax,), bool)
    k = min(len(pairs), kmax)
    pmat[:k] = pairs[:k]
    pvalid[:k] = True
    return {
        "src_sp": src["sp"], "ref_sp": ref["sp"],
        "src_inv": src["inv"], "ref_inv": ref["inv"],
        "src_eig": src["eig"], "ref_eig": ref["eig"],
        "src_pmask": src["pmask"], "ref_pmask": ref["pmask"],
        "src_mask": src["mask"], "ref_mask": ref["mask"],
        "gt_pairs": pmat, "gt_valid": pvalid,
        "src_unmatched": src_un, "ref_unmatched": ref_un,
        "gt": gt.astype(np.float32),
    }, (src_pts, ref_pts, gt)


def matching_loss(out, batch):
    """NLL of the Sinkhorn assignment at gt matches + dustbin supervision."""
    import jax.numpy as jnp

    la = out["log_assign"]                                   # [S+1, S+1]
    s = la.shape[0] - 1
    pi, pj = batch["gt_pairs"][:, 0], batch["gt_pairs"][:, 1]
    pv = batch["gt_valid"].astype(la.dtype)
    nll_pairs = -(la[pi, pj] * pv).sum() / jnp.maximum(pv.sum(), 1.0)
    su = batch["src_unmatched"].astype(la.dtype)
    ru = batch["ref_unmatched"].astype(la.dtype)
    nll_dust = (-(la[:s, s] * su).sum() / jnp.maximum(su.sum(), 1.0)
                - (la[s, :s] * ru).sum() / jnp.maximum(ru.sum(), 1.0))
    return nll_pairs + 0.5 * nll_dust


def make_train_step(model, tx):
    """Jitted step over a BATCH of pairs (leading axis on every field,
    vmapped model+loss; the mean-NLL gradient is far less noisy than the
    pair-at-a-time step this replaced)."""
    import jax

    def pair_loss(params, batch):
        out = model.apply({"params": params},
                          batch["src_sp"], batch["ref_sp"],
                          batch["src_inv"], batch["ref_inv"],
                          batch["src_eig"], batch["ref_eig"],
                          batch["src_pmask"], batch["ref_pmask"],
                          batch["src_mask"], batch["ref_mask"])
        return matching_loss(out, batch)

    def loss_fn(params, batch):
        losses = jax.vmap(partial(pair_loss, params))(batch)
        return losses.mean()

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def _stack_batch(rng, prep, b):
    samples = [_prep_training_pair(rng, prep)[0] for _ in range(b)]
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def train(steps: int = 1000, seed: int = 0, lr: float = 3e-4,
          out_dir: str | None = None, log_every: int = 50,
          cfg: GeoModelConfig = GeoModelConfig(), n_super: int = 64,
          patch_m: int = 24, n_points: int = 2048, overlap: float = 0.6,
          voxel_size: float = 0.05, max_angle_deg: float = 360.0,
          max_trans: float = 1.0, batch_pairs: int = 8,
          verbose: bool = True):
    import jax
    import optax

    prep = {"n_super": n_super, "patch_m": patch_m, "n_points": n_points,
            "overlap": overlap, "voxel_size": voxel_size,
            "max_points": 8192, "match_radius": 3.0 * voxel_size,
            "max_angle_deg": max_angle_deg, "max_trans": max_trans}
    rng = np.random.default_rng(seed)
    model = GeoRegModel(cfg)
    b0, _ = _prep_training_pair(rng, prep)
    params = model.init(jax.random.key(seed),
                        b0["src_sp"], b0["ref_sp"],
                        b0["src_inv"], b0["ref_inv"],
                        b0["src_eig"], b0["ref_eig"],
                        b0["src_pmask"], b0["ref_pmask"],
                        b0["src_mask"], b0["ref_mask"])["params"]
    # clipping is essential: unclipped adam at 1e-3 oscillates and never
    # escapes the uniform-assignment plateau (measured)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    losses = []
    # host-side pair synthesis dominates the step (~0.4 s/pair); overlap it
    # with the update via a thread-pool prefetch queue
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(4) as pool:
        def submit(i):
            r = np.random.default_rng((seed, i))
            return pool.submit(_stack_batch, r, prep, batch_pairs)

        depth = 4
        futures = [submit(i) for i in range(min(depth, steps))]
        for i in range(steps):
            batch = futures[i].result()
            futures[i] = None
            if i + depth < steps:
                futures.append(submit(i + depth))
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
            if verbose and (i % log_every == 0 or i == steps - 1):
                print(f"step {i:5d}  loss "
                      f"{np.mean(losses[-log_every:]):.4f}", flush=True)

    if out_dir:
        save_checkpoint(out_dir, params, prep, cfg)
    return params, losses, prep


def save_checkpoint(out_dir: str, params, prep: dict, cfg: GeoModelConfig):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(out_dir, "geo_params"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)
    import json

    meta = {"prep": prep, "cfg": cfg.__dict__}
    with open(os.path.join(out_dir, "geo_meta.json"), "w") as f:
        json.dump(meta, f)


def load_checkpoint(out_dir: str):
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(out_dir, "geo_params"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", type=str, default="runs/geo_reg")
    ap.add_argument("--n_super", type=int, default=64)
    ap.add_argument("--patch_m", type=int, default=24)
    ap.add_argument("--overlap_lo", type=float, default=0.35)
    ap.add_argument("--overlap_hi", type=float, default=0.8)
    args = ap.parse_args(argv)
    train(steps=args.steps, seed=args.seed, lr=args.lr, out_dir=args.out,
          n_super=args.n_super, patch_m=args.patch_m,
          overlap=(args.overlap_lo, args.overlap_hi))


if __name__ == "__main__":
    main()
