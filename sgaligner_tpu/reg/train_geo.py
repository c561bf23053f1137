"""Self-contained trainer for the learned registration model (geo_model.py).

Trains on synthetic partial-overlap rigid pairs (reg/synthetic_pairs.py) —
no external dataset/checkpoint, unlike the reference's GeoTransformer whose
3DMatch checkpoint must be downloaded (registration_evaluator.py:24-27).

Loss: SuperGlue-style negative log-likelihood over the Sinkhorn assignments
at BOTH levels — gt superpoint pairs (mutual-nearest under the gt transform
within ``match_radius``) are pulled up and unmatched real superpoints are
supervised into the dustbin (``matching_loss``); inside each gt-matched
patch pair, gt POINT pairs (mutual-nearest within ``fine_radius``) supervise
the fine per-point features the same way (``fine_matching_loss``). The
backend (reg/learned.py) pools the dense fine correspondences into a RANSAC
fit and lets ICP recover the last few millimeters.

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


def gt_fine_matches(src_abs, ref_abs, src_pmask, ref_pmask, pairs,
                    gt, radius: float, fine_k: int):
    """Point-level gt targets inside matched patches (host numpy).

    For the first ``fine_k`` gt superpoint pairs, finds mutual-nearest point
    pairs (under gt, within ``radius``) between the two patches' ABSOLUTE
    points. Returns (fine_pairs [F,2] int32, fine_valid [F] bool,
    fine_tgt [F,M] int32 with -1 = unmatched src point,
    fine_ref_un [F,M] bool = valid-but-unmatched ref points)."""
    m = src_abs.shape[1]
    f = fine_k
    fine_pairs = np.zeros((f, 2), np.int32)
    fine_valid = np.zeros((f,), bool)
    fine_tgt = np.full((f, m), -1, np.int32)
    fine_ref_un = np.zeros((f, m), bool)
    for k in range(min(len(pairs), f)):
        i, j = int(pairs[k, 0]), int(pairs[k, 1])
        sw = src_abs[i] @ gt[:3, :3].T + gt[:3, 3]
        d = np.linalg.norm(sw[:, None, :] - ref_abs[j][None, :, :], axis=-1)
        d = np.where(src_pmask[i][:, None] & ref_pmask[j][None, :], d, np.inf)
        i_sr = d.argmin(axis=1)
        i_rs = d.argmin(axis=0)
        mutual = (i_rs[i_sr] == np.arange(m)) & src_pmask[i]
        near = d[np.arange(m), i_sr] < radius
        sel = mutual & near
        fine_pairs[k] = (i, j)
        fine_valid[k] = True
        fine_tgt[k] = np.where(sel, i_sr, -1)
        ru = ref_pmask[j].copy()
        ru[i_sr[sel]] = False
        fine_ref_un[k] = ru
    return fine_pairs, fine_valid, fine_tgt, fine_ref_un


_REAL_CLOUD_CACHE: dict = {}


def _get_real_cloud(path: str):
    if path not in _REAL_CLOUD_CACHE:
        from sgaligner_tpu.utils.io import load_plydata_npy

        _REAL_CLOUD_CACHE[path] = load_plydata_npy(path)
    return _REAL_CLOUD_CACHE[path]


def _prep_training_pair(rng, cfg_prep):
    from sgaligner_tpu.reg.learned import _prep_cloud

    ov = cfg_prep["overlap"]
    if isinstance(ov, (tuple, list)):          # curriculum: sample per pair
        ov = float(rng.uniform(ov[0], ov[1]))
    real = cfg_prep.get("real_cloud")
    if real and rng.random() < cfg_prep.get("real_frac", 0.0):
        # real-geometry family: crops of a PROVIDED scan via the same
        # protocol the real-scan evaluation uses (evaluate_cloud) —
        # independently-subsampled views + sensor noise. The deployment
        # domain (e.g. example_data scene_2) must stay held out; train on
        # a DIFFERENT scan (scene_1).
        from sgaligner_tpu.reg.synthetic_pairs import make_pair_from_cloud

        src_pts, ref_pts, gt = make_pair_from_cloud(
            rng, _get_real_cloud(real), overlap=ov, noise=0.005,
            max_angle_deg=cfg_prep["max_angle_deg"],
            max_trans=cfg_prep["max_trans"])
    else:
        src_pts, ref_pts, gt = make_pair(
            rng, n_points=cfg_prep["n_points"], overlap=ov,
            max_angle_deg=cfg_prep["max_angle_deg"],
            max_trans=cfg_prep["max_trans"],
            kind=cfg_prep.get("scene_kind", "patches"))
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
    src_abs = src["patch"] + src["sp"][:, None, :]
    ref_abs = ref["patch"] + ref["sp"][:, None, :]
    fp, fv, ft, fru = gt_fine_matches(
        src_abs, ref_abs, src["pmask"], ref["pmask"], pairs, gt,
        cfg_prep["fine_radius"], cfg_prep["fine_k"])
    return {
        "fine_pairs": fp, "fine_valid": fv, "fine_tgt": ft,
        "fine_ref_un": fru,
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


def fine_matching_loss(out, batch, iters: int = 20):
    """NLL of the point-level Sinkhorn inside gt-matched patches.

    Supervises the fine features (geo_model fine head): gt point pairs pulled
    up, unmatched valid points on both sides pushed into the dustbin — the
    same SuperGlue scheme as the coarse loss, one level down."""
    import jax.numpy as jnp

    from sgaligner_tpu.reg.geo_model import fine_log_assign

    fla = fine_log_assign(out["src_pf"], out["ref_pf"],
                          batch["src_pmask"], batch["ref_pmask"],
                          batch["fine_pairs"], out["fine_temp"],
                          out["fine_alpha"], iters)          # [F, M+1, M+1]
    f, mp1, _ = fla.shape
    m = mp1 - 1
    tgt = batch["fine_tgt"]                                  # [F, M]
    matched = (tgt >= 0) & batch["fine_valid"][:, None]
    tgt_safe = jnp.where(matched, tgt, 0)
    rows = jnp.take_along_axis(fla[:, :m, :], tgt_safe[..., None],
                               axis=2)[..., 0]               # [F, M]
    w = matched.astype(fla.dtype)
    nll_pairs = -(rows * w).sum() / jnp.maximum(w.sum(), 1.0)
    # dustbins: valid-but-unmatched src rows / ref cols of each gt pair
    i_idx = batch["fine_pairs"][:, 0]
    src_un = (batch["src_pmask"][i_idx] & ~matched
              & batch["fine_valid"][:, None]).astype(fla.dtype)
    ref_un = (batch["fine_ref_un"]
              & batch["fine_valid"][:, None]).astype(fla.dtype)
    nll_dust = (-(fla[:, :m, m] * src_un).sum()
                / jnp.maximum(src_un.sum(), 1.0)
                - (fla[:, m, :m] * ref_un).sum()
                / jnp.maximum(ref_un.sum(), 1.0))
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
        return matching_loss(out, batch) + fine_matching_loss(out, batch)

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
          dataset_pairs: int = 0, dataset_cache: str | None = None,
          init_from: str | None = None, scene_kind: str = "patches",
          real_cloud: str | None = None, real_frac: float = 0.0,
          verbose: bool = True):
    """``dataset_pairs > 0`` pregenerates that many pair-preps ONCE and trains
    epochs over them (host synthesis at ~0.2 s/pair would otherwise dominate
    every step on a 1-CPU host; a 2k-pair dataset costs ~7 min up front and
    leaves the step device-bound). ``dataset_pairs=0`` streams fresh pairs.
    ``dataset_cache`` persists/reuses the generated dataset as an .npz."""
    import jax
    import optax

    prep = {"n_super": n_super, "patch_m": patch_m, "n_points": n_points,
            "overlap": overlap, "voxel_size": voxel_size,
            "max_points": 8192, "match_radius": 3.0 * voxel_size,
            "fine_radius": 1.5 * voxel_size, "fine_k": min(n_super, 32),
            "max_angle_deg": max_angle_deg, "max_trans": max_trans,
            "scene_kind": scene_kind,
            "real_cloud": real_cloud, "real_frac": real_frac}
    rng = np.random.default_rng(seed)
    model = GeoRegModel(cfg)
    b0, _ = _prep_training_pair(rng, prep)
    params = model.init(jax.random.key(seed),
                        b0["src_sp"], b0["ref_sp"],
                        b0["src_inv"], b0["ref_inv"],
                        b0["src_eig"], b0["ref_eig"],
                        b0["src_pmask"], b0["ref_pmask"],
                        b0["src_mask"], b0["ref_mask"])["params"]
    if init_from:
        # fine-tune: warm-start from an existing checkpoint (curriculum
        # extension runs); the optimizer state starts fresh
        params = load_checkpoint(init_from)
        if verbose:
            print(f"init from {init_from}", flush=True)
    # clipping is essential: unclipped adam at 1e-3 oscillates and never
    # escapes the uniform-assignment plateau (measured)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = tx.init(params)
    step = make_train_step(model, tx)

    losses = []
    if dataset_pairs > 0:
        import os
        import time

        if dataset_cache and os.path.exists(dataset_cache):
            with np.load(dataset_cache) as z:
                data = {k: z[k] for k in z.files}
            n_cached = len(data["src_sp"])
            if n_cached < dataset_pairs:
                raise ValueError(f"cache has {n_cached} < {dataset_pairs}")
            if verbose:
                print(f"dataset: {n_cached} cached pairs "
                      f"({dataset_cache})", flush=True)
        else:
            t0 = time.perf_counter()
            samples = []
            for i in range(dataset_pairs):
                r = np.random.default_rng((seed, i))
                samples.append(_prep_training_pair(r, prep)[0])
                if verbose and (i + 1) % 256 == 0:
                    print(f"dataset {i + 1}/{dataset_pairs} pairs "
                          f"({time.perf_counter() - t0:.0f}s)", flush=True)
            data = {k: np.stack([s[k] for s in samples])
                    for k in samples[0]}
            del samples
            if dataset_cache:
                np.savez(dataset_cache, **data)
        for i in range(steps):
            sel = rng.choice(dataset_pairs, batch_pairs,
                             replace=dataset_pairs < batch_pairs)
            batch = {k: v[sel] for k, v in data.items()}
            params, opt_state, loss = step(params, opt_state, batch)
            losses.append(float(loss))
            if verbose and (i % log_every == 0 or i == steps - 1):
                print(f"step {i:5d}  loss "
                      f"{np.mean(losses[-log_every:]):.4f}", flush=True)
            if out_dir and (i + 1) % 1000 == 0 and i + 1 < steps:
                save_checkpoint(out_dir, params, prep, cfg)
                if verbose:
                    print(f"checkpoint @ step {i + 1} -> {out_dir}",
                          flush=True)
    else:
        # streaming: overlap host synthesis with the update via a
        # thread-pool prefetch queue
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
    """Device-agnostic restore: orbax pins the SAVING devices in its sharding
    metadata, so a checkpoint written on the TPU would refuse to restore on a
    CPU-only process — rebuild the target from shape/dtype metadata on the
    current default device instead."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(out_dir, "geo_params"))
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.metadata(path).item_metadata
        target = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding), tree)
        return ckptr.restore(path, target)


def main(argv=None):
    import argparse

    from sgaligner_tpu.core.platform import honor_jax_platforms_env

    honor_jax_platforms_env()

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", type=str, default="runs/geo_reg")
    ap.add_argument("--n_super", type=int, default=64)
    ap.add_argument("--patch_m", type=int, default=24)
    ap.add_argument("--n_points", type=int, default=2048,
                    help="points per synthetic crop — match the DENSITY of "
                         "the deployment scans (real example scans land at "
                         "~4-8k points after the 5 cm voxel grid)")
    ap.add_argument("--batch_pairs", type=int, default=8)
    ap.add_argument("--overlap_lo", type=float, default=0.2)
    ap.add_argument("--overlap_hi", type=float, default=0.8)
    ap.add_argument("--dataset_pairs", type=int, default=2048)
    ap.add_argument("--dataset_cache", type=str, default=None)
    ap.add_argument("--init_from", type=str, default=None,
                    help="warm-start from an existing checkpoint dir "
                         "(fine-tune / curriculum extension)")
    ap.add_argument("--scene_kind", type=str, default="patches",
                    choices=["patches", "room", "mix", "patches+rough", "room+rough", "mix+rough"],
                    help="synthetic scene family (room = planar indoor "
                         "scenes matching real-scan hardness); a '+rough' "
                         "suffix adds real-reconstruction degradations "
                         "(bumps/holes/density, reg/synthetic_pairs.py)")
    ap.add_argument("--real_cloud", type=str, default=None,
                    help="structured data.npy scan: mix real-geometry crop "
                         "pairs of this cloud into training at --real_frac "
                         "(keep the evaluation scan held out)")
    ap.add_argument("--real_frac", type=float, default=0.0)
    args = ap.parse_args(argv)
    train(steps=args.steps, seed=args.seed, lr=args.lr, out_dir=args.out,
          n_super=args.n_super, patch_m=args.patch_m, n_points=args.n_points,
          batch_pairs=args.batch_pairs,
          dataset_pairs=args.dataset_pairs, dataset_cache=args.dataset_cache,
          init_from=args.init_from, scene_kind=args.scene_kind,
          real_cloud=args.real_cloud, real_frac=args.real_frac,
          overlap=(args.overlap_lo, args.overlap_hi))


if __name__ == "__main__":
    main()
