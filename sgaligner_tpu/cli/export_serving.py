"""Export a deployable serving artifact from a trained snapshot.

The reference ships no deployment path — inference re-builds the torch model
from YAML + checkpoint every run. This entry point freezes the serving
program (``engine/train_step.py::make_serving_step``) + trained state into
one artifact directory via ``jax.export`` (see ``sgaligner_tpu/serving.py``);
a serving host then needs only jax and the directory:

    python -m sgaligner_tpu.cli.export_serving \
        --config configs/scan3r/scan3r_ground_truth.yaml \
        --snapshot snapshots/epoch-10 --out artifact/ \
        --batch 128 --pooled_bucket 2048 --platform tpu

Torch ``.pth.tar`` snapshots import transparently (core/checkpoint.py) —
a reference-trained model can be frozen into a TPU serving artifact.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--snapshot", required=True,
                        help="orbax snapshot dir or torch .pth.tar")
    parser.add_argument("--out", required=True, help="artifact directory")
    parser.add_argument("--batch", type=int, default=128,
                        help="pairs per serving batch (pinned)")
    parser.add_argument("--pooled_bucket", type=int, default=0,
                        help="pinned pooled point axis K; 0 = dense bound")
    parser.add_argument("--queue", type=int, default=1,
                        help="export the device-side batch-queue program "
                             "scanning this many stacked batches per call")
    parser.add_argument("--platform", default="tpu",
                        choices=["tpu", "cpu"])
    parser.add_argument("--with_sim", action="store_true",
                        help="artifact also returns per-pair sim matrices")
    parser.add_argument("--points_dtype", default="",
                        help="pin the point-cloud input dtype, e.g. "
                             "bfloat16 to halve serving input bandwidth")
    parser.add_argument("--output_root", default=None)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)

    from sgaligner_tpu.core import checkpoint as ckpt
    from sgaligner_tpu.core.config import make_cfg, update_config
    from sgaligner_tpu.serving import export_serving_artifact

    cfg = update_config(make_cfg(), args.config, output_root=args.output_root)

    if args.snapshot.endswith((".pth.tar", ".pth", ".tar")):
        payload = ckpt.load_torch_snapshot(args.snapshot, tuple(cfg.modules),
                                           tuple(cfg.model.heads))
    else:
        payload = ckpt.load_snapshot(args.snapshot)
    params = payload["params"]
    params = params.get("model", params)
    batch_stats = payload.get("batch_stats", {}) or {}

    out = export_serving_artifact(
        cfg, params, batch_stats, args.out,
        batch_size=args.batch,
        pooled_bucket=args.pooled_bucket or None,
        queue=args.queue,
        platforms=(args.platform,),
        with_sim=args.with_sim,
        points_dtype=args.points_dtype)
    print(json.dumps({"artifact": out, "batch_size": args.batch,
                      "queue": args.queue, "platform": args.platform}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
