"""Train/val entry point for the EVA baseline.

CLI-compatible with /root/reference/src/trainers/trainval_eva.py: same flags as
trainval_sgaligner; the model/loss switch (EVA + OverallNCALoss) is driven by
``model_name: 'eva'`` in the config, as in the reference wiring.
"""

from __future__ import annotations

from sgaligner_tpu.cli.trainval_sgaligner import main as _main


def main(argv=None) -> int:
    return _main(argv)


if __name__ == "__main__":
    raise SystemExit(main())
