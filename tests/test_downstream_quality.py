"""Regression test for the overlapper + mosaicking QUALITY tables.

VERDICT r4 item 5: the two downstream tasks (overlap detection,
inference_find_overlapper.py:75-82; mosaicking, utils/registration.py:131-143)
had smoke coverage but no pinned quality level. scripts/downstream_quality.py
produces both tables on the tracked aligner benchmark (val workspace of
scripts/aligner_artifact.py extended with equal-count non-overlap pairs, the
reference overlapper fileset recipe gen_all_pairs_fileset.py:12-53) and pins
them in checkpoints/aligner_full/downstream.json; this test regenerates the
SAME workspace and re-runs both real CLIs against the tracked snapshot,
asserting every metric within tolerance of the pin plus absolute floors.

Marked slow: the registration-score overlapper runs the learned backend over
all val pairs. Skipped unless the tracked downstream.json exists.
"""

from __future__ import annotations

import importlib.util
import json
import os.path as osp

import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
PIN = osp.join(REPO, "checkpoints", "aligner_full", "downstream.json")
SNAPSHOT = osp.join(REPO, "checkpoints", "aligner_full")

_spec = importlib.util.spec_from_file_location(
    "downstream_quality", osp.join(REPO, "scripts", "downstream_quality.py"))
dq = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(dq)

pytestmark = pytest.mark.skipif(
    not osp.exists(PIN), reason="tracked downstream.json not present")

TOL = 0.05  # pooled P/R/F1 over 64 pairs: one flipped pair moves ~0.016


@pytest.fixture(scope="module")
def pinned():
    with open(PIN) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def measured(tmp_path_factory, pinned):
    """Regenerate the contract workspace and re-run both CLIs."""
    c = pinned["contract"]
    assert c["val_seed"] == dq.artifact.VAL_SEED
    assert c["n_val_pairs"] == dq.artifact.N_VAL_PAIRS
    workdir = str(tmp_path_factory.mktemp("downstream"))
    rc = dq.main(["--workdir", workdir, "--snapshot", SNAPSHOT,
                  "--max_scans", str(c["max_scans"]), "--skip_copy"])
    assert rc == 0
    with open(osp.join(workdir, "downstream.json")) as f:
        return json.load(f)


def test_overlap_detection_quality(pinned, measured):
    """Both score types (alignment score + registration corr score) must
    reproduce the pinned P/R/F1 and hold achieved-level floors."""
    for key in ("aligner_overlapper", "registration_overlapper"):
        pin, got = pinned["overlap"][key], measured["overlap"][key]
        for metric in ("precision", "recall", "f1_score"):
            assert abs(got[metric] - pin[metric]) <= TOL, (
                f"{key}.{metric}: {got[metric]:.3f} vs pinned "
                f"{pin[metric]:.3f}")
        # achieved-level floor: a 20% regression in either score type fails
        assert got["f1_score"] >= pin["f1_score"] - TOL


def test_mosaicking_quality(pinned, measured):
    """Mosaicking acc/comp/prec/recall/fscore within tolerance of the pin
    (keys from reg/metrics.py::compute_mosaicking_error, matching the
    reference utils/registration.py:131-143)."""
    for key, pin in pinned["mosaicking"].items():
        if not isinstance(pin, dict):
            continue
        got = measured["mosaicking"][key]
        for metric, val in pin.items():
            if metric in ("acc", "comp"):
                # metres, lower is better; allow 1 cm drift
                assert abs(got[metric] - val) <= 0.01, (key, metric, got)
            else:
                assert abs(got[metric] - val) <= TOL, (key, metric, got)
