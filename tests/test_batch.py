import numpy as np
import pytest

from sgaligner_tpu.data.batch import BatchSpec, collate, pack_pair, pad_batch_to
from sgaligner_tpu.data.synthetic import make_synthetic_batch, make_synthetic_pair

SPEC = BatchSpec(batch_size=3, max_objects=16, points_per_object=32)


def test_pack_pair_layout():
    rng = np.random.default_rng(0)
    s = make_synthetic_pair(SPEC, rng, n_src=5, n_ref=7, n_anchor=3)
    n = SPEC.max_objects
    assert s["obj_points"].shape == (2 * n, 3, 32)
    assert s["obj_mask"][:5].all() and not s["obj_mask"][5:n].any()
    assert s["obj_mask"][n : n + 7].all() and not s["obj_mask"][n + 7 :].any()
    assert s["n_src"] == 5 and s["n_ref"] == 7
    # anchors: e2i offset into ref block
    assert (s["e2i"][s["anchor_mask"]] >= n).all()
    assert s["anchor_mask"].sum() == 3
    # adjacency is dense (none-completion): n*(n-1) directed edges per graph
    assert s["adj"][0].sum() == 5 * 4
    assert s["adj"][1].sum() == 7 * 6
    # no self loops stored (GAT adds them)
    assert not np.diagonal(s["adj"], axis1=1, axis2=2).any()


def test_pack_pair_overflow_raises():
    rng = np.random.default_rng(0)
    with pytest.raises(ValueError):
        make_synthetic_pair(SPEC, rng, n_src=17, n_ref=5)


def test_collate_and_pad():
    batch = make_synthetic_batch(SPEC, seed=1)
    assert batch["obj_points"].shape[0] == 3
    padded = pad_batch_to(batch, 8)
    assert padded["obj_points"].shape[0] == 8
    assert (padded["overlap"][3:] == -1.0).all()
    assert not padded["obj_mask"][3:].any()


def test_anchor_indices_consistent():
    batch = make_synthetic_batch(SPEC, seed=2)
    for b in range(3):
        am = batch["anchor_mask"][b]
        e1i = batch["e1i"][b][am]
        e2i = batch["e2i"][b][am]
        # anchors are valid objects
        assert batch["obj_mask"][b][e1i].all()
        assert batch["obj_mask"][b][e2i].all()
        # anchored objects share their 3RScan object id across src/ref
        assert (batch["obj_ids"][b][e1i] == batch["obj_ids"][b][e2i]).all()
