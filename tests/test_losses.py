"""Parity tests: masked JAX losses vs the reference's torch formulas.

The torch formulas below are written from the documented semantics of
/root/reference/src/aligner/losses.py (see SURVEY.md §2 item 8) — including the
KLDivLoss(log_target=True)-fed-a-probability quirk — and serve as the golden
implementation. With all-true masks the JAX versions must match.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from sgaligner_tpu.ops.losses import (
    ial_loss,
    icl_loss,
    kendall_combine,
    nca_loss,
)


def torch_prob_dist(e1i, e2i, e1j, e2j, temp):
    d_ii = torch.exp(e1i @ e2i.T / temp)
    d_1j = torch.exp(e1i @ e1j.T / temp)
    d_2j = torch.exp(e1i @ e2j.T / temp)
    a = d_ii / (d_1j.sum() + 1e-9)
    b = d_ii / (d_2j.sum() + 1e-9)
    q_inv = 1.0 + 1.0 / (a + 1e-9) + 1.0 / (b + 1e-9)
    return 1.0 / (q_inv + 1e-9)


def torch_icl(emb, e1i, e2i, e1j, e2j, temp=0.1, alpha=0.5):
    emb = F.normalize(emb, dim=1)
    v1i, v2i, v1j, v2j = emb[e1i], emb[e2i], emb[e1j], emb[e2j]
    q12 = torch_prob_dist(v1i, v2i, v1j, v2j, temp)
    q21 = torch_prob_dist(v2i, v1i, v2j, v1j, temp)
    return -torch.log(alpha * q12 + (1 - alpha) * q21).mean()


def torch_ial(modal, joint, e1i, e2i, e1j, e2j, temp=1.0, alpha=0.5, zoom=0.1):
    o = F.normalize(modal, dim=1)
    m = F.normalize(joint, dim=1)
    qo12 = torch_prob_dist(o[e1i], o[e2i], o[e1j], o[e2j], temp)
    qo21 = torch_prob_dist(o[e2i], o[e1i], o[e2j], o[e1j], temp)
    qm12 = torch_prob_dist(m[e1i], m[e2i], m[e1j], m[e2j], temp)
    qm21 = torch_prob_dist(m[e2i], m[e1i], m[e2j], m[e1j], temp)
    kl = torch.nn.KLDivLoss(reduction="sum", log_target=True)
    loss_a = kl(qm12.log(), qo12)
    loss_b = kl(qm21.log(), qo21)
    return zoom * (alpha * loss_a + (1 - alpha) * loss_b)


def torch_nca(src, ref, alpha=1.0, beta=1.0, ep=0.0):
    n = src.shape[0]
    scores = src @ ref.T
    eye = torch.eye(n)
    s_diag = eye * scores
    s_ = torch.exp(alpha * (scores - ep))
    s_ = s_ - s_ * eye
    loss_diag = -torch.log(1 + F.relu(s_diag.sum(0)))
    return (
        (torch.log(1 + s_.sum(0)) / alpha).mean()
        + (torch.log(1 + s_.sum(1)) / alpha).mean()
        + (beta * loss_diag).mean()
    )


@pytest.fixture
def setup():
    rng = np.random.default_rng(42)
    n_obj, d = 24, 16
    emb = rng.normal(size=(n_obj, d)).astype(np.float32)
    e1i = np.array([0, 1, 2, 3], np.int32)
    e2i = np.array([12, 13, 14, 15], np.int32)
    e1j = np.array([4, 5, 6, 7, 8], np.int32)
    e2j = np.array([16, 17, 18, 19], np.int32)
    return emb, e1i, e2i, e1j, e2j


def _full_masks(e1i, e1j, e2j):
    return (np.ones(len(e1i), bool), np.ones(len(e1j), bool), np.ones(len(e2j), bool))


def test_icl_matches_torch(setup):
    emb, e1i, e2i, e1j, e2j = setup
    m_i, m_j1, m_j2 = _full_masks(e1i, e1j, e2j)
    got = icl_loss(jnp.array(emb), jnp.array(e1i), jnp.array(e2i),
                   jnp.array(e1j), jnp.array(e2j),
                   jnp.array(m_i), jnp.array(m_j1), jnp.array(m_j2))
    want = torch_icl(torch.tensor(emb), e1i, e2i, e1j, e2j)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_icl_masked_equals_unpadded(setup):
    emb, e1i, e2i, e1j, e2j = setup
    # pad each index set with garbage + False mask; result must not change
    pad = lambda a, fill: np.concatenate([a, np.full(3, fill, a.dtype)])
    m = lambda a: np.concatenate([np.ones(len(a), bool), np.zeros(3, bool)])
    got_padded = icl_loss(
        jnp.array(emb),
        jnp.array(pad(e1i, 9)), jnp.array(pad(e2i, 9)),
        jnp.array(pad(e1j, 9)), jnp.array(pad(e2j, 9)),
        jnp.array(m(e1i)), jnp.array(m(e1j)), jnp.array(m(e2j)))
    m_i, m_j1, m_j2 = _full_masks(e1i, e1j, e2j)
    got = icl_loss(jnp.array(emb), jnp.array(e1i), jnp.array(e2i),
                   jnp.array(e1j), jnp.array(e2j),
                   jnp.array(m_i), jnp.array(m_j1), jnp.array(m_j2))
    np.testing.assert_allclose(float(got_padded), float(got), rtol=1e-6)


def test_ial_matches_torch(setup):
    emb, e1i, e2i, e1j, e2j = setup
    rng = np.random.default_rng(7)
    joint = rng.normal(size=(emb.shape[0], 32)).astype(np.float32)
    m_i, m_j1, m_j2 = _full_masks(e1i, e1j, e2j)
    got = ial_loss(jnp.array(emb), jnp.array(joint),
                   jnp.array(e1i), jnp.array(e2i), jnp.array(e1j), jnp.array(e2j),
                   jnp.array(m_i), jnp.array(m_j1), jnp.array(m_j2))
    want = torch_ial(torch.tensor(emb), torch.tensor(joint), e1i, e2i, e1j, e2j)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-4)


def test_kendall_combine():
    losses = jnp.array([1.0, 2.0, 3.0])
    log_vars = jnp.array([0.1, -0.2, 0.0])
    want = sum(np.exp(-lv) * l + lv for l, lv in zip([1, 2, 3], [0.1, -0.2, 0.0]))
    np.testing.assert_allclose(float(kendall_combine(losses, log_vars)), want, rtol=1e-6)


def test_nca_matches_torch(setup):
    emb, e1i, e2i, *_ = setup
    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    src, ref = embn[e1i], embn[e2i]
    got = nca_loss(jnp.array(src), jnp.array(ref), jnp.ones(len(e1i), bool))
    want = torch_nca(torch.tensor(src), torch.tensor(ref))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_nca_masked_equals_unpadded(setup):
    emb, e1i, e2i, *_ = setup
    embn = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    src, ref = embn[e1i], embn[e2i]
    got = nca_loss(jnp.array(src), jnp.array(ref), jnp.ones(len(e1i), bool))
    src_p = np.concatenate([src, np.random.default_rng(0).normal(size=(2, src.shape[1]))])
    ref_p = np.concatenate([ref, np.random.default_rng(1).normal(size=(2, ref.shape[1]))])
    mask = np.concatenate([np.ones(len(e1i), bool), np.zeros(2, bool)])
    # masked gathers zero out invalid rows before nca_loss in objective.py
    src_p[~mask] = 0
    ref_p[~mask] = 0
    got_p = nca_loss(jnp.array(src_p, jnp.float32), jnp.array(ref_p, jnp.float32),
                     jnp.array(mask))
    np.testing.assert_allclose(float(got_p), float(got), rtol=1e-5)
