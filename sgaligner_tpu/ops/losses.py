"""Masked contrastive losses (ICL / IAL / NCA) + Kendall uncertainty weighting.

Functional JAX re-implementations of the reference losses
(/root/reference/src/aligner/losses.py) over *padded* anchor/negative index sets.
The reference gathers anchors from a ragged flat batch; here every index array is
padded to a static length with a boolean mask, and every sum/mean is a masked
reduction. With all-true masks these functions match the torch reference to
float32 precision (see tests/test_losses.py).

Semantics preserved exactly, including the quirks:
* ICL temperature hard-coded to 0.1 (losses.py:39), IAL temp 1.0 + zoom 0.1
  (losses.py:63-66) — the constructor's ``temperature`` arg is ignored upstream.
* The eps placement inside ``calculate_prob_dist`` (losses.py:5-15).
* IAL's arg order: called as ``align_loss(modal_emb, joint_emb)``
  (losses.py:122) despite the docstring claiming the reverse.
* Negatives pool across *all pairs in the batch* (the e1j/e2j sums are scalar
  over the whole gathered matrix, losses.py:10-11).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-9


def l2_normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """torch.nn.functional.normalize semantics: x / max(||x||, 1e-12).

    Written as x * rsqrt(max(||x||², eps²)) so the backward pass is NaN-free at
    exact-zero rows (padded slots produce those): the naive sqrt-of-sum form
    yields 0/0 in the chain rule even when the clamp selects the constant.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


def masked_prob_dist(
    e1i: jnp.ndarray,   # [A, D] anchor embeddings (may contain garbage rows)
    e2i: jnp.ndarray,   # [A, D]
    e1j: jnp.ndarray,   # [J1, D] negatives
    e2j: jnp.ndarray,   # [J2, D]
    m_i: jnp.ndarray,   # [A] anchor validity
    m_j1: jnp.ndarray,  # [J1]
    m_j2: jnp.ndarray,  # [J2]
    temp: float,
) -> jnp.ndarray:
    """Masked port of calculate_prob_dist (losses.py:5-15). Returns q [A, A].

    Invalid (i, i') entries hold garbage and must be excluded by the caller via
    ``outer(m_i, m_i)``; the scalar negative sums are exact masked sums.
    """
    m_i = m_i.astype(e1i.dtype)
    d_ii = jnp.exp(e1i @ e2i.T / temp)                                 # [A, A]
    d_1j = jnp.exp(e1i @ e1j.T / temp) * jnp.outer(m_i, m_j1)          # [A, J1]
    d_2j = jnp.exp(e1i @ e2j.T / temp) * jnp.outer(m_i, m_j2)          # [A, J2]

    d_ii_1j = d_ii / (d_1j.sum() + EPS)
    d_ii_2j = d_ii / (d_2j.sum() + EPS)
    q_inv = 1.0 + 1.0 / (d_ii_1j + EPS) + 1.0 / (d_ii_2j + EPS)
    return 1.0 / (q_inv + EPS)


def _gather(emb: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Gather rows and zero out the masked ones (stable wrt. padded indices)."""
    return emb[idx] * mask[:, None].astype(emb.dtype)


def icl_loss(
    emb: jnp.ndarray,          # [O, D] flat object embeddings (unnormalized)
    e1i: jnp.ndarray, e2i: jnp.ndarray,       # [A] flat indices
    e1j: jnp.ndarray, e2j: jnp.ndarray,       # [J1], [J2] flat indices
    m_i: jnp.ndarray, m_j1: jnp.ndarray, m_j2: jnp.ndarray,
    temp: float = 0.1,
    alpha: float = 0.5,
) -> jnp.ndarray:
    """Intra-graph contrastive loss — ICLLoss.forward (losses.py:36-58)."""
    emb = l2_normalize(emb, axis=1)
    v1i, v2i = _gather(emb, e1i, m_i), _gather(emb, e2i, m_i)
    v1j, v2j = _gather(emb, e1j, m_j1), _gather(emb, e2j, m_j2)

    q_12 = masked_prob_dist(v1i, v2i, v1j, v2j, m_i, m_j1, m_j2, temp)
    q_21 = masked_prob_dist(v2i, v1i, v2j, v1j, m_i, m_j2, m_j1, temp)

    mix = alpha * q_12 + (1.0 - alpha) * q_21                           # [A, A]
    valid = jnp.outer(m_i, m_i).astype(emb.dtype)
    # -log on masked entries would be log(garbage); substitute 1.0 there.
    safe = jnp.where(valid > 0, mix, 1.0)
    return -(jnp.log(safe) * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def ial_loss(
    emb_modal: jnp.ndarray,    # [O, D_m] — reference arg 1 (losses.py:122)
    emb_joint: jnp.ndarray,    # [O, D_j] — reference arg 2
    e1i: jnp.ndarray, e2i: jnp.ndarray,
    e1j: jnp.ndarray, e2j: jnp.ndarray,
    m_i: jnp.ndarray, m_j1: jnp.ndarray, m_j2: jnp.ndarray,
    temp: float = 1.0,
    alpha: float = 0.5,
    zoom: float = 0.1,
) -> jnp.ndarray:
    """Inter-modal alignment loss — IALLoss.forward (losses.py:60-97).

    Quirk preserved: the reference constructs ``KLDivLoss(log_target=True)`` but
    passes the *probability* ``qo`` (not its log) as target (losses.py:92-94),
    so torch evaluates ``sum(exp(qo) * (qo - log(qm)))`` — with qo from arg 1
    (modal) and qm from arg 2 (joint). We replicate that formula verbatim.
    """
    o = l2_normalize(emb_modal, axis=1)
    m = l2_normalize(emb_joint, axis=1)

    o1i, o2i = _gather(o, e1i, m_i), _gather(o, e2i, m_i)
    o1j, o2j = _gather(o, e1j, m_j1), _gather(o, e2j, m_j2)
    qo_12 = masked_prob_dist(o1i, o2i, o1j, o2j, m_i, m_j1, m_j2, temp)
    qo_21 = masked_prob_dist(o2i, o1i, o2j, o1j, m_i, m_j2, m_j1, temp)

    m1i, m2i = _gather(m, e1i, m_i), _gather(m, e2i, m_i)
    m1j, m2j = _gather(m, e1j, m_j1), _gather(m, e2j, m_j2)
    qm_12 = masked_prob_dist(m1i, m2i, m1j, m2j, m_i, m_j1, m_j2, temp)
    qm_21 = masked_prob_dist(m2i, m1i, m2j, m1j, m_i, m_j2, m_j1, temp)

    valid = jnp.outer(m_i, m_i)

    def kl(q_target: jnp.ndarray, q_input: jnp.ndarray) -> jnp.ndarray:
        # torch.kl_div(input=log(qi), target=qt, log_target=True)
        #   = sum(exp(qt) * (qt - log(qi)))   [quirk: qt is a probability]
        qt = jnp.where(valid, q_target, 0.0)
        qi = jnp.where(valid, q_input, 1.0)
        return (jnp.exp(qt) * (qt - jnp.log(qi)) * valid).sum()

    loss_a = kl(qo_12, qm_12)
    loss_b = kl(qo_21, qm_21)
    return zoom * (alpha * loss_a + (1.0 - alpha) * loss_b)


def kendall_combine(losses: jnp.ndarray, log_vars: jnp.ndarray) -> jnp.ndarray:
    """CustomMultiLossLayer (losses.py:17-34): sum_i exp(-s_i) L_i + s_i."""
    precision = jnp.exp(-log_vars)
    return (precision * losses + log_vars).sum()


def nca_loss(
    src: jnp.ndarray,   # [A, D] gathered + normalized anchor embeddings
    ref: jnp.ndarray,   # [A, D]
    mask: jnp.ndarray,  # [A]
    alpha: float = 1.0,
    beta: float = 1.0,
    ep: float = 0.0,
) -> jnp.ndarray:
    """Masked NCALoss (losses.py:154-173) used by the EVA baseline."""
    mask_f = mask.astype(src.dtype)
    valid2 = jnp.outer(mask_f, mask_f)                                  # [A, A]
    scores = (src @ ref.T) * valid2
    eye = jnp.eye(scores.shape[0], dtype=scores.dtype)

    s_diag = eye * scores
    s_off = jnp.exp(alpha * (scores - ep)) * valid2
    s_off = s_off - s_off * eye

    n_valid = jnp.maximum(mask_f.sum(), 1.0)
    loss_diag = -jnp.log1p(jax.nn.relu(s_diag.sum(0)))                  # [A]
    term_0 = (jnp.log1p(s_off.sum(0)) / alpha * mask_f).sum() / n_valid
    term_1 = (jnp.log1p(s_off.sum(1)) / alpha * mask_f).sum() / n_valid
    term_d = (beta * loss_diag * mask_f).sum() / n_valid
    return term_0 + term_1 + term_d
