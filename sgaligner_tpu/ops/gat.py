"""Dense masked graph attention / convolution ops.

The reference's structure encoder runs torch-geometric ``GATConv``/``GCNConv``
(CUDA scatter-softmax kernels) one graph at a time inside a python loop
(/root/reference/src/aligner/sg_aligner.py:86-110, networks/gat.py:27-48). On TPU
we exploit that 3DSSG subscan graphs are (a) small — tens of nodes — and (b) dense
after 'none'-relation completion (preprocess.py:176-182): attention over a dense
``[G, N, N]`` adjacency is pure batched matmul + masked softmax, which XLA fuses
onto the MXU/VPU with no scatter at all. All graphs of all pairs in a batch run in
ONE op.

Semantics match torch-geometric 2.2 exactly (verified against a numpy port in
tests/test_gat.py):

* GATConv: per-head score e_ij = LeakyReLU(att_src·(W x_j) + att_dst·(W x_i),
  slope 0.2); softmax over incoming edges j of node i *with self-loops added*
  (PyG default add_self_loops=True); out_i = concat_h Σ_j α_ij (W x_j)_h + bias.
* GCNConv: Â = A + I, out = D̂^{-1/2} Â D̂^{-1/2} X W + bias with in-degree D̂.

Convention: ``adj[g, i, j] == True`` ⇔ directed edge j → i (message from j to i),
matching the reference's edge list (subject, object) fed as (source, target).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def add_self_loops(adj: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
    """adj: [..., N, N] bool; add i->i for valid nodes."""
    n = adj.shape[-1]
    eye = jnp.eye(n, dtype=bool)
    return adj | (eye & node_mask[..., None, :] & node_mask[..., :, None])


def gat_conv(
    x: jnp.ndarray,          # [G, N, Din]
    adj: jnp.ndarray,        # [G, N, N] bool, adj[g,i,j] = edge j->i
    node_mask: jnp.ndarray,  # [G, N] bool
    weight: jnp.ndarray,     # [Din, H, Dout]
    att_src: jnp.ndarray,    # [H, Dout]
    att_dst: jnp.ndarray,    # [H, Dout]
    bias: jnp.ndarray | None,  # [H * Dout] or None
    negative_slope: float = 0.2,
    self_loops: bool = True,
) -> jnp.ndarray:
    """Dense masked GATConv. Returns [G, N, H*Dout] (heads concatenated)."""
    g, n, _ = x.shape
    h, dout = att_src.shape

    xp = jnp.einsum("gnd,dhe->gnhe", x, weight)          # [G, N, H, Dout]
    a_src = jnp.einsum("gnhe,he->gnh", xp, att_src)      # score contribution of j
    a_dst = jnp.einsum("gnhe,he->gnh", xp, att_dst)      # score contribution of i

    # scores[g, h, i, j] = lrelu(a_dst[i] + a_src[j])
    scores = a_dst[:, :, None, :].transpose(0, 3, 1, 2) + a_src[:, None, :, :].transpose(0, 3, 1, 2)
    scores = jax.nn.leaky_relu(scores, negative_slope)

    mask = add_self_loops(adj, node_mask) if self_loops else (
        adj & node_mask[:, None, :] & node_mask[:, :, None]
    )
    scores = jnp.where(mask[:, None, :, :], scores, NEG_INF)

    # Masked softmax over j (incoming messages); rows with no edges -> zeros.
    smax = jnp.max(scores, axis=-1, keepdims=True)
    has_any = smax > NEG_INF / 2
    expd = jnp.exp(scores - jnp.where(has_any, smax, 0.0))
    expd = jnp.where(mask[:, None, :, :], expd, 0.0)
    denom = expd.sum(axis=-1, keepdims=True)
    alpha = expd / jnp.maximum(denom, 1e-16)             # [G, H, N, N]

    out = jnp.einsum("ghij,gjhe->gihe", alpha, xp)       # [G, N, H, Dout]
    out = out.reshape(g, n, h * dout)
    if bias is not None:
        out = out + bias
    return out * node_mask[..., None].astype(out.dtype)


def gcn_conv(
    x: jnp.ndarray,          # [G, N, Din]
    adj: jnp.ndarray,        # [G, N, N] bool, adj[g,i,j] = edge j->i
    node_mask: jnp.ndarray,  # [G, N] bool
    weight: jnp.ndarray,     # [Din, Dout]
    bias: jnp.ndarray | None,
) -> jnp.ndarray:
    """Dense masked GCNConv (PyG gcn_norm semantics). Returns [G, N, Dout].

    PyG computes degrees from the *target* index of Â = A + I (in-degree) and
    normalizes each edge j->i by deg_i^{-1/2} deg_j^{-1/2}.
    """
    a_hat = add_self_loops(adj, node_mask).astype(x.dtype)   # [G, N, N]
    deg = a_hat.sum(axis=-1)                                 # in-degree of i
    inv_sqrt = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1e-12)), 0.0)
    norm = a_hat * inv_sqrt[:, :, None] * inv_sqrt[:, None, :]

    out = jnp.einsum("gij,gjd->gid", norm, x @ weight)
    if bias is not None:
        out = out + bias
    return out * node_mask[..., None].astype(out.dtype)
