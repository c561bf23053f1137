"""Parity tests: dense masked GAT/GCN vs numpy ports of torch-geometric 2.2.

The numpy goldens implement PyG's documented message-passing semantics (GATConv
with add_self_loops + LeakyReLU(0.2) scatter-softmax; GCNConv with gcn_norm) on
explicit edge lists, which is what the reference runs per graph
(/root/reference/src/aligner/networks/gat.py:27-48).
"""

import numpy as np

import jax.numpy as jnp

from sgaligner_tpu.ops.gat import gat_conv, gcn_conv


def numpy_gatconv(x, edges, w, att_src, att_dst, bias, slope=0.2):
    """x: [N, Din]; edges: [E, 2] (src, dst); w: [Din, H, Dout]."""
    n = x.shape[0]
    h, dout = att_src.shape
    xp = np.einsum("nd,dhe->nhe", x, w)
    a_src = np.einsum("nhe,he->nh", xp, att_src)
    a_dst = np.einsum("nhe,he->nh", xp, att_dst)

    # add self loops
    all_edges = np.concatenate([edges, np.stack([np.arange(n), np.arange(n)], 1)])
    out = np.zeros((n, h, dout))
    for i in range(n):
        incoming = all_edges[all_edges[:, 1] == i][:, 0]
        if len(incoming) == 0:
            continue
        scores = a_src[incoming] + a_dst[i][None]                      # [E_i, H]
        scores = np.where(scores > 0, scores, slope * scores)
        alpha = np.exp(scores - scores.max(0, keepdims=True))
        alpha = alpha / alpha.sum(0, keepdims=True)
        out[i] = np.einsum("eh,ehd->hd", alpha, xp[incoming])
    return out.reshape(n, h * dout) + bias


def numpy_gcnconv(x, edges, w, bias):
    n = x.shape[0]
    all_edges = np.concatenate([edges, np.stack([np.arange(n), np.arange(n)], 1)])
    deg = np.zeros(n)
    for s, t in all_edges:
        deg[t] += 1.0
    xp = x @ w
    out = np.zeros((n, w.shape[1]))
    for s, t in all_edges:
        out[t] += xp[s] / np.sqrt(deg[s] * deg[t])
    return out + bias


def _random_graph(rng, n, p_edge=0.4):
    mask = (rng.random((n, n)) < p_edge) & ~np.eye(n, dtype=bool)
    s, t = np.nonzero(mask)
    return np.stack([s, t], axis=1)


def test_gat_conv_matches_pyg_semantics():
    rng = np.random.default_rng(0)
    n, din, h, dout = 9, 3, 2, 5
    x = rng.normal(size=(n, din)).astype(np.float32)
    edges = _random_graph(rng, n)
    w = rng.normal(size=(din, h, dout)).astype(np.float32)
    att_src = rng.normal(size=(h, dout)).astype(np.float32)
    att_dst = rng.normal(size=(h, dout)).astype(np.float32)
    bias = rng.normal(size=(h * dout,)).astype(np.float32)

    want = numpy_gatconv(x, edges, w, att_src, att_dst, bias)

    n_pad = 16
    adj = np.zeros((1, n_pad, n_pad), bool)
    adj[0, edges[:, 1], edges[:, 0]] = True  # adj[i, j] = edge j->i
    node_mask = np.zeros((1, n_pad), bool)
    node_mask[0, :n] = True
    x_pad = np.zeros((1, n_pad, din), np.float32)
    x_pad[0, :n] = x

    got = gat_conv(jnp.array(x_pad), jnp.array(adj), jnp.array(node_mask),
                   jnp.array(w), jnp.array(att_src), jnp.array(att_dst),
                   jnp.array(bias))
    np.testing.assert_allclose(np.asarray(got)[0, :n], want, rtol=2e-4, atol=1e-5)
    assert not np.asarray(got)[0, n:].any()  # padded nodes -> zeros


def test_gat_conv_isolated_node_gets_self_loop():
    # a valid node with no edges still attends to itself (PyG add_self_loops)
    rng = np.random.default_rng(1)
    n_pad, din, h, dout = 8, 3, 2, 4
    x = np.zeros((1, n_pad, din), np.float32)
    x[0, 0] = rng.normal(size=din)
    adj = np.zeros((1, n_pad, n_pad), bool)
    node_mask = np.zeros((1, n_pad), bool)
    node_mask[0, 0] = True
    w = rng.normal(size=(din, h, dout)).astype(np.float32)
    att = rng.normal(size=(2, h, dout)).astype(np.float32)
    got = gat_conv(jnp.array(x), jnp.array(adj), jnp.array(node_mask),
                   jnp.array(w), jnp.array(att[0]), jnp.array(att[1]), None)
    want = np.einsum("d,dhe->he", x[0, 0], w).reshape(-1)  # alpha == 1 on self
    np.testing.assert_allclose(np.asarray(got)[0, 0], want, rtol=1e-5, atol=1e-6)


def test_gcn_conv_matches_pyg_semantics():
    rng = np.random.default_rng(2)
    n, din, dout = 7, 3, 6
    x = rng.normal(size=(n, din)).astype(np.float32)
    edges = _random_graph(rng, n, 0.5)
    w = rng.normal(size=(din, dout)).astype(np.float32)
    bias = rng.normal(size=(dout,)).astype(np.float32)

    want = numpy_gcnconv(x, edges, w, bias)

    n_pad = 12
    adj = np.zeros((1, n_pad, n_pad), bool)
    adj[0, edges[:, 1], edges[:, 0]] = True
    node_mask = np.zeros((1, n_pad), bool)
    node_mask[0, :n] = True
    x_pad = np.zeros((1, n_pad, din), np.float32)
    x_pad[0, :n] = x

    got = gcn_conv(jnp.array(x_pad), jnp.array(adj), jnp.array(node_mask),
                   jnp.array(w), jnp.array(bias))
    np.testing.assert_allclose(np.asarray(got)[0, :n], want, rtol=2e-4, atol=1e-5)


def test_batched_graphs_independent():
    # two graphs in one batch == each alone
    rng = np.random.default_rng(3)
    n_pad, din, h, dout = 10, 3, 2, 4
    w = rng.normal(size=(din, h, dout)).astype(np.float32)
    att_s = rng.normal(size=(h, dout)).astype(np.float32)
    att_d = rng.normal(size=(h, dout)).astype(np.float32)

    xs, adjs, masks = [], [], []
    for n in (4, 7):
        x = np.zeros((n_pad, din), np.float32)
        x[:n] = rng.normal(size=(n, din))
        edges = _random_graph(rng, n)
        adj = np.zeros((n_pad, n_pad), bool)
        if len(edges):
            adj[edges[:, 1], edges[:, 0]] = True
        mask = np.zeros(n_pad, bool)
        mask[:n] = True
        xs.append(x); adjs.append(adj); masks.append(mask)

    both = gat_conv(jnp.array(np.stack(xs)), jnp.array(np.stack(adjs)),
                    jnp.array(np.stack(masks)), jnp.array(w),
                    jnp.array(att_s), jnp.array(att_d), None)
    for g in range(2):
        solo = gat_conv(jnp.array(xs[g][None]), jnp.array(adjs[g][None]),
                        jnp.array(masks[g][None]), jnp.array(w),
                        jnp.array(att_s), jnp.array(att_d), None)
        np.testing.assert_allclose(np.asarray(both)[g], np.asarray(solo)[0],
                                   rtol=1e-5, atol=1e-6)
