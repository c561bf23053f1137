"""Structure encoders: MultiGAT / MultiGCN over dense masked adjacency.

Equivalent of /root/reference/src/aligner/networks/gat.py:6-48, but batched over
every graph of every pair at once (no per-graph python loop; compare
sg_aligner.py:86-110). Layer-size rule preserved: layer i's input width is
``n_units[i] * n_heads[i-1]`` for i > 0 (gat.py:36).
"""

from __future__ import annotations

from collections.abc import Sequence

import flax.linen as nn
import jax.numpy as jnp

from sgaligner_tpu.ops.gat import gat_conv, gcn_conv

_glorot = nn.initializers.xavier_uniform()


class GATConvLayer(nn.Module):
    """One torch-geometric-compatible GATConv (heads concatenated)."""

    in_dim: int
    out_dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, adj, node_mask):
        w = self.param("weight", _glorot, (self.in_dim, self.heads, self.out_dim),
                       self.dtype)
        att_src = self.param("att_src", _glorot, (self.heads, self.out_dim), self.dtype)
        att_dst = self.param("att_dst", _glorot, (self.heads, self.out_dim), self.dtype)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.heads * self.out_dim,), self.dtype)
        return gat_conv(x, adj, node_mask, w, att_src, att_dst, bias)


class GCNConvLayer(nn.Module):
    in_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, adj, node_mask):
        w = self.param("weight", _glorot, (self.in_dim, self.out_dim), self.dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,), self.dtype)
        return gcn_conv(x, adj, node_mask, w, bias)


class MultiGAT(nn.Module):
    """gat.py:27-48 — dropout → GATConv per layer, ELU between layers."""

    n_units: Sequence[int] = (3, 128, 128)
    n_heads: Sequence[int] = (2, 2)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, adj, node_mask, train: bool = False):
        num_layers = len(self.n_units) - 1
        for i in range(num_layers):
            in_dim = self.n_units[i] * self.n_heads[i - 1] if i else self.n_units[i]
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = GATConvLayer(in_dim, self.n_units[i + 1], self.n_heads[i],
                             dtype=self.dtype, name=f"gat{i}")(x, adj, node_mask)
            if i + 1 < num_layers:
                x = nn.elu(x)
        return x


class MultiGCN(nn.Module):
    """gat.py:6-25 — GCNConv per layer, ReLU + dropout between layers."""

    n_units: Sequence[int] = (3, 200, 400)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, adj, node_mask, train: bool = False):
        num_layers = len(self.n_units) - 1
        for i in range(num_layers):
            x = GCNConvLayer(self.n_units[i], self.n_units[i + 1],
                             dtype=self.dtype, name=f"gcn{i}")(x, adj, node_mask)
            if i + 1 < num_layers:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x
