"""T-GCN: temporal GCN-GRU cell.

Capability parity with reference ``nn/recurrent/temporalgcn.py`` (Zhao et
al., arXiv 1811.05320): ``TGCN`` (`:5-130`) and its batched twin ``TGCN2``
(`:133-233`).  In this framework one batch-polymorphic class covers both:
inputs are (..., N, F), so (N, F) and (B, N, F) both work — ``TGCN2`` is
kept as an alias for API familiarity (its ``batch_size`` arg was already
compat-only in the reference, `:147-158`).

Gate math (`:82-98`):  gate = Linear(concat([GCNConv(X), H])).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import GCNConv


class TGCN(nn.Module):
    """forward: (X, graph, H=None) -> H."""

    out_channels: int
    improved: bool = False
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, h: Optional[jnp.ndarray] = None):
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        conv_z = GCNConv(C, self.improved, self.add_self_loops, name="conv_z")
        conv_r = GCNConv(C, self.improved, self.add_self_loops, name="conv_r")
        conv_h = GCNConv(C, self.improved, self.add_self_loops, name="conv_h")
        z = nn.sigmoid(
            nn.Dense(C, name="linear_z")(
                jnp.concatenate([conv_z(x, graph), h], axis=-1)
            )
        )
        r = nn.sigmoid(
            nn.Dense(C, name="linear_r")(
                jnp.concatenate([conv_r(x, graph), h], axis=-1)
            )
        )
        h_tilde = nn.tanh(
            nn.Dense(C, name="linear_h")(
                jnp.concatenate([conv_h(x, graph), h * r], axis=-1)
            )
        )
        return z * h + (1.0 - z) * h_tilde


# Batched alias: the base class already accepts (B, N, F).
TGCN2 = TGCN
