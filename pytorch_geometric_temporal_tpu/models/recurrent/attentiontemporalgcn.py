"""A3T-GCN: attention-weighted aggregation of per-period T-GCN outputs.

Capability parity with reference ``nn/recurrent/attentiontemporalgcn.py``:
``A3TGCN`` (`:7-79`) and batched ``A3TGCN2`` (`:83-157`).  One
batch-polymorphic class: input (..., N, F, T) — (N, F, T) or (B, N, F, T).

Faithful to the reference semantics: every period's TGCN starts from the
*same* provided H (the reference never chains hidden states across periods,
`:73-78`), and the attention vector is softmaxed uniform-initialized.  The
per-period loop is vectorized: periods are folded into the batch dim so all
T TGCN applications run as one fused computation instead of a Python loop.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.graph import Graph
from .temporalgcn import TGCN


class A3TGCN(nn.Module):
    """forward: (X (..., N, F, T), graph, H=None) -> H (..., N, C)."""

    out_channels: int
    periods: int

    improved: bool = False
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, h: Optional[jnp.ndarray] = None):
        if x.shape[-1] != self.periods:
            raise ValueError(
                f"A3TGCN expects input (..., N, F, T={self.periods}); got "
                f"trailing dim {x.shape[-1]} (shape {x.shape})"
            )
        att = self.param(
            "attention",
            lambda key, shape: jax.random.uniform(key, shape),
            (self.periods,),
        )
        probs = jax.nn.softmax(att, axis=0)
        tgcn = TGCN(
            self.out_channels, self.improved, self.add_self_loops, name="base_tgcn"
        )
        # (..., N, F, T) -> (T, ..., N, F): fold periods into a leading batch
        # axis; TGCN is batch-polymorphic so one call covers all periods.
        xt = jnp.moveaxis(x, -1, 0)
        if h is not None:
            hh = jnp.broadcast_to(h, (self.periods,) + h.shape)
        else:
            hh = None
        out = tgcn(xt, graph, hh)  # (T, ..., N, C)
        return jnp.tensordot(probs, out, axes=(0, 0))


A3TGCN2 = A3TGCN
