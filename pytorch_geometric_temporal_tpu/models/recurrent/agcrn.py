"""AGCRN: adaptive graph convolutional recurrent network (graph-free).

Capability parity with reference ``nn/recurrent/agcrn.py:56-123`` (Bai et
al., arXiv 2007.02842).  No edge list at all — the support is learned from
node embeddings E inside :class:`~..conv.AVWGCN`.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..conv import AVWGCN


class AGCRN(nn.Module):
    """forward: (X (B, N, F), E (N, D), H=None) -> H (B, N, C).

    ``topk``: large-N mode — the learned support keeps only the top-k
    neighbors per node and the Chebyshev recursion runs on vectors, so no
    (N, N) tensor is ever materialized (see :class:`~..conv.AVWGCN` for
    the documented softmax deviation).  ``None`` (default) is the exact
    dense reference form, guarded above 8192 nodes.
    """

    number_of_nodes: int
    out_channels: int
    K: int
    embedding_dimensions: int
    topk: Optional[int] = None

    @nn.compact
    def __call__(self, x, e, h: Optional[jnp.ndarray] = None):
        if e.ndim != 2 or e.shape != (self.number_of_nodes,
                                      self.embedding_dimensions):
            raise ValueError(
                f"AGCRN expects node embeddings E of shape "
                f"({self.number_of_nodes}, {self.embedding_dimensions}); "
                f"got {tuple(e.shape)}."
            )
        if x.shape[-2] != self.number_of_nodes:
            raise ValueError(
                f"AGCRN expects X (..., N={self.number_of_nodes}, F); got "
                f"shape {tuple(x.shape)}."
            )
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        gate = AVWGCN(2 * C, self.K, self.embedding_dimensions,
                      topk=self.topk, name="gate")
        update = AVWGCN(C, self.K, self.embedding_dimensions,
                        topk=self.topk, name="update")
        xh = jnp.concatenate([x, h], axis=-1)
        z, r = jnp.split(nn.sigmoid(gate(xh, e)), 2, axis=-1)
        hc = nn.tanh(update(jnp.concatenate([x, z * h], axis=-1), e))
        return r * h + (1.0 - r) * hc
