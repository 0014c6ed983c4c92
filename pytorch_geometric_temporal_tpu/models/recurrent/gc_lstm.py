"""GC-LSTM: graph convolution embedded LSTM for dynamic link prediction.

Capability parity with reference ``nn/recurrent/gc_lstm.py:9-205``
(Chen et al., arXiv 1812.04206): X enters each gate through a dense matmul
W_*, only the hidden state H is graph-convolved (ChebConv).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import cheb_basis, glorot, zeros


class GCLSTM(nn.Module):
    """forward: (X, graph, H=None, C=None, lambda_max=None) -> (H, C)."""

    out_channels: int
    K: int
    normalization: str = "sym"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph, h: Optional[jnp.ndarray] = None,
                 c: Optional[jnp.ndarray] = None, lambda_max=None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        if c is None:
            c = jnp.zeros(x.shape[:-1] + (C,), x.dtype)

        bh = cheb_basis(graph, h, self.K, self.normalization, lambda_max)

        def gate(name):
            wx = self.param(f"W_{name}", glorot, (x.shape[-1], C))
            wh = self.param(f"w_conv_{name}", glorot, (bh.shape[-1], C))
            out = jnp.matmul(x, wx, preferred_element_type=x.dtype)
            out = out + jnp.matmul(bh, wh, preferred_element_type=x.dtype)
            if self.use_bias:
                out = out + self.param(f"b_conv_{name}", zeros, (C,))
            return out + self.param(f"b_{name}", zeros, (1, C))

        i = nn.sigmoid(gate("i"))
        f = nn.sigmoid(gate("f"))
        c_new = f * c + i * nn.tanh(gate("c"))
        o = nn.sigmoid(gate("o"))
        h_new = o * nn.tanh(c_new)
        return h_new, c_new
