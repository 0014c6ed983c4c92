"""DyGrEncoder: gated graph convolution + LSTM over node embeddings.

Capability parity with reference ``nn/recurrent/dygrae.py:6-88`` (IEEE
9073186).  The torch ``nn.LSTM`` (seq-len 1 per call, ``lstm_num_layers``
stacked layers) becomes a stack of flax ``LSTMCell``s with the (H, C) state
carried explicitly by the caller; state shapes are (L, N, C) — or (N, C)
when ``lstm_num_layers == 1``, matching the reference's squeezed returns.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import GatedGraphConv


class DyGrEncoder(nn.Module):
    """forward: (X, graph, H=None, C=None) -> (H_tilde, H, C)."""

    conv_out_channels: int
    conv_num_layers: int
    conv_aggr: str
    lstm_out_channels: int
    lstm_num_layers: int

    @nn.compact
    def __call__(self, x, graph: Graph, h: Optional[jnp.ndarray] = None,
                 c: Optional[jnp.ndarray] = None):
        if self.conv_aggr not in ("mean", "add", "max"):
            raise ValueError("Wrong aggregator.")
        if (h is None) != (c is None):
            raise ValueError("Invalid hidden state and cell matrices.")
        conv = GatedGraphConv(
            self.conv_out_channels, self.conv_num_layers, self.conv_aggr,
            name="conv_layer",
        )
        h_tilde = conv(x, graph)

        L = self.lstm_num_layers
        n = x.shape[-2]
        squeeze = False
        if h is None:
            h = jnp.zeros((L, n, self.lstm_out_channels), x.dtype)
            c = jnp.zeros((L, n, self.lstm_out_channels), x.dtype)
        elif h.ndim == 2:  # single-layer squeezed state
            squeeze = True
            h, c = h[None], c[None]
        hs, cs = [], []
        inp = h_tilde
        for layer in range(L):
            cell = nn.OptimizedLSTMCell(
                features=self.lstm_out_channels, name=f"lstm_{layer}"
            )
            (c_new, h_new), inp = cell((c[layer], h[layer]), inp)
            hs.append(h_new)
            cs.append(c_new)
        h_out = jnp.stack(hs)
        c_out = jnp.stack(cs)
        if squeeze or L == 1:
            h_out, c_out = h_out[0], c_out[0]
        return inp, h_out, c_out
