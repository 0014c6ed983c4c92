"""MPNN-LSTM for pandemic forecasting.

Capability parity with reference ``nn/recurrent/mpnn_lstm.py:7-105``
(Panagopoulos et al., arXiv 2009.08388).  Input X is (window·N, F) with the
window folded into the node axis, exactly like the reference; output is
(N·B?, 2·hidden + in_channels + window − 1).

BatchNorm carries running statistics in the 'batch_stats' collection; pass
``train=True`` during training (and make 'batch_stats' mutable).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import GCNConv


class MPNNLSTM(nn.Module):
    hidden_size: int
    num_nodes: int
    window: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, graph: Graph, train: bool = False):
        nhid, w, n = self.hidden_size, self.window, self.num_nodes
        in_ch = x.shape[-1]

        # skip connection S: full features of period 0 + last channel of
        # later periods (reference `:77-87`)
        s = x.reshape(-1, w, n, in_ch).swapaxes(1, 2).reshape(-1, w, in_ch)
        parts = [s[:, 0, :]] + [s[:, l, in_ch - 1 : in_ch] for l in range(1, w)]
        s = jnp.concatenate(parts, axis=1)  # (B·N, F + w - 1)

        def gconv(name, h_in):
            out = nn.relu(GCNConv(nhid, name=f"conv_{name}")(h_in, graph))
            out = nn.BatchNorm(
                use_running_average=not train, name=f"bn_{name}"
            )(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
            return out

        h1 = gconv("1", x)
        h2 = gconv("2", h1)
        hcat = jnp.concatenate([h1, h2], axis=-1)  # (w·N, 2·nhid)

        # fold window back out as the LSTM time axis (reference `:93-96`)
        seq = hcat.reshape(-1, w, n, 2 * nhid).swapaxes(0, 1).reshape(w, -1, 2 * nhid)

        def run_lstm(name, inputs, features):
            cell = nn.OptimizedLSTMCell(features=features, name=name)
            bn = inputs.shape[1]
            carry = (
                jnp.zeros((bn, features), inputs.dtype),
                jnp.zeros((bn, features), inputs.dtype),
            )
            outs = []
            for t in range(inputs.shape[0]):
                carry, out = cell(carry, inputs[t])
                outs.append(out)
            return jnp.stack(outs), carry[1]  # (w, B·N, C), final h

        seq1, h_1 = run_lstm("lstm_1", seq, nhid)
        _, h_2 = run_lstm("lstm_2", seq1, nhid)
        return jnp.concatenate([h_1, h_2, s], axis=1)
