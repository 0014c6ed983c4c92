"""HeteroGCLSTM: graph-convolutional LSTM over heterogeneous graphs.

Capability parity with reference ``nn/hetero/heterogclstm.py:7-183``.
Typed edges arrive as a dict ``{(src_type, rel, dst_type): Graph}`` with
bipartite (rectangular) Graphs built via ``Graph.from_edge_index(...,
num_src=...)`` — the static-shape TPU stand-in for PyG's
``edge_index_dict``.  Per edge type a SAGEConv (mean aggregation) runs over
the hidden states and results are summed into the destination type (PyG
``HeteroConv`` default 'sum' aggregation); per node type dense W_*/b_* act
on the inputs.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import SAGEConv, glorot


class HeteroGCLSTM(nn.Module):
    """forward: (x_dict, edge_graphs, h_dict=None, c_dict=None) -> (h, c)."""

    in_channels_dict: Dict[str, int]
    out_channels: int
    metadata: Tuple  # (node_types, edge_types) — edge_types are 3-tuples

    @nn.compact
    def __call__(self, x_dict, edge_graphs: Dict[Tuple[str, str, str], Graph],
                 h_dict=None, c_dict=None):
        C = self.out_channels
        node_types = list(self.in_channels_dict)
        if h_dict is None:
            h_dict = {
                nt: jnp.zeros(x.shape[:-1] + (C,), x.dtype)
                for nt, x in x_dict.items()
            }
        if c_dict is None:
            c_dict = {
                nt: jnp.zeros(x.shape[:-1] + (C,), x.dtype)
                for nt, x in x_dict.items()
            }

        def hetero_conv(gate: str):
            """Sum per-edge-type SAGEConv(h) into each destination type."""
            out = {nt: 0.0 for nt in node_types}
            for et in self.metadata[1]:
                src, rel, dst = et
                if et not in edge_graphs:
                    continue
                conv = SAGEConv(
                    C, name=f"conv_{gate}_{src}__{rel}__{dst}"
                )
                out[dst] = out[dst] + conv(
                    h_dict[src], edge_graphs[et], x_dst=h_dict[dst]
                )
            return out

        def gate(name, activation):
            conv = hetero_conv(name)
            res = {}
            for nt in node_types:
                w = self.param(
                    f"W_{name}_{nt}", glorot,
                    (self.in_channels_dict[nt], C),
                )
                b = self.param(f"b_{name}_{nt}", glorot, (1, C))
                res[nt] = activation(
                    jnp.matmul(x_dict[nt], w) + conv[nt] + b
                )
            return res

        i = gate("i", nn.sigmoid)
        f = gate("f", nn.sigmoid)
        t = gate("c", nn.tanh)
        c_new = {nt: f[nt] * c_dict[nt] + i[nt] * t[nt] for nt in node_types}
        o = gate("o", nn.sigmoid)
        h_new = {nt: o[nt] * nn.tanh(c_new[nt]) for nt in node_types}
        return h_new, c_new
