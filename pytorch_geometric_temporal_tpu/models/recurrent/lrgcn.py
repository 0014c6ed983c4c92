"""LRGCN: relational GCN LSTM for path-failure prediction.

Capability parity with reference ``nn/recurrent/lrgcn.py:7-169`` (Li et al.,
arXiv 1905.03994).  Relations are passed as a sequence of :class:`Graph`
objects (one per relation) — the static-shape TPU stand-in for the
reference's ``(edge_index, edge_type)`` pair.  Use
:func:`split_relations` to build them host-side.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...ops.graph import Graph
from ..conv import RGCNConv


def split_relations(edge_index, edge_type, num_relations, num_nodes,
                    edge_weight=None):
    """Host-side: split a typed edge list into per-relation padded Graphs."""
    edge_index = np.asarray(edge_index)
    edge_type = np.asarray(edge_type)
    graphs = []
    pad = 0
    per_rel = []
    for r in range(num_relations):
        m = edge_type == r
        per_rel.append((edge_index[:, m],
                        None if edge_weight is None else np.asarray(edge_weight)[m]))
        pad = max(pad, int(m.sum()))
    for ei, ew in per_rel:
        graphs.append(
            Graph.from_edge_index(ei, ew, num_nodes=num_nodes, pad_to=max(pad, 1))
        )
    return graphs


class LRGCN(nn.Module):
    """forward: (X, rel_graphs, H=None, C=None) -> (H, C)."""

    out_channels: int
    num_relations: int
    num_bases: Optional[int] = None

    @nn.compact
    def __call__(self, x, rel_graphs: Sequence[Graph],
                 h: Optional[jnp.ndarray] = None,
                 c: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C = self.out_channels
        if h is None:
            h = jnp.zeros(x.shape[:-1] + (C,), x.dtype)
        if c is None:
            c = jnp.zeros(x.shape[:-1] + (C,), x.dtype)

        def pair(name):
            cx = RGCNConv(C, self.num_relations, self.num_bases,
                          name=f"conv_x_{name}")
            ch = RGCNConv(C, self.num_relations, self.num_bases,
                          name=f"conv_h_{name}")
            return cx(x, rel_graphs) + ch(h, rel_graphs)

        i = nn.sigmoid(pair("i"))
        f = nn.sigmoid(pair("f"))
        c_new = f * c + i * nn.tanh(pair("c"))
        o = nn.sigmoid(pair("o"))
        return o * nn.tanh(c_new), c_new
