"""EvolveGCN-O and EvolveGCN-H: GCNs whose weights evolve through a GRU.

Capability parity with reference ``nn/recurrent/evolvegcno.py:13-191`` and
``nn/recurrent/evolvegcnh.py:8-102`` (Pareja et al., arXiv 1902.10191).

The reference keeps the evolved weight as *mutable module state* persisting
across forward calls (``evolvegcno.py:186-189``) with a
``reinitialize_weight()`` reset.  In this functional framework the weight is
explicit carried state: pass ``weight=None`` for the first step (the learned
initial weight is used) and thread the returned weight through subsequent
steps — jit/scan-safe with no hidden mutation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.graph import Graph
from ..conv import gcn_conv_fixed_w, glorot, topk_pool


class _WeightGRU(nn.Module):
    """GRU over the rows of the (C, C) weight matrix (rows = GRU batch)."""

    features: int

    @nn.compact
    def __call__(self, carry, inputs):
        cell = nn.GRUCell(features=self.features, name="cell")
        new, _ = cell(carry, inputs)
        return new


class EvolveGCNO(nn.Module):
    """forward: (X, graph, weight=None) -> (X', weight).

    The GRU input and hidden state are both the previous weight
    (``evolvegcno.py:186-189``).
    """

    in_channels: int
    improved: bool = False
    normalize: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph,
                 weight: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C = self.in_channels
        w0 = self.param("initial_weight", glorot, (C, C))
        prev = w0 if weight is None else weight
        new_w = _WeightGRU(C, name="recurrent")(prev, prev)
        out = gcn_conv_fixed_w(
            x, graph, new_w, improved=self.improved,
            add_self_loops=self.add_self_loops, normalize=self.normalize,
        )
        return out, new_w


class EvolveGCNOSeq(nn.Module):
    """EvolveGCN-O scanned over a snapshot sequence with weight carry.

    forward: (xs (T, N, F), graph) -> (T, N, F).  ``graph`` is one of

    - a static :class:`Graph`,
    - a stacked dynamic graph (edge arrays (T, E), ``ops.stack_graphs``)
      — aggregation runs the segment path per step, or
    - a stacked **prenormalized BCSR operator**
      (``ops.operators.stack_bcsr_gcn(graphs)``) — the tiled Pallas
      kernel serves every step of a LARGE dynamic-edge sequence
      (construct the Seq with ``normalize=False``: normalization is
      baked into the tiles host-side).

    Step 0 runs with ``weight=None`` (the learned initial weight,
    reference ``evolvegcno.py:186-189``); the evolved weight then threads
    through a ``lax.scan`` — the functional equivalent of the reference's
    persistent module state.
    """

    in_channels: int
    improved: bool = False
    normalize: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, xs, graph):
        import jax

        from ...ops.bcsr import BCSRMatrix
        from ...ops.graph import Graph as G

        cell = EvolveGCNO(self.in_channels, self.improved, self.normalize,
                          self.add_self_loops, name="cell")
        if isinstance(graph, BCSRMatrix):
            if self.normalize:
                raise ValueError(
                    "EvolveGCNOSeq over a stacked BCSR operator needs "
                    "normalize=False — the GCN normalization is baked "
                    "into the tiles by ops.operators.stack_bcsr_gcn"
                )
            g0 = jax.tree_util.tree_map(lambda a: a[0], graph)
            out0, w_carry = cell(xs[0], g0, None)

            def step_op(c, carry, xt_g):
                xt, g = xt_g
                out, new_w = c(xt, g, carry)
                return new_w, out

            scan = nn.scan(
                step_op,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            rest_ops = jax.tree_util.tree_map(lambda a: a[1:], graph)
            _, outs = scan(cell, w_carry, (xs[1:], rest_ops))
            return jnp.concatenate([out0[None], outs], axis=0)
        dynamic = graph.senders.ndim == 2

        def graph_at(t_arrays):
            s, r, w = t_arrays
            return G(s, r, w, graph.num_nodes, graph.num_edges)

        g0 = graph_at((graph.senders[0], graph.receivers[0],
                       graph.weights[0])) if dynamic else graph
        out0, w_carry = cell(xs[0], g0, None)

        def step(c, carry, xt_and_g):
            if dynamic:
                xt, s, r, w = xt_and_g
                g = graph_at((s, r, w))
            else:
                xt = xt_and_g
                g = graph
            out, new_w = c(xt, g, carry)
            return new_w, out

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        if dynamic:
            rest = (xs[1:], graph.senders[1:], graph.receivers[1:],
                    graph.weights[1:])
        else:
            rest = xs[1:]
        _, outs = scan(cell, w_carry, rest)
        return jnp.concatenate([out0[None], outs], axis=0)


class EvolveGCNH(nn.Module):
    """forward: (X, graph, weight=None) -> (X', weight).

    Top-k pooling summarizes X into exactly ``in_channels`` rows
    (ratio = C/N, ``evolvegcnh.py:61-63``) which drive the weight GRU.
    """

    num_of_nodes: int
    in_channels: int
    improved: bool = False
    normalize: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, x, graph: Graph,
                 weight: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        C = self.in_channels
        w0 = self.param("initial_weight", glorot, (C, C))
        p = self.param("pool_score", glorot, (x.shape[-1], 1))[:, 0]
        ratio = C / self.num_of_nodes
        x_tilde, _ = topk_pool(x, p, ratio)
        prev = w0 if weight is None else weight
        new_w = _WeightGRU(C, name="recurrent")(prev, x_tilde)
        out = gcn_conv_fixed_w(
            x, graph, new_w, improved=self.improved,
            add_self_loops=self.add_self_loops, normalize=self.normalize,
        )
        return out, new_w


class EvolveGCNHSeq(nn.Module):
    """EvolveGCN-H scanned over a snapshot sequence with weight carry.

    forward: (xs (T, N, F), graph) -> (T, N, F) — the H-variant analogue
    of :class:`EvolveGCNOSeq` (each step's top-k pooled features drive
    the weight GRU, ``evolvegcnh.py:61-76``).  ``graph`` is a static
    :class:`Graph`, a stacked dynamic graph (``ops.stack_graphs``), or a
    stacked prenormalized BCSR operator
    (``ops.operators.stack_bcsr_gcn`` + ``normalize=False``).
    """

    num_of_nodes: int
    in_channels: int
    improved: bool = False
    normalize: bool = True
    add_self_loops: bool = True

    @nn.compact
    def __call__(self, xs, graph):
        import jax

        from ...ops.bcsr import BCSRMatrix
        from ...ops.graph import Graph as G

        cell = EvolveGCNH(self.num_of_nodes, self.in_channels,
                          self.improved, self.normalize,
                          self.add_self_loops, name="cell")
        if isinstance(graph, BCSRMatrix):
            if self.normalize:
                raise ValueError(
                    "EvolveGCNHSeq over a stacked BCSR operator needs "
                    "normalize=False — the GCN normalization is baked "
                    "into the tiles by ops.operators.stack_bcsr_gcn"
                )
            g0 = jax.tree_util.tree_map(lambda a: a[0], graph)
            out0, w_carry = cell(xs[0], g0, None)

            def step_op(c, carry, xt_g):
                xt, g = xt_g
                out, new_w = c(xt, g, carry)
                return new_w, out

            scan = nn.scan(
                step_op,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )
            rest_ops = jax.tree_util.tree_map(lambda a: a[1:], graph)
            _, outs = scan(cell, w_carry, (xs[1:], rest_ops))
            return jnp.concatenate([out0[None], outs], axis=0)
        dynamic = graph.senders.ndim == 2

        def graph_at(t_arrays):
            s, r, w = t_arrays
            return G(s, r, w, graph.num_nodes, graph.num_edges)

        g0 = graph_at((graph.senders[0], graph.receivers[0],
                       graph.weights[0])) if dynamic else graph
        out0, w_carry = cell(xs[0], g0, None)

        def step(c, carry, xt_and_g):
            if dynamic:
                xt, s, r, w = xt_and_g
                g = graph_at((s, r, w))
            else:
                xt = xt_and_g
                g = graph
            out, new_w = c(xt, g, carry)
            return new_w, out

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        if dynamic:
            rest = (xs[1:], graph.senders[1:], graph.receivers[1:],
                    graph.weights[1:])
        else:
            rest = xs[1:]
        _, outs = scan(cell, w_carry, rest)
        return jnp.concatenate([out0[None], outs], axis=0)
