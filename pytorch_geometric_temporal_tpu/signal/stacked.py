"""Device-resident stacked signals: the scan-ready training pipeline.

This is the TPU-native replacement for iterating snapshots in Python
(reference training loops, e.g. ``examples/recurrent/gconvgru_example.py:38-46``):
the whole sequence is stacked into device arrays once, and an epoch becomes
one ``lax.scan`` inside a single jitted step — no per-snapshot dispatch, no
host↔device traffic, O(1) memory in T via optional rematerialization.

``StackedSignal.from_signal`` consumes any of the six homogeneous signal
iterators; dynamic graphs become (T, E_pad) stacked edge arrays (already
padded to a common E_pad by the signal layer).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import Graph
from .snapshot import convert_array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["features", "targets", "senders", "receivers", "weights",
                 "additional", "batches"],
    meta_fields=["num_nodes", "num_edges", "graph_dynamic"],
)
@dataclasses.dataclass(frozen=True)
class StackedSignal:
    """Whole temporal signal as stacked device arrays.

    features: (T, N, F) — static-signal variants are broadcast over T.
    targets:  (T, ...)
    senders/receivers/weights: (E,) when the graph is static, (T, E) when
        dynamic (padded to a common E).
    additional: dict of (T, ...) stacked extra features.
    batches: node→graph assignment from the *Batch signal variants — (N,)
        for a static graph, (T, N) when dynamic; None for plain signals.
        When present, ``scan``'s step receives it as a 5th argument.
    """

    features: jnp.ndarray
    targets: jnp.ndarray
    senders: jnp.ndarray
    receivers: jnp.ndarray
    weights: jnp.ndarray
    additional: Dict[str, jnp.ndarray]
    num_nodes: int
    num_edges: int
    graph_dynamic: bool
    batches: Optional[jnp.ndarray] = None

    # ------------------------------------------------------------------

    @property
    def snapshot_count(self) -> int:
        return self.targets.shape[0]

    def graph(self, t: Optional[int] = None) -> Graph:
        """The static graph, or (for dynamic graphs) the graph at step t."""
        if not self.graph_dynamic:
            return Graph(self.senders, self.receivers, self.weights,
                         self.num_nodes, self.num_edges)
        return Graph(self.senders[t], self.receivers[t], self.weights[t],
                     self.num_nodes, self.num_edges)

    @staticmethod
    def from_signal(signal) -> "StackedSignal":
        """Stack any homogeneous signal iterator into device arrays."""
        T = signal.snapshot_count
        feats = np.stack(
            [np.asarray(signal._raw_features(t)) for t in range(T)]
        )
        targets = np.stack(
            [np.asarray(signal._raw_targets(t)) for t in range(T)]
        )
        additional = {
            key: np.stack([np.asarray(getattr(signal, key)[t]) for t in range(T)])
            for key in signal.additional_feature_keys
        }
        graph_dynamic = bool(getattr(signal, "_graph_dynamic", False))
        if graph_dynamic:
            graphs = [signal._graph_at(t) for t in range(T)]
            senders = jnp.stack([g.senders for g in graphs])
            receivers = jnp.stack([g.receivers for g in graphs])
            weights = jnp.stack([g.masked_weights() for g in graphs])
            num_nodes = graphs[0].num_nodes
            num_edges = max(g.num_edges for g in graphs)
        else:
            g = signal._graph_at(0)
            senders, receivers, weights = g.senders, g.receivers, g.weights
            num_nodes, num_edges = g.num_nodes, g.num_edges
        batches = None
        if getattr(signal, "_has_batch", False):
            if graph_dynamic:
                batches = convert_array(
                    np.stack([np.asarray(signal._raw_batch(t))
                              for t in range(T)])
                )
            else:
                batches = convert_array(np.asarray(signal._raw_batch(0)))
        return StackedSignal(
            batches=batches,
            features=convert_array(feats),
            targets=convert_array(targets),
            senders=senders,
            receivers=receivers,
            weights=weights,
            additional={k: convert_array(v) for k, v in additional.items()},
            num_nodes=num_nodes,
            num_edges=num_edges,
            graph_dynamic=graph_dynamic,
        )

    @staticmethod
    def from_arrays(features, targets, edge_indices, edge_weights=None,
                    num_nodes: Optional[int] = None) -> "StackedSignal":
        """Raw arrays straight to a scan-ready signal — no signal-iterator
        or manual ``pad_graphs`` step.

        ``edge_indices``: one (2, E) array for a static graph, or a
        length-T sequence of ragged (2, E_t) arrays for a dynamic graph —
        per-step edge lists are padded to a common maximum internally.
        ``edge_weights`` matches (None means unit weights).  ``features``
        is (T, N, ...) and ``targets`` (T, ...).
        """
        from ..ops.graph import Graph, pad_graphs

        feats = np.asarray(features)
        targs = np.asarray(targets)
        T = feats.shape[0]
        if targs.shape[0] != T:
            raise ValueError(
                f"features have {T} steps but targets have {targs.shape[0]}"
            )
        dynamic = not (
            hasattr(edge_indices, "ndim") and np.asarray(edge_indices).ndim == 2
        )
        if num_nodes is None:
            num_nodes = feats.shape[1]
        if dynamic:
            if len(edge_indices) != T:
                raise ValueError(
                    f"dynamic edge list has {len(edge_indices)} steps, "
                    f"features have {T}"
                )
            graphs = [
                Graph.from_edge_index(
                    ei,
                    None if edge_weights is None else edge_weights[t],
                    num_nodes=num_nodes,
                )
                for t, ei in enumerate(edge_indices)
            ]
            graphs = pad_graphs(graphs)
            senders = jnp.stack([g.senders for g in graphs])
            receivers = jnp.stack([g.receivers for g in graphs])
            weights = jnp.stack([g.masked_weights() for g in graphs])
            num_edges = max(g.num_edges for g in graphs)
        else:
            g = Graph.from_edge_index(edge_indices, edge_weights,
                                      num_nodes=num_nodes)
            senders, receivers, weights = g.senders, g.receivers, g.weights
            num_edges = g.num_edges
        return StackedSignal(
            features=convert_array(feats),
            targets=convert_array(targs),
            senders=senders,
            receivers=receivers,
            weights=weights,
            additional={},
            num_nodes=int(num_nodes),
            num_edges=int(num_edges),
            graph_dynamic=dynamic,
        )

    # ------------------------------------------------------------------

    def scan(self, step: Callable, init_carry, unroll: int = 1):
        """``lax.scan`` ``step(carry, x_t, y_t, graph_t) -> (carry, out)``
        over all snapshots.  Jit-safe; graph arrays ride the scan when the
        graph is dynamic and are closed over (hoisted) when static.

        For *Batch signals (``batches is not None``) the step instead takes
        ``step(carry, x_t, y_t, graph_t, batch_t)``; a static batch vector is
        hoisted like the static graph.
        """
        has_batch = self.batches is not None
        if self.graph_dynamic:
            xs = (self.features, self.targets, self.senders, self.receivers,
                  self.weights)
            if has_batch:
                xs = xs + (self.batches,)

            def body(carry, x):
                if has_batch:
                    f, y, s, r, w, b = x
                else:
                    f, y, s, r, w = x
                g = Graph(s, r, w, self.num_nodes, self.num_edges)
                if has_batch:
                    return step(carry, f, y, g, b)
                return step(carry, f, y, g)

        else:
            xs = (self.features, self.targets)
            g_static = self.graph()
            b_static = self.batches

            def body(carry, x):
                f, y = x
                if has_batch:
                    return step(carry, f, y, g_static, b_static)
                return step(carry, f, y, g_static)

        return jax.lax.scan(body, init_carry, xs, unroll=unroll)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x_dicts", "y_dicts", "edge_senders", "edge_receivers",
                 "edge_weights", "batch_dicts"],
    meta_fields=["edge_meta", "graph_dynamic"],
)
@dataclasses.dataclass(frozen=True)
class StackedHeteroSignal:
    """Whole heterogeneous temporal signal as stacked device arrays.

    x_dicts / y_dicts: {node_type: (T, n_t, ...)}.
    edge_*: {edge_type: (E,) or (T, E)} arrays; ``edge_meta`` maps each edge
    type to (num_nodes_dst, num_edges, num_src).
    batch_dicts: {node_type: (n_t,) or (T, n_t)} node→graph assignment from
    the hetero *Batch variants (empty dict for plain signals).  When
    non-empty, ``scan``'s step receives it as a 5th argument.

    Requires every step to carry the same node/edge-type keys (the hetero
    None-skipping semantics are an iterator-level feature; stacking needs
    uniform presence).
    """

    x_dicts: Dict[str, jnp.ndarray]
    y_dicts: Dict[str, jnp.ndarray]
    edge_senders: Dict[tuple, jnp.ndarray]
    edge_receivers: Dict[tuple, jnp.ndarray]
    edge_weights: Dict[tuple, jnp.ndarray]
    edge_meta: tuple  # sorted ((edge_type, (n_dst, n_edges, n_src)), ...)
    graph_dynamic: bool
    batch_dicts: Dict[str, jnp.ndarray] = dataclasses.field(
        default_factory=dict
    )

    @property
    def _meta(self) -> dict:
        return dict(self.edge_meta)

    @property
    def snapshot_count(self) -> int:
        return next(iter(self.y_dicts.values())).shape[0]

    def edge_graphs(self, t: Optional[int] = None):
        out = {}
        meta = self._meta
        for k in self.edge_senders:
            n_dst, n_edges, n_src = meta[k]
            if self.graph_dynamic:
                out[k] = Graph(
                    self.edge_senders[k][t], self.edge_receivers[k][t],
                    self.edge_weights[k][t], n_dst, n_edges, n_src,
                )
            else:
                out[k] = Graph(
                    self.edge_senders[k], self.edge_receivers[k],
                    self.edge_weights[k], n_dst, n_edges, n_src,
                )
        return out

    @staticmethod
    def from_signal(signal) -> "StackedHeteroSignal":
        T = signal.snapshot_count
        snaps = [signal[t] for t in range(T)]
        keys_x = set(snaps[0].x_dict)
        keys_y = set(snaps[0].y_dict)
        for s in snaps:
            if set(s.x_dict) != keys_x or set(s.y_dict) != keys_y:
                raise ValueError(
                    "StackedHeteroSignal requires uniform node-type keys "
                    "across all snapshots"
                )
        x_dicts = {
            nt: jnp.stack([s.x_dict[nt] for s in snaps]) for nt in keys_x
        }
        y_dicts = {
            nt: jnp.stack([s.y_dict[nt] for s in snaps]) for nt in keys_y
        }
        graph_dynamic = bool(getattr(signal, "_graph_dynamic", False))
        g0 = snaps[0].edge_graphs
        senders, receivers, weights, meta = {}, {}, {}, {}
        for k, g in g0.items():
            meta[k] = (g.num_nodes, max(s.edge_graphs[k].num_edges
                                        for s in snaps) if graph_dynamic
                       else g.num_edges, g.num_src)
            if graph_dynamic:
                senders[k] = jnp.stack([s.edge_graphs[k].senders for s in snaps])
                receivers[k] = jnp.stack(
                    [s.edge_graphs[k].receivers for s in snaps]
                )
                weights[k] = jnp.stack(
                    [s.edge_graphs[k].masked_weights() for s in snaps]
                )
            else:
                senders[k], receivers[k], weights[k] = (
                    g.senders, g.receivers, g.weights
                )
        batch_dicts = {}
        if snaps[0].batch_dict:
            keys_b = set(snaps[0].batch_dict)
            if graph_dynamic:
                batch_dicts = {
                    nt: jnp.stack([s.batch_dict[nt] for s in snaps])
                    for nt in keys_b
                }
            else:
                batch_dicts = dict(snaps[0].batch_dict)
        return StackedHeteroSignal(
            x_dicts=x_dicts, y_dicts=y_dicts, edge_senders=senders,
            edge_receivers=receivers, edge_weights=weights,
            edge_meta=tuple(sorted(meta.items())),
            graph_dynamic=graph_dynamic,
            batch_dicts=batch_dicts,
        )

    def scan(self, step: Callable, init_carry, unroll: int = 1):
        """``step(carry, x_dict, y_dict, edge_graphs) -> (carry, out)``
        scanned over all snapshots.  For hetero *Batch signals
        (``batch_dicts`` non-empty) the step instead takes
        ``step(carry, x_dict, y_dict, edge_graphs, batch_dict)``."""
        has_batch = bool(self.batch_dicts)
        if self.graph_dynamic:
            xs = (self.x_dicts, self.y_dicts, self.edge_senders,
                  self.edge_receivers, self.edge_weights)
            if has_batch:
                xs = xs + (self.batch_dicts,)

            meta = self._meta

            def body(carry, x):
                if has_batch:
                    xd, yd, es, er, ew, bd = x
                else:
                    xd, yd, es, er, ew = x
                graphs = {
                    k: Graph(es[k], er[k], ew[k], *meta[k][:2], meta[k][2])
                    for k in es
                }
                if has_batch:
                    return step(carry, xd, yd, graphs, bd)
                return step(carry, xd, yd, graphs)

        else:
            xs = (self.x_dicts, self.y_dicts)
            graphs = self.edge_graphs()
            bd_static = self.batch_dicts

            def body(carry, x):
                xd, yd = x
                if has_batch:
                    return step(carry, xd, yd, graphs, bd_static)
                return step(carry, xd, yd, graphs)

        return jax.lax.scan(body, init_carry, xs, unroll=unroll)
