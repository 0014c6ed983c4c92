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
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import Graph
from .snapshot import convert_array


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["features", "targets", "senders", "receivers", "weights",
                 "additional"],
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
        return StackedSignal(
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

    # ------------------------------------------------------------------

    def scan(self, step: Callable, init_carry, unroll: int = 1):
        """``lax.scan`` ``step(carry, x_t, y_t, graph_t) -> (carry, out)``
        over all snapshots.  Jit-safe; graph arrays ride the scan when the
        graph is dynamic and are closed over (hoisted) when static.
        """
        if self.graph_dynamic:
            xs = (self.features, self.targets, self.senders, self.receivers,
                  self.weights)

            def body(carry, x):
                f, y, s, r, w = x
                g = Graph(s, r, w, self.num_nodes, self.num_edges)
                return step(carry, f, y, g)

        else:
            xs = (self.features, self.targets)
            g_static = self.graph()

            def body(carry, x):
                f, y = x
                return step(carry, f, y, g_static)

        return jax.lax.scan(body, init_carry, xs, unroll=unroll)
