"""Snapshot pytrees — the framework's counterpart of PyG ``Data``/``HeteroData``.

A snapshot bundles one time step's node features, graph, targets, optional
batch vector and additional feature arrays as jnp arrays.  Being a pytree it
passes straight into jitted train steps (the reference converts numpy →
torch per access, ``signal/static_graph_temporal_signal.py:62-101``).

Dtype rule (parity with reference ``:84-87``): float arrays → float32,
int arrays → int32.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import Graph


def convert_array(value):
    """numpy → jnp with the reference dtype rule; None passes through."""
    if value is None:
        return None
    arr = np.asarray(value)
    if arr.dtype.kind == "i" or arr.dtype.kind == "u":
        return jnp.asarray(arr, dtype=jnp.int32)
    if arr.dtype.kind == "f":
        return jnp.asarray(arr, dtype=jnp.float32)
    return jnp.asarray(arr)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "graph", "y", "batch", "additional"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Snapshot:
    """One homogeneous temporal snapshot (≈ PyG ``Data``)."""

    x: Optional[jnp.ndarray] = None
    graph: Optional[Graph] = None
    y: Optional[jnp.ndarray] = None
    batch: Optional[jnp.ndarray] = None
    additional: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def edge_index(self):
        if self.graph is None:
            return None
        return jnp.stack([self.graph.senders, self.graph.receivers])

    @property
    def edge_attr(self):
        return None if self.graph is None else self.graph.weights

    @property
    def edge_weight(self):
        return self.edge_attr

    def __getattr__(self, name):
        add = object.__getattribute__(self, "additional")
        if name in add:
            return add[name]
        raise AttributeError(name)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x_dict", "edge_graphs", "y_dict", "batch_dict", "additional"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class HeteroSnapshot:
    """One heterogeneous snapshot (≈ PyG ``HeteroData``).

    ``edge_graphs`` maps edge-type tuples (src, rel, dst) to bipartite
    :class:`Graph` objects; ``x_dict``/``y_dict`` map node types to arrays.
    """

    x_dict: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    edge_graphs: Dict[Tuple[str, str, str], Graph] = dataclasses.field(
        default_factory=dict
    )
    y_dict: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    batch_dict: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)
    additional: Dict[str, Dict[str, Any]] = dataclasses.field(default_factory=dict)

    @property
    def edge_index_dict(self):
        return {
            k: jnp.stack([g.senders, g.receivers])
            for k, g in self.edge_graphs.items()
        }

    @property
    def edge_weight_dict(self):
        return {k: g.weights for k, g in self.edge_graphs.items()}
