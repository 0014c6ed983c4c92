"""The six homogeneous temporal-signal iterator classes.

API parity with the reference signal layer (constructor signatures and
iteration semantics match):

- ``StaticGraphTemporalSignal``        ← ``signal/static_graph_temporal_signal.py:14-134``
- ``DynamicGraphTemporalSignal``       ← ``signal/dynamic_graph_temporal_signal.py:14``
- ``DynamicGraphStaticSignal``         ← ``signal/dynamic_graph_static_signal.py:14``
- ``StaticGraphTemporalSignalBatch``   ← ``signal/static_graph_temporal_signal_batch.py:15``
- ``DynamicGraphTemporalSignalBatch``  ← ``signal/dynamic_graph_temporal_signal_batch.py``
- ``DynamicGraphStaticSignalBatch``    ← ``signal/dynamic_graph_static_signal_batch.py``

Snapshots are :class:`~.snapshot.Snapshot` pytrees (jnp arrays on device)
instead of PyG ``Data``/``Batch`` objects; the ``batch`` node→graph index
vector plays the role of PyG ``Batch.batch``.
"""

from __future__ import annotations

from .base import HomoSignalMixin


class StaticGraphTemporalSignal(HomoSignalMixin):
    """Static graph, temporal features and targets."""

    _graph_dynamic = False
    _signal_static = False
    _has_batch = False

    def __init__(self, edge_index, edge_weight, features, targets, **kwargs):
        self.edge_index = edge_index
        self.edge_weight = edge_weight
        self.features = features
        self.targets = targets
        self._init_common(kwargs)

    def _slice(self, s: slice):
        return StaticGraphTemporalSignal(
            self.edge_index,
            self.edge_weight,
            self.features[s],
            self.targets[s],
            **self._slice_kwargs(s),
        )


class DynamicGraphTemporalSignal(HomoSignalMixin):
    """Per-step edge lists and weights, temporal features and targets."""

    _graph_dynamic = True
    _signal_static = False
    _has_batch = False

    def __init__(self, edge_indices, edge_weights, features, targets, **kwargs):
        self.edge_indices = edge_indices
        self.edge_weights = edge_weights
        self.features = features
        self.targets = targets
        self._init_common(kwargs)

    def _slice(self, s: slice):
        return DynamicGraphTemporalSignal(
            self.edge_indices[s],
            self.edge_weights[s],
            self.features[s],
            self.targets[s],
            **self._slice_kwargs(s),
        )


class DynamicGraphStaticSignal(HomoSignalMixin):
    """Per-step edges; one shared node feature matrix."""

    _graph_dynamic = True
    _signal_static = True
    _has_batch = False

    def __init__(self, edge_indices, edge_weights, feature, targets, **kwargs):
        self.edge_indices = edge_indices
        self.edge_weights = edge_weights
        self.feature = feature
        self.targets = targets
        self._init_common(kwargs)

    def _slice(self, s: slice):
        return DynamicGraphStaticSignal(
            self.edge_indices[s],
            self.edge_weights[s],
            self.feature,
            self.targets[s],
            **self._slice_kwargs(s),
        )


class StaticGraphTemporalSignalBatch(HomoSignalMixin):
    """Static graph + static node→graph batch vector."""

    _graph_dynamic = False
    _signal_static = False
    _has_batch = True

    def __init__(self, edge_index, edge_weight, features, targets, batches,
                 **kwargs):
        self.edge_index = edge_index
        self.edge_weight = edge_weight
        self.features = features
        self.targets = targets
        self.batches = batches
        self._init_common(kwargs)

    def _slice(self, s: slice):
        return StaticGraphTemporalSignalBatch(
            self.edge_index,
            self.edge_weight,
            self.features[s],
            self.targets[s],
            self.batches,
            **self._slice_kwargs(s),
        )


class DynamicGraphTemporalSignalBatch(HomoSignalMixin):
    """Per-step edges, features and batch vectors."""

    _graph_dynamic = True
    _signal_static = False
    _has_batch = True

    def __init__(self, edge_indices, edge_weights, features, targets, batches,
                 **kwargs):
        self.edge_indices = edge_indices
        self.edge_weights = edge_weights
        self.features = features
        self.targets = targets
        self.batches = batches
        self._init_common(kwargs)

    def _slice(self, s: slice):
        return DynamicGraphTemporalSignalBatch(
            self.edge_indices[s],
            self.edge_weights[s],
            self.features[s],
            self.targets[s],
            self.batches[s],
            **self._slice_kwargs(s),
        )


class DynamicGraphStaticSignalBatch(HomoSignalMixin):
    """Per-step edges and batch vectors; one shared feature matrix."""

    _graph_dynamic = True
    _signal_static = True
    _has_batch = True

    def __init__(self, edge_indices, edge_weights, feature, targets, batches,
                 **kwargs):
        self.edge_indices = edge_indices
        self.edge_weights = edge_weights
        self.feature = feature
        self.targets = targets
        self.batches = batches
        self._init_common(kwargs)

    def _slice(self, s: slice):
        return DynamicGraphStaticSignalBatch(
            self.edge_indices[s],
            self.edge_weights[s],
            self.feature,
            self.targets[s],
            self.batches[s],
            **self._slice_kwargs(s),
        )
