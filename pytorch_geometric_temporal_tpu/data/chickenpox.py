"""Hungary chickenpox county-level weekly case counts.

Parity with reference ``dataset/chickenpox.py:11-132``: 20 nodes, 102 edges,
unit edge weights, lagged weekly counts as features, next week as target.
"""

from __future__ import annotations

import numpy as np

from ..signal import (
    DeviceWindower,
    IndexLoader,
    StaticGraphTemporalSignal,
)
from ._io import fetch_json

_URL = (
    "https://raw.githubusercontent.com/benedekrozemberczki/"
    "pytorch_geometric_temporal/master/dataset/chickenpox.json"
)


class ChickenpoxDatasetLoader:
    def __init__(self, index: bool = False):
        self._dataset = fetch_json("chickenpox.json", _URL)
        self.index = index

    def _get_edges(self):
        self._edges = np.array(self._dataset["edges"]).T

    def _get_edge_weights(self):
        self._edge_weights = np.ones(self._edges.shape[1])

    def _get_targets_and_features(self):
        stacked_target = np.array(self._dataset["FX"])
        self.features = [
            stacked_target[i : i + self.lags, :].T
            for i in range(stacked_target.shape[0] - self.lags)
        ]
        self.targets = [
            stacked_target[i + self.lags, :].T
            for i in range(stacked_target.shape[0] - self.lags)
        ]

    def get_dataset(self, lags: int = 4) -> StaticGraphTemporalSignal:
        self.lags = lags
        self._get_edges()
        self._get_edge_weights()
        self._get_targets_and_features()
        return StaticGraphTemporalSignal(
            self._edges, self._edge_weights, self.features, self.targets
        )

    def get_index_dataset(self, lags: int = 4, batch_size: int = 4,
                          shuffle: bool = False, ratio=(0.7, 0.1, 0.2),
                          world_size: int = 1, rank: int = 0):
        """Index-batched loaders (reference ``chickenpox.py:74-132``).

        Returns (train_loader, val_loader, test_loader, edges, edge_weights)
        with device-resident window gathering instead of torch DataLoaders.
        """
        if not self.index:
            raise ValueError(
                "get_index_dataset requires 'index=True' in the constructor."
            )
        data = np.expand_dims(np.array(self._dataset["FX"]), axis=-1)
        edges = np.array(self._dataset["edges"], dtype=np.int64).T
        edge_weights = np.ones(edges.shape[1], dtype=np.float32)
        x_i = np.arange(data.shape[0] - (2 * lags - 1))
        num_samples = x_i.shape[0]
        num_train = round(num_samples * ratio[0])
        num_test = round(num_samples * ratio[2])
        windower = DeviceWindower(data.astype(np.float32), lags)
        mk = lambda idx: IndexLoader(
            idx, windower, batch_size, shuffle=shuffle,
            world_size=world_size, rank=rank,
        )
        return (
            mk(x_i[:num_train]),
            mk(x_i[num_train : num_samples - num_test]),
            mk(x_i[-num_test:]),
            edges,
            edge_weights,
        )
