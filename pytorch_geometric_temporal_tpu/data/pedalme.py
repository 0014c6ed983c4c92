"""PedalMe London bicycle delivery demand (reference ``dataset/pedalme.py:8-57``)."""

from __future__ import annotations

import numpy as np

from ..signal import StaticGraphTemporalSignal
from ._common import lag_windows
from ._io import fetch_json

_URL = (
    "https://raw.githubusercontent.com/benedekrozemberczki/"
    "pytorch_geometric_temporal/master/dataset/pedalme_london.json"
)


class PedalMeDatasetLoader:
    def __init__(self):
        self._dataset = fetch_json("pedalme_london.json", _URL)

    def get_dataset(self, lags: int = 4) -> StaticGraphTemporalSignal:
        edges = np.array(self._dataset["edges"]).T
        edge_weights = np.array(self._dataset["weights"]).T
        features, targets = lag_windows(np.array(self._dataset["X"]), lags)
        return StaticGraphTemporalSignal(edges, edge_weights, features, targets)
