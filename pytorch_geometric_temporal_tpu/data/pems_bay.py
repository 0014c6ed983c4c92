"""PEMS-BAY traffic dataset: 325 sensors, Bay Area.

Reference ``dataset/pems_bay.py:15-246`` — same structure as METR-LA with
different archive members.
"""

from __future__ import annotations

from .metr_la import METRLADatasetLoader


class PemsBayDatasetLoader(METRLADatasetLoader):
    _zip = "PEMS-BAY.zip"
    _adj = "pems_adj_mat.npy"
    _values = "pems_node_values.npy"
    _url = "https://anl.app.box.com/shared/static/7ealcaw862pm12sglyt5g71743eu7s5l"

    def get_dataset(self, num_timesteps_in: int = 12,
                    num_timesteps_out: int = 12):
        """Note: reference PEMS-BAY targets keep ALL features
        (``pems_bay.py:117-121``: y = X[:, :, t_in:span]), unlike METR-LA's
        speed-only targets."""
        X, _, _ = self._normalized_X()
        from .metr_la import _dense_to_sparse

        edges, edge_weights = _dense_to_sparse(self.A)
        span = num_timesteps_in + num_timesteps_out
        features, targets = [], []
        for i in range(X.shape[2] - span + 1):
            features.append(X[:, :, i : i + num_timesteps_in])
            targets.append(X[:, :, i + num_timesteps_in : i + span])
        from ..signal import StaticGraphTemporalSignal

        return StaticGraphTemporalSignal(edges, edge_weights, features, targets)
