"""PeMS index-only traffic datasets: all-California (11160 nodes) and All-LA.

Reference ``dataset/pems.py:14-180`` and ``dataset/pemsAllLA.py:14-179``:
h5 speed table + pickled adjacency, optional time-of-day channel (all-CA),
z-score normalization, index batching only (no snapshot iterator).
"""

from __future__ import annotations

import pickle
from typing import Tuple

import numpy as np

from ._common import make_index_loaders
from ._io import fetch_bytes, find_file


def _load_pkl_adj(filename: str, url: str):
    blob = fetch_bytes(filename, url)
    _, _, adj = pickle.loads(blob)
    r, c = np.nonzero(adj)
    return np.stack([r, c]), adj[r, c]


def _read_fixed_h5(path):
    """h5py reader for the pandas 'fixed'-format HDF5 layout.

    The published PeMS speed tables were written with
    ``DataFrame.to_hdf(key='df')`` (fixed format): group ``df`` holding
    ``axis1`` (int64 ns datetime index) and ``block0_values`` (T, N).
    pandas needs pytables to read that; this fallback needs only h5py.
    """
    import h5py
    import pandas as pd

    with h5py.File(str(path), "r") as f:
        g = f["df"]
        values = g["block0_values"][...]
        idx = g["axis1"][...]
    return pd.DataFrame(values, index=pd.to_datetime(idx))


def _load_h5_df(filename: str, url: str):
    try:
        import pandas as pd
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError("PeMS loaders need pandas") from exc
    p = find_file(filename)
    if p is None:
        fetch_bytes(filename, url)  # downloads into the cache
        p = find_file(filename)
    try:
        return pd.read_hdf(str(p), "df")
    except ImportError:  # pytables not installed
        return _read_fixed_h5(p)


class PemsDatasetLoader:
    """All-California PeMS (11160 nodes, speed + time-of-day channels)."""

    _files = {
        "pems_cali_adj_mat.pkl": "https://anl.app.box.com/shared/static/4143x1repqa1u26aiz7o2rvw3vpcu0wp",
        "pems_cali_speed.h5": "https://anl.app.box.com/shared/static/7jwy3bsgtcpw3me2cmnrtwnnc1389fjn",
    }

    def __init__(self, raw_data_dir=None, index: bool = True):
        if not index:
            raise NotImplementedError(
                "The PeMS dataset does not support batching without the "
                "index-method"
            )
        if raw_data_dir:
            from ._io import add_search_path

            add_search_path(raw_data_dir)
        self.index = index

    def get_index_dataset(self, lags: int = 12, batch_size: int = 64,
                          shuffle: bool = False,
                          ratio: Tuple[float, float, float] = (0.7, 0.1, 0.2),
                          world_size: int = 1, rank: int = 0):
        (adj_name, adj_url), (h5_name, h5_url) = self._files.items()
        edges, edge_weights = _load_pkl_adj(adj_name, adj_url)
        df = _load_h5_df(h5_name, h5_url)
        num_samples, num_nodes = df.shape
        data = np.empty((num_samples, num_nodes, 2), dtype=np.float32)
        data[..., 0] = df.values
        time_ind = (
            df.index.values - df.index.values.astype("datetime64[D]")
        ) / np.timedelta64(1, "D")
        data[..., 1] = np.tile(time_ind, [num_nodes, 1]).T
        means = np.mean(data, axis=(0, 1))
        stds = np.std(data, axis=(0, 1))
        data = (data - means) / stds
        loaders = make_index_loaders(data, lags, batch_size, shuffle, ratio,
                                     world_size, rank)
        return (*loaders, edges, edge_weights, means, stds)


class PemsAllLADatasetLoader(PemsDatasetLoader):
    """All-LA PeMS subset (speed channel only, reference ``pemsAllLA.py``)."""

    _files = {
        "pems_AllLA_adj_mat.pkl": "https://anl.app.box.com/shared/static/9qc2lc1147xzh8kmq3j4fuo4buiksxua",
        "pems_AllLA_speed.h5": "https://anl.app.box.com/shared/static/crzf75ein8s839de8fklpubauddv1p6w",
    }

    def get_index_dataset(self, lags: int = 12, batch_size: int = 64,
                          shuffle: bool = False,
                          ratio: Tuple[float, float, float] = (0.7, 0.1, 0.2),
                          world_size: int = 1, rank: int = 0):
        (adj_name, adj_url), (h5_name, h5_url) = self._files.items()
        edges, edge_weights = _load_pkl_adj(adj_name, adj_url)
        df = _load_h5_df(h5_name, h5_url)
        data = np.expand_dims(df.values.astype(np.float32), -1)
        means = np.mean(data, axis=(0, 1))
        stds = np.std(data, axis=(0, 1))
        data = (data - means) / stds
        loaders = make_index_loaders(data, lags, batch_size, shuffle, ratio,
                                     world_size, rank)
        return (*loaders, edges, edge_weights, means, stds)
