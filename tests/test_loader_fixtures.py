"""Parse-level tests for download-gated loaders via synthetic fixture files.

The 12 loaders whose real archives can't be downloaded here (zero egress)
get tiny schema-correct stand-ins generated into a tmp ``$PGT_TPU_DATA``
(mirroring the real archive layouts at reference ``dataset/metr_la.py:56-96``,
``pems_bay.py:15-100``, ``pems.py:71-180``, ``wikimath.py``, ``windmill*.py``,
``mtm.py``, and the Starndt PDE repo).  This executes every loader's actual
parsing and windowing code end to end.
"""

import io
import json
import pickle
import zipfile

import numpy as np
import pytest


@pytest.fixture
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PGT_TPU_DATA", str(tmp_path))
    return tmp_path


N, T = 6, 40


def _adj(rng, n=N):
    a = (rng.uniform(size=(n, n)) < 0.4).astype(np.float32)
    a *= rng.uniform(0.1, 1.0, size=(n, n)).astype(np.float32)
    np.fill_diagonal(a, 0.0)
    return a


def _write_zip(path, members):
    with zipfile.ZipFile(path, "w") as zf:
        for name, arr in members.items():
            buf = io.BytesIO()
            np.save(buf, arr)
            zf.writestr(name, buf.getvalue())


def test_metr_la_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import METRLADatasetLoader

    _write_zip(data_dir / "METR-LA.zip", {
        "adj_mat.npy": _adj(rng),
        "node_values.npy": rng.normal(size=(T, N, 2)).astype(np.float32),
    })
    loader = METRLADatasetLoader(index=True)
    ds = loader.get_dataset(num_timesteps_in=4, num_timesteps_out=4)
    snap = ds[0]
    assert snap.x.shape == (N, 2, 4)
    assert snap.y.shape == (N, 4)
    assert ds.snapshot_count == T - 8 + 1
    out = loader.get_index_dataset(lags=4, batch_size=3)
    train, val, test, edges, ew, means, stds = out
    x, y = next(iter(train))
    assert x.shape == (3, 4, N, 2) and y.shape == (3, 4, N, 2)
    assert edges.shape[0] == 2 and len(ew) == edges.shape[1]
    assert means.shape == (2,) and stds.shape == (2,)


def test_pems_bay_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import PemsBayDatasetLoader

    _write_zip(data_dir / "PEMS-BAY.zip", {
        "pems_adj_mat.npy": _adj(rng),
        "pems_node_values.npy": rng.normal(size=(T, N, 2)).astype(np.float32),
    })
    loader = PemsBayDatasetLoader(index=True)
    ds = loader.get_dataset(num_timesteps_in=4, num_timesteps_out=4)
    snap = ds[0]
    assert snap.x.shape == (N, 2, 4)
    assert snap.y.shape == (N, 2, 4)  # PEMS-BAY keeps all target features
    out = loader.get_index_dataset(lags=4, batch_size=2)
    assert len(out) == 7


def _write_fixed_h5(path, values, rng):
    """pandas 'fixed'-format layout written with h5py (no pytables here)."""
    import h5py

    idx = (np.arange(values.shape[0], dtype=np.int64)
           * 5 * 60 * 1_000_000_000)  # 5-minute steps in ns
    with h5py.File(path, "w") as f:
        g = f.create_group("df")
        g.create_dataset("axis1", data=idx)
        g.create_dataset("block0_values", data=values)


def test_pems_all_california_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import PemsDatasetLoader

    a = _adj(rng)
    (data_dir / "pems_cali_adj_mat.pkl").write_bytes(
        pickle.dumps((None, None, a))
    )
    _write_fixed_h5(data_dir / "pems_cali_speed.h5",
                    rng.normal(size=(T, N)).astype(np.float32), rng)
    loader = PemsDatasetLoader()
    train, val, test, edges, ew, means, stds = loader.get_index_dataset(
        lags=4, batch_size=2
    )
    x, y = next(iter(train))
    # all-CA adds the time-of-day channel
    assert x.shape == (2, 4, N, 2) and y.shape == (2, 4, N, 2)
    assert means.shape == (2,)
    with pytest.raises(NotImplementedError):
        PemsDatasetLoader(index=False)


def test_pems_all_la_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import PemsAllLADatasetLoader

    a = _adj(rng)
    (data_dir / "pems_AllLA_adj_mat.pkl").write_bytes(
        pickle.dumps((None, None, a))
    )
    _write_fixed_h5(data_dir / "pems_AllLA_speed.h5",
                    rng.normal(size=(T, N)).astype(np.float32), rng)
    loader = PemsAllLADatasetLoader()
    train, *_rest = loader.get_index_dataset(lags=4, batch_size=2)
    x, y = next(iter(train))
    assert x.shape == (2, 4, N, 1)  # speed channel only


def _edge_json(rng, n=N, e=14):
    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    return ([[int(s), int(r)] for s, r in ei.T],
            [float(w) for w in rng.uniform(0.1, 1.0, ei.shape[1])])


def test_wikimaths_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import WikiMathsDatasetLoader

    edges, weights = _edge_json(rng)
    payload = {"edges": edges, "weights": weights, "time_periods": T}
    for t in range(T):
        payload[str(t)] = {"y": [float(v) for v in
                                 rng.integers(0, 100, N)]}
    (data_dir / "wikivital_mathematics.json").write_text(json.dumps(payload))
    ds = WikiMathsDatasetLoader().get_dataset(lags=8)
    snap = ds[0]
    assert snap.x.shape == (N, 8)
    assert snap.y.shape == (N,)
    assert ds.snapshot_count == T - 8


@pytest.mark.parametrize("cls_name,fname", [
    ("WindmillOutputLargeDatasetLoader", "windmill_output.json"),
    ("WindmillOutputMediumDatasetLoader", "windmill_output_medium.json"),
    ("WindmillOutputSmallDatasetLoader", "windmill_output_small.json"),
])
def test_windmill_fixtures(data_dir, rng, cls_name, fname):
    import pytorch_geometric_temporal_tpu.data as data_mod

    edges, weights = _edge_json(rng)
    payload = {
        "edges": edges,
        "weights": weights,
        "block": [[float(v) for v in row]
                  for row in rng.uniform(size=(T, N))],
    }
    (data_dir / fname).write_text(json.dumps(payload))
    loader = getattr(data_mod, cls_name)(index=True)
    ds = loader.get_dataset(lags=8)
    snap = ds[0]
    assert snap.x.shape == (N, 8)
    assert snap.y.shape == (N,)
    train, *_rest = loader.get_index_dataset(lags=4, batch_size=2)
    x, y = next(iter(train))
    assert x.shape == (2, 4, N, 1)


def test_mtm_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import MTMDatasetLoader

    frames_total = 24
    payload = {"edges": [[int(s), int(r)] for s, r in
                         np.stack([np.arange(20), np.arange(1, 21)]).T]}
    for j in range(21):
        payload[str(j)] = {
            str(t): f"({rng.uniform():.3f},{rng.uniform():.3f},{rng.uniform():.3f})"
            for t in range(frames_total)
        }
    payload["LABEL"] = {str(t): int(rng.integers(0, 6))
                        for t in range(frames_total)}
    # ensure all 6 classes appear so one-hot width is 6
    for t, lbl in enumerate(range(6)):
        payload["LABEL"][str(t)] = lbl
    (data_dir / "mtm_1.json").write_text(json.dumps(payload))
    ds = MTMDatasetLoader().get_dataset(frames=16)
    snap = ds[0]
    assert snap.x.shape == (3, 21, 16)
    assert snap.y.shape == (16, 6)
    assert ds.snapshot_count == frames_total - 16


def _write_pt_distances(path, rng, n=N, e=18):
    import torch

    ei = np.unique(rng.integers(0, n, size=(2, e)), axis=1)
    d = np.concatenate([ei, rng.uniform(1.0, 5.0, (1, ei.shape[1]))], axis=0)
    torch.save(torch.as_tensor(d.T), str(path))  # saved layout (E, 3)
    return ei.shape[1]


def test_si_diffusion_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import SIDiffusionDatasetLoader

    np.save(data_dir / "SI_equation_dataset.npy",
            rng.uniform(size=(T, N, 2)).astype(np.float32))
    _write_pt_distances(data_dir / "nuts3_adjacent_distances.pt", rng)
    ds = SIDiffusionDatasetLoader().get_dataset(lags=4)
    snap = ds[0]
    assert snap.x.shape == (N, 2, 4)
    assert snap.y.shape == (N, 1)
    assert ds.snapshot_count == T - 4


def test_advection_diffusion_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import (
        AdvectionDiffusionDatasetLoader,
    )

    np.save(data_dir / "advection_diffusion_dataset.npy",
            rng.uniform(size=(T, N, 1)).astype(np.float32))
    _write_pt_distances(data_dir / "nuts3_adjacent_distances.pt", rng)
    ds = AdvectionDiffusionDatasetLoader().get_dataset(lags=4)
    snap = ds[0]
    assert snap.x.shape == (N, 4)  # (N, lags*F) flattened
    assert snap.y.shape == (N, 1)


def test_wave_equation_fixture(data_dir, rng):
    from pytorch_geometric_temporal_tpu.data import WaveEquationDatasetLoader

    np.save(data_dir / "wave_equation_dataset.npy",
            rng.uniform(size=(T, N, 1)).astype(np.float32))
    _write_pt_distances(data_dir / "germany_coastline_adjacency.pt", rng)
    ds = WaveEquationDatasetLoader().get_dataset(lags=4)
    assert ds[0].x.shape == (N, 4)
