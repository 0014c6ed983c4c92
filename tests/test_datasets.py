"""Dataset loader tests.

Bundled datasets (available offline via the data search path) get real
integration tests with exact shape asserts mirroring reference
``test/dataset_test.py:304-314`` and ``test/index_test.py``; loaders whose
data requires download are skipped when the files aren't staged.
"""

import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.data import (
    EnglandCovidDatasetLoader,
    MontevideoBusDatasetLoader,
    PedalMeDatasetLoader,
    TwitterTennisDatasetLoader,
)
from pytorch_geometric_temporal_tpu.data._io import available
from pytorch_geometric_temporal_tpu.signal import temporal_signal_split


def needs(fname):
    return pytest.mark.skipif(
        not available(fname), reason=f"{fname} not staged"
    )


@needs("pedalme_london.json")
def test_pedalme():
    loader = PedalMeDatasetLoader()
    ds = loader.get_dataset(lags=4)
    for snap in ds:
        assert snap.x.shape == (15, 4)
        assert snap.y.shape == (15,)
    train, test = temporal_signal_split(ds, 0.8)
    assert train.snapshot_count + test.snapshot_count == ds.snapshot_count


@needs("england_covid.json")
def test_england_covid_dynamic():
    loader = EnglandCovidDatasetLoader()
    ds = loader.get_dataset(lags=8)
    assert ds.snapshot_count == 61 - 8
    pads = set()
    for snap in ds:
        assert snap.x.shape == (129, 8)
        assert snap.y.shape == (129,)
        pads.add(snap.graph.edge_pad)
    assert len(pads) == 1  # common padded edge count


@needs("montevideo_bus.json")
def test_montevideo():
    loader = MontevideoBusDatasetLoader()
    ds = loader.get_dataset(lags=4)
    snap = ds[0]
    assert snap.x.shape == (675, 4)
    assert snap.y.shape == (675,)


@needs("twitter_tennis_rg17.json")
def test_twitter_tennis_modes():
    for mode, fdim in [("encoded", 16), (None, 2)]:
        loader = TwitterTennisDatasetLoader(
            event_id="rg17", N=100, feature_mode=mode
        )
        ds = loader.get_dataset()
        snap = ds[0]
        assert snap.x.shape == (100, fdim)
        assert snap.y.shape == (100,)
    loader = TwitterTennisDatasetLoader(
        event_id="rg17", N=50, feature_mode="diagonal"
    )
    assert loader.get_dataset()[0].x.shape == (50, 50)


def test_twitter_tennis_validation():
    with pytest.raises(ValueError):
        TwitterTennisDatasetLoader(event_id="nope")
    with pytest.raises(ValueError):
        TwitterTennisDatasetLoader(feature_mode="bogus")


def test_lag_windows_and_zscore():
    from pytorch_geometric_temporal_tpu.data._common import (
        lag_windows,
        make_index_loaders,
        zscore,
    )

    data = np.arange(40, dtype=np.float32).reshape(10, 4)
    feats, targs = lag_windows(data, 3)
    assert len(feats) == 7 and feats[0].shape == (4, 3)
    np.testing.assert_allclose(targs[0], data[3])
    z = zscore(data)
    np.testing.assert_allclose(z.mean(0), 0, atol=1e-6)

    series = np.arange(200, dtype=np.float32).reshape(50, 2, 2)
    tr, va, te = make_index_loaders(series, lags=4, batch_size=8)
    x, y = next(iter(tr))
    assert x.shape == (8, 4, 2, 2)
    # reference split arithmetic: 50 - (2*4 - 1) = 43 indices
    assert len(tr.indices) + len(va.indices) + len(te.indices) == 43
