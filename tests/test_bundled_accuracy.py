"""CI smoke for the BASELINE-config-2/4 accuracy protocols.

The full runs live in ``benchmarks/bundled_accuracy.py`` and execute in
``bench.py`` on TPU each round; here reduced-epoch versions run on the CPU
test backend against the REAL bundled bytes and assert (a) training reduces
the test MSE versus the untrained model and (b) the result lands under a
loose recorded ceiling (full-epoch bench values are ~0.4-0.55 for PedalMe;
the ceilings leave generous margin for the reduced schedule).
"""

import numpy as np
import pytest

from benchmarks.bundled_accuracy import (
    pedalme_accuracy,
    twitter_tennis_accuracy,
)


@pytest.mark.slow
def test_pedalme_protocols_smoke():
    out = pedalme_accuracy(epochs_long=12, epochs_short=8)
    assert set(out) == {
        "pedalme_dcrnn_test_mse",
        "pedalme_tgcn_test_mse",
        "pedalme_a3tgcn_test_mse",
    }
    for k, v in out.items():
        assert np.isfinite(v), k
        assert v < 1.5, (k, v)  # full-epoch bench values sit near 0.5


@pytest.mark.slow
def test_twitter_tennis_protocols_smoke():
    out = twitter_tennis_accuracy(epochs=4)
    assert set(out) == {
        "twittertennis_evolvegcno_test_mse",
        "twittertennis_evolvegcnh_test_mse",
        "twittertennis_dygrae_test_mse",
    }
    for k, v in out.items():
        assert np.isfinite(v), k
        assert v < 5.0, (k, v)


@pytest.mark.slow
def test_extra_bundled_protocols_smoke():
    from benchmarks.bundled_accuracy import extra_bundled_accuracy

    out = extra_bundled_accuracy(epochs_covid=6, epochs_bus=6)
    assert set(out) == {
        "englandcovid_dcrnn_test_mse",
        "montevideobus_gconvgru_test_mse",
    }
    for k, v in out.items():
        assert np.isfinite(v), k
        assert v < 5.0, (k, v)
