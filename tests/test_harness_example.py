"""Smoke test for the full-harness training example.

``examples/recurrent/harness_example.py`` is the Lightning-interop
equivalent (reference ``examples/recurrent/lightning_example.py:12-65``):
TrainState + async CheckpointManager resume + DivergenceGuard + metric
logging + early stopping in one composition.  This runs it for two short
epochs, then resumes from its checkpoints and confirms continuation.
"""

import importlib.util
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).parent.parent / "examples" / "recurrent"


@pytest.fixture()
def harness(monkeypatch):
    # _common imports chickenpox, which needs the bundled dataset
    from pytorch_geometric_temporal_tpu.data._io import available

    if not available("chickenpox.json"):
        pytest.skip("chickenpox dataset bytes not staged")
    monkeypatch.syspath_prepend(str(EXAMPLES))
    spec = importlib.util.spec_from_file_location(
        "harness_example", EXAMPLES / "harness_example.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_harness_trains_and_resumes(harness, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("CKPT_DIR", str(tmp_path / "ckpt"))
    best1, hist1 = harness.main(epochs=2, patience=10)
    assert len(hist1) == 2
    assert hist1[1]["train_mse"] < hist1[0]["train_mse"]

    best2, hist2 = harness.main(epochs=3, patience=10)
    out = capsys.readouterr().out
    assert "resumed from step" in out
    # the resumed epoch continues the schedule (epoch index advances)
    assert hist2[0]["epoch"] == 2
    assert best2 <= best1 + 1e-6
