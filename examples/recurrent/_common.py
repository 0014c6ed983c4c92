"""Shared boilerplate for the per-model snapshot-loop examples.

Every reference example (``/root/reference/examples/recurrent/*.py``)
follows one protocol: Hungary-chickenpox snapshots, train_ratio 0.2,
Adam(0.01), 200 epochs of full-sequence BPTT with the MSE averaged over
snapshots, recurrent state threaded across snapshots, test MSE printed at
the end.  Here the whole epoch (scan, backward, update) is ONE jitted
function via StackedSignal + SnapshotTrainer.
"""

from __future__ import annotations

import optax

from pytorch_geometric_temporal_tpu.data import ChickenpoxDatasetLoader
from pytorch_geometric_temporal_tpu.signal import (
    StackedSignal,
    temporal_signal_split,
)
from pytorch_geometric_temporal_tpu.train import SnapshotTrainer


def chickenpox(lags: int = 4):
    dataset = ChickenpoxDatasetLoader().get_dataset(lags=lags)
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    return StackedSignal.from_signal(train_sig), StackedSignal.from_signal(test_sig)


def fit_and_report(loss_and_state, params, train, test, carry0=(),
                   epochs: int = 200, lr: float = 1e-2):
    trainer = SnapshotTrainer(loss_and_state, optax.adam(lr))
    params, _ = trainer.fit(
        params, train, epochs=epochs, init_carry=carry0,
        log_every=max(epochs // 5, 1),
        callback=lambda e, l: print(f"epoch {e}: train MSE {float(l):.4f}"),
    )
    print(f"test MSE: {float(trainer.evaluate(params, test, carry0)):.4f}")
    return params


def epochs_from_argv(default: int = 200) -> int:
    import sys

    return int(sys.argv[1]) if len(sys.argv) > 1 else default
