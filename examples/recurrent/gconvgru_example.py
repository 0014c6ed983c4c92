"""GConvGRU on Hungary chickenpox — the canonical snapshot-loop example.

TPU-native counterpart of reference ``examples/recurrent/gconvgru_example.py``:
same protocol (full-sequence BPTT, one optimizer update per epoch, MSE), but
the entire epoch — scan over snapshots, backward, update — is ONE jitted
function via StackedSignal + SnapshotTrainer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pytorch_geometric_temporal_tpu.data import ChickenpoxDatasetLoader
from pytorch_geometric_temporal_tpu.models import GConvGRU
from pytorch_geometric_temporal_tpu.signal import (
    StackedSignal,
    temporal_signal_split,
)
from pytorch_geometric_temporal_tpu.train import SnapshotTrainer, mse


class RecurrentGCN(nn.Module):
    filters: int = 32

    @nn.compact
    def __call__(self, x, graph, h=None):
        h = GConvGRU(out_channels=self.filters, K=2, name="recurrent")(x, graph, h)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], h


def main(epochs: int = 200):
    loader = ChickenpoxDatasetLoader()
    dataset = loader.get_dataset(lags=4)
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    train = StackedSignal.from_signal(train_sig)
    test = StackedSignal.from_signal(test_sig)

    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0], train.graph())

    def loss_and_state(p, carry, x, y, g):
        pred, h = model.apply(p, x, g, carry)
        return mse(pred, y), h

    trainer = SnapshotTrainer(loss_and_state, optax.adam(1e-2))
    h0 = jnp.zeros((train.features.shape[1], 32))
    params, _ = trainer.fit(
        params, train, epochs=epochs, init_carry=h0, log_every=20,
        callback=lambda e, l: print(f"epoch {e}: {float(l):.4f}"),
    )
    print("test MSE:", float(trainer.evaluate(params, test, h0)))


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
