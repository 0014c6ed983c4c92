"""DCRNN seq2seq on METR-LA with device-resident index batching.

TPU-native counterpart of reference
``examples/indexBatching/DCRNN/pems_main.py``: same protocol (BatchedDCRNN
seq2seq, masked MAE on z-score de-normalized values, Adam 1e-3), with
windows gathered on device per batch (zero per-item host traffic).

Requires METR-LA.zip staged in the data search path (see data/_io.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

import jax
import optax

from pytorch_geometric_temporal_tpu.data import METRLADatasetLoader
from pytorch_geometric_temporal_tpu.models import DCRNNSeq
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.train import BatchTrainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=64)
    args = ap.parse_args()

    loader = METRLADatasetLoader(index=True)
    train_dl, val_dl, test_dl, edges, ew, means, stds = loader.get_index_dataset(
        lags=12, batch_size=args.batch_size, shuffle=True
    )
    graph = Graph.from_edge_index(edges, ew)

    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.train import masked_mae_loss

    mean = jnp.asarray(means)
    std = jnp.asarray(stds)

    model = DCRNNSeq(out_channels=2, K=3)
    x0, _ = next(iter(train_dl))
    params = model.init(jax.random.PRNGKey(0), x0, graph)

    def loss_fn(pred, target):
        return masked_mae_loss(pred * std + mean, target * std + mean)

    trainer = BatchTrainer(
        lambda p, xb: model.apply(p, xb, graph), optax.adam(1e-3), loss_fn
    )
    trainer.fit(
        params, train_dl, epochs=args.epochs, val_loader=val_dl,
        callback=lambda e, l, v: print(f"epoch {e}: train {l:.4f} val {v:.4f}"),
    )


if __name__ == "__main__":
    main()
