"""Batched (B, N, F, T) training — the reference's TGCN2/A3TGCN2 protocol.

Counterpart of reference ``examples/recurrent/tgcn2_example.py`` and
``a3tgcn2_example.py``: all lag windows are materialized into batches and
trained with per-batch updates.  Our TGCN/A3TGCN accept arbitrary leading
batch dims, so there are no separate "2"-suffixed classes — the same
modules run both the snapshot loop and this batched protocol.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_temporal_tpu.data import ChickenpoxDatasetLoader
from pytorch_geometric_temporal_tpu.models import A3TGCN
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.train import BatchTrainer

import flax.linen as nn


class BatchedModel(nn.Module):
    periods: int = 4

    @nn.compact
    def __call__(self, x, graph):
        # x: (B, N, F=1, T)
        h = A3TGCN(out_channels=32, periods=self.periods,
                   name="recurrent")(x, graph)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    args = ap.parse_args()

    ds = ChickenpoxDatasetLoader().get_dataset(lags=4)
    snaps = [ds[t] for t in range(ds.snapshot_count)]
    x_all = np.stack([np.asarray(s.x) for s in snaps])[:, :, None, :]
    y_all = np.stack([np.asarray(s.y) for s in snaps])
    graph = snaps[0].graph
    split = int(0.8 * len(x_all))

    def batches(x, y):
        for i in range(0, len(x) - args.batch_size + 1, args.batch_size):
            yield (jnp.asarray(x[i:i + args.batch_size]),
                   jnp.asarray(y[i:i + args.batch_size]))

    model = BatchedModel()
    x0, _ = next(batches(x_all, y_all))
    params = model.init(jax.random.PRNGKey(0), x0, graph)
    trainer = BatchTrainer(
        lambda p, xb: model.apply(p, xb, graph), optax.adam(1e-2)
    )
    params, _ = trainer.fit(
        params, list(batches(x_all[:split], y_all[:split])),
        epochs=args.epochs,
        val_loader=list(batches(x_all[split:], y_all[split:])),
        callback=lambda e, l, v: print(
            f"epoch {e}: train {l:.4f} val {v:.4f}"
        ),
    )


if __name__ == "__main__":
    main()
