"""MSTGCN / ASTGCN on METR-LA with device-resident index batching.

BASELINE config 3: attention STGNN trained on 12->12 METR-LA windows via
the index-batching path (reference ``examples/indexBatching/A3TGCN``
protocol applied to the attention family).

Runs on synthetic METR-LA-shaped data when the archive isn't staged, so it
works air-gapped; stage METR-LA.zip in $PGT_TPU_DATA for the real thing.
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

from pytorch_geometric_temporal_tpu.models import ASTGCN, MSTGCN
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.train import BatchTrainer, masked_mae_loss


def real_or_synthetic(batch_size):
    from pytorch_geometric_temporal_tpu.data._io import available

    if available("METR-LA.zip") or available("node_values.npy"):
        from pytorch_geometric_temporal_tpu.data import METRLADatasetLoader

        loader = METRLADatasetLoader(index=True)
        train, val, test, edges, ew, means, stds = loader.get_index_dataset(
            lags=12, batch_size=batch_size, shuffle=True
        )
        return train, val, edges, ew, jnp.asarray(means), jnp.asarray(stds)
    rng = np.random.default_rng(0)
    N, T = 207, 400
    ei = np.unique(rng.integers(0, N, size=(2, 1722)), axis=1)
    ew = rng.uniform(0.1, 1.0, ei.shape[1]).astype(np.float32)
    data = rng.normal(size=(T, N, 2)).astype(np.float32)
    from pytorch_geometric_temporal_tpu.data._common import make_index_loaders

    train, val, _ = make_index_loaders(data, 12, batch_size, True,
                                       (0.7, 0.1, 0.2))
    return train, val, ei, ew, jnp.float32(54.0), jnp.float32(20.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--model", choices=["mstgcn", "astgcn"], default="mstgcn")
    args = ap.parse_args()

    train_dl, val_dl, edges, ew, mean, std = real_or_synthetic(args.batch_size)
    graph = Graph.from_edge_index(edges, ew)
    n = graph.num_nodes

    common = dict(nb_block=2, in_channels=2, K=3, nb_chev_filter=64,
                  nb_time_filter=64, time_strides=1, num_for_predict=12,
                  len_input=12)
    if args.model == "mstgcn":
        model = MSTGCN(**common)
    else:
        model = ASTGCN(num_of_vertices=n, normalization="sym", **common)

    def apply_fn(p, xb):
        # index batches arrive (B, T, N, F) -> model wants (B, N, F, T)
        return model.apply(p, jnp.transpose(xb, (0, 2, 3, 1)), graph)

    x0, _ = next(iter(train_dl))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.transpose(jnp.asarray(x0), (0, 2, 3, 1)), graph)

    def loss_fn(pred, target):
        # predict channel 0 (speed); de-normalize with channel-0 stats
        t0 = target[..., 0].swapaxes(1, 2)  # (B, N, T)
        m = mean if mean.ndim == 0 else mean[0]
        s = std if std.ndim == 0 else std[0]
        return masked_mae_loss(pred * s + m, t0 * s + m)

    trainer = BatchTrainer(apply_fn, optax.adam(1e-3), loss_fn)
    trainer.fit(
        params, train_dl, epochs=args.epochs, val_loader=val_dl,
        callback=lambda e, l, v: print(f"epoch {e}: train {l:.4f} val {v:.4f}"),
    )


if __name__ == "__main__":
    main()
