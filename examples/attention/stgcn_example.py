"""STGCN (STConv blocks) on synthetic traffic windows.

Two stacked STConv blocks + a linear readout forecasting the next step;
shapes follow the reference's ``STConv`` contract (B, T, N, C).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_temporal_tpu.models import STConv
from pytorch_geometric_temporal_tpu.ops import Graph


class STGCN(nn.Module):
    @nn.compact
    def __call__(self, x, graph, train: bool = False):
        h = STConv(num_nodes=x.shape[2], hidden_channels=16, out_channels=32,
                   kernel_size=3, K=2, name="block1")(x, graph, train=train)
        h = STConv(num_nodes=x.shape[2], hidden_channels=16, out_channels=32,
                   kernel_size=3, K=2, name="block2")(h, graph, train=train)
        return nn.Dense(1, name="readout")(h[:, -1])[..., 0]  # (B, N)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    B, T, N, F = 8, 12, 40, 2
    ei = np.unique(rng.integers(0, N, size=(2, 4 * N)), axis=1)
    g = Graph.from_edge_index(ei, rng.uniform(0.5, 1.0, ei.shape[1]), num_nodes=N)
    x = jnp.asarray(rng.normal(size=(B, T, N, F)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, N)).astype(np.float32))

    model = STGCN()
    variables = model.init(jax.random.PRNGKey(0), x, g)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, xb, yb):
        def loss_fn(p):
            pred, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, g, True,
                mutable=["batch_stats"],
            )
            return jnp.mean((pred - yb) ** 2), updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    for i in range(args.steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, x, y
        )
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    print(f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
