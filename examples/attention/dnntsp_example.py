"""DNNTSP temporal-set prediction on synthetic basket data.

Mirrors the reference DNNTSP contract: node features over a weighted item
co-occurrence graph (T stacked item copies), causal self-attention over
time, gated blend with static item embeddings; multi-label item scores.
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

from pytorch_geometric_temporal_tpu.models import DNNTSP
from pytorch_geometric_temporal_tpu.ops import Graph


class SetPredictor(nn.Module):
    items: int
    dim: int = 16

    @nn.compact
    def __call__(self, x, graph, train: bool = False):
        h = DNNTSP(items_total=self.items, item_embedding_dim=self.dim,
                   n_heads=4, name="dnntsp")(x, graph, train)
        return nn.Dense(1, name="scorer")(h)[..., 0]  # (T, items)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    items, dim, T = 24, 16, 5
    n = T * items
    ei = np.unique(rng.integers(0, n, size=(2, 6 * n)), axis=1)
    g = Graph.from_edge_index(ei, rng.uniform(0.1, 1.0, ei.shape[1]),
                              num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, dim)).astype(np.float32))
    y = jnp.asarray((rng.uniform(size=(T, items)) < 0.2).astype(np.float32))

    model = SetPredictor(items=items, dim=dim)
    variables = model.init(jax.random.PRNGKey(0), x, g)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, g, True,
                mutable=["batch_stats"],
            )
            loss = optax.sigmoid_binary_cross_entropy(logits, y).mean()
            return loss, updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    for i in range(args.steps):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        if i % 5 == 0:
            print(f"step {i}: bce {float(loss):.4f}")
    print(f"final bce {float(loss):.4f}")


if __name__ == "__main__":
    main()
