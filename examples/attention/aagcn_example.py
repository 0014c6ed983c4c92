"""2s-AGCN on synthetic skeleton-action data.

Mirrors the reference AAGCN contract: X (B, C_in, T, V) over a fixed
skeleton graph, stacked adaptive graph-conv + temporal-conv blocks and a
classification head.
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

from pytorch_geometric_temporal_tpu.models import AAGCN


class ActionClassifier(nn.Module):
    edge_index: tuple
    num_nodes: int
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = AAGCN(in_channels=x.shape[1], out_channels=16,
                  edge_index=self.edge_index, num_nodes=self.num_nodes,
                  name="block1")(x, train)
        h = AAGCN(in_channels=16, out_channels=32, stride=2,
                  edge_index=self.edge_index, num_nodes=self.num_nodes,
                  name="block2")(h, train)
        pooled = h.mean(axis=(2, 3))  # (B, C)
        return nn.Dense(self.num_classes, name="head")(pooled)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    B, C, T, V = 8, 3, 16, 21
    skel = np.stack([np.arange(V - 1), np.arange(1, V)])
    x = jnp.asarray(rng.normal(size=(B, C, T, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 10, B))

    model = ActionClassifier(edge_index=tuple(map(tuple, skel)), num_nodes=V)
    variables = model.init(jax.random.PRNGKey(0), x)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    for i in range(args.steps):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        if i % 5 == 0:
            print(f"step {i}: xent {float(loss):.4f}")
    print(f"final xent {float(loss):.4f}")


if __name__ == "__main__":
    main()
