"""MTGNN on synthetic multivariate series (learned adjacency).

Mirrors the reference MTGNN contract: X (B, in_dim, N, T) -> forecast
(B, out_dim, N, 1), with the graph constructor learning a directed top-k
adjacency from node embeddings.
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

from pytorch_geometric_temporal_tpu.models import MTGNN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=15)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    B, Cin, N, T = 4, 2, 20, 24
    model = MTGNN(
        gcn_true=True, build_adj=True, gcn_depth=2, num_nodes=N,
        kernel_set=[2, 3, 6, 7], kernel_size=7, dropout=0.1,
        subgraph_size=5, node_dim=16, dilation_exponential=2,
        conv_channels=8, residual_channels=8, skip_channels=16,
        end_channels=32, seq_length=T, in_dim=Cin, out_dim=12, layers=3,
        propalpha=0.05, tanhalpha=3, layer_norm_affline=True,
    )
    x = jnp.asarray(rng.normal(size=(B, Cin, N, T)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(B, 12, N, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean(jnp.abs(model.apply(p, x) - y))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    for i in range(args.steps):
        params, opt_state, loss = step(params, opt_state)
        if i % 5 == 0:
            print(f"step {i}: MAE {float(loss):.4f}")
    print(f"final MAE {float(loss):.4f}")


if __name__ == "__main__":
    main()
