"""Data-parallel DCRNN training over a device mesh.

TPU-native replacement for the reference's Dask-DDP launcher
(``examples/indexBatching/DCRNN/pems_ddp.py``): instead of Dask workers +
gloo DDP, the batch axis is sharded over the 'dp' mesh axis and XLA emits
the gradient all-reduce over ICI.  Multi-host: call
``jax.distributed.initialize()`` first and pass ``world_size``/``rank`` to
``get_index_dataset`` so each host reads a disjoint window-index shard.

Run single-host on N virtual devices:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/distributed/dcrnn_dp.py --synthetic
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

from pytorch_geometric_temporal_tpu.models import DCRNNSeq
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.parallel import (
    make_dp_train_step,
    make_mesh,
    replicate,
    shard_batch,
)
from pytorch_geometric_temporal_tpu.train import masked_mae_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    n_dev = len(jax.devices())
    mesh = make_mesh({"dp": n_dev})
    print(f"mesh: dp={n_dev}")

    rng = np.random.default_rng(0)
    N, T, F = 207, 12, 2
    ei = np.unique(rng.integers(0, N, size=(2, 1722)), axis=1)
    graph = Graph.from_edge_index(ei, rng.uniform(0.1, 1, ei.shape[1]), num_nodes=N)
    B = args.batch_size - args.batch_size % n_dev

    model = DCRNNSeq(out_channels=F, K=3)
    x0 = jnp.zeros((B, T, N, F))
    params = model.init(jax.random.PRNGKey(0), x0, graph)
    opt = optax.adam(1e-3)

    def loss_fn(p, xb, yb):
        return masked_mae_loss(model.apply(p, xb, graph), yb)

    step = make_dp_train_step(loss_fn, opt, mesh)
    p = replicate(params, mesh)
    st = replicate(opt.init(params), mesh)
    for i in range(args.steps):
        x = shard_batch(
            jnp.asarray(rng.normal(size=(B, T, N, F)).astype(np.float32)), mesh
        )
        y = shard_batch(
            jnp.asarray(rng.normal(size=(B, T, N, F)).astype(np.float32)), mesh
        )
        p, st, loss = step(p, st, x, y)
        if i % 5 == 0:
            print(f"step {i}: loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
