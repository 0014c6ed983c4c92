"""Node-partitioned DCRNN training with halo exchange (the north star).

The reference's distributed story replicates the graph on every worker and
shards only window indices (Dask-DDP); this example trains DCRNN with the
GRAPH partitioned across the 'graph' mesh axis: every diffusion hop is one
halo ``all_to_all`` of boundary rows (interior edges aggregate in parallel
with the collective), gates are node-local, and the whole training step is
one jitted function over the mesh.

Runs on real devices when available, or force an N-device virtual CPU mesh
with ``--virtual N``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--nodes", type=int, default=2000)
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pytorch_geometric_temporal_tpu.ops import Graph
    from pytorch_geometric_temporal_tpu.parallel import (
        DCRNNPartitionedSeq,
        PartitionedDiffusionOperators,
        make_mesh,
    )

    p = len(jax.devices())
    rng = np.random.default_rng(0)
    n, B, T, F, C, K = args.nodes, 4, 6, 2, 16, 2
    band = 48
    e = n * 12
    s = rng.integers(0, n, size=e)
    r = np.clip(s + rng.integers(-band, band + 1, size=e), 0, n - 1)
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    g = Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)

    mesh = make_mesh({"graph": p})
    pops = PartitionedDiffusionOperators.from_graph(g, p)
    print(f"{p} devices; halo size {pops.p_fwd.halo_size} rows/peer "
          f"(vs {n} full rows an all_gather would ship)")

    model = DCRNNPartitionedSeq(out_channels=C, K=K)
    n_pad = pops.padded_nodes
    x = np.zeros((T, n_pad, B, F), np.float32)
    y = np.zeros((T, n_pad, B, C), np.float32)
    x[:, :n] = rng.normal(size=(T, n, B, F))
    y[:, :n] = rng.normal(size=(T, n, B, C))
    # node-leading (T, N_pad, B, ·), sharded over the 'graph' axis
    from jax.sharding import NamedSharding, PartitionSpec as PS

    spec = NamedSharding(mesh, PS(None, "graph", None, None))
    xs = jax.device_put(jnp.asarray(x), spec)
    ys = jax.device_put(jnp.asarray(y), spec)
    params = model.init(jax.random.PRNGKey(0), xs, pops, mesh)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(pr, st, xb, yb):
        def loss_fn(pp):
            return jnp.mean((model.apply(pp, xb, pops, mesh) - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(pr)
        ups, st2 = opt.update(grads, st)
        return optax.apply_updates(pr, ups), st2, loss

    for i in range(args.steps):
        params, opt_state, loss = train_step(params, opt_state, xs, ys)
        if i % 5 == 0:
            print(f"step {i}: loss {float(loss):.4f}")
    print(f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
