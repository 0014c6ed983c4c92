"""HeteroGCLSTM on a synthetic heterogeneous temporal signal.

Counterpart of the reference's hetero test/usage
(``test/heterogeneous_test.py``): two node types, typed edges both ways,
dict-state LSTM cell trained with the snapshot protocol.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_temporal_tpu.models import HeteroGCLSTM
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.signal import (
    StaticHeteroGraphTemporalSignal,
    temporal_signal_split,
)


def make_signal(rng, T=24, n_a=12, n_b=8, f_a=4, f_b=3):
    ei_ab = np.stack([rng.integers(0, n_a, 30), rng.integers(0, n_b, 30)])
    ei_ba = np.stack([rng.integers(0, n_b, 25), rng.integers(0, n_a, 25)])
    edge_index_dict = {("a", "to", "b"): ei_ab, ("b", "to", "a"): ei_ba}
    edge_weight_dict = {k: np.ones(v.shape[1]) for k, v in edge_index_dict.items()}
    feats = [
        {"a": rng.normal(size=(n_a, f_a)).astype(np.float32),
         "b": rng.normal(size=(n_b, f_b)).astype(np.float32)}
        for _ in range(T)
    ]
    targs = [
        {"a": f["a"].sum(-1) * 0.3, "b": f["b"].sum(-1) * 0.5} for f in feats
    ]
    return StaticHeteroGraphTemporalSignal(
        edge_index_dict, edge_weight_dict, feats, targs
    )


class HeteroRegressor(nn.Module):
    metadata: tuple
    in_channels_dict: dict

    @nn.compact
    def __call__(self, x_dict, edge_graphs, h_dict=None, c_dict=None):
        cell = HeteroGCLSTM(self.in_channels_dict, 16, self.metadata)
        h, c = cell(x_dict, edge_graphs, h_dict, c_dict)
        head = nn.Dense(1, name="head")
        preds = {k: head(nn.relu(v))[..., 0] for k, v in h.items()}
        return preds, h, c


def main():
    rng = np.random.default_rng(0)
    sig = make_signal(rng)
    train_sig, test_sig = temporal_signal_split(sig, 0.8)
    metadata = (["a", "b"], [("a", "to", "b"), ("b", "to", "a")])
    model = HeteroRegressor(metadata, {"a": 4, "b": 3})

    snap0 = train_sig[0]
    params = model.init(jax.random.PRNGKey(0), snap0.x_dict, snap0.edge_graphs)
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    snaps = list(train_sig)  # small T: python loop is fine here

    @jax.jit
    def epoch(params, opt_state):
        def loss_fn(p):
            total = 0.0
            h = c = None
            for snap in snaps:
                preds, h, c = model.apply(p, snap.x_dict, snap.edge_graphs, h, c)
                total = total + sum(
                    jnp.mean((preds[k] - snap.y_dict[k]) ** 2)
                    for k in preds
                )
            return total / len(snaps)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for e in range(30):
        params, opt_state, loss = epoch(params, opt_state)
        if e % 10 == 0:
            print(f"epoch {e}: {float(loss):.4f}")
    print(f"final: {float(loss):.4f}")


if __name__ == "__main__":
    main()
