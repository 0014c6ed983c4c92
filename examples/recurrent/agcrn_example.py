"""AGCRN on Hungary chickenpox (graph-free — adjacency learned from node
embeddings).

Counterpart of reference ``examples/recurrent/agcrn_example.py``:
AGCRN(20 nodes, 8->2, K=2, D=4), fixed xavier node embeddings, H threaded
across snapshots.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.models import AGCRN
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report

N_NODES, EMB = 20, 4


class RecurrentGCN(nn.Module):
    @nn.compact
    def __call__(self, x, e, h=None):
        h = AGCRN(number_of_nodes=N_NODES, out_channels=2, K=2,
                  embedding_dimensions=EMB, name="recurrent")(x, e, h)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], h


def main(epochs: int):
    train, test = chickenpox(lags=8)
    e = jax.nn.initializers.glorot_uniform()(
        jax.random.PRNGKey(7), (N_NODES, EMB)
    )
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0][None], e)

    def loss_and_state(p, carry, x, y, g):
        pred, carry = model.apply(p, x[None], e, carry)
        return mse(pred[0], y), carry

    carry0 = jnp.zeros((1, N_NODES, 2))
    fit_and_report(loss_and_state, params, train, test, carry0, epochs)


if __name__ == "__main__":
    main(epochs_from_argv())
