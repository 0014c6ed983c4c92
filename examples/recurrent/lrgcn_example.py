"""LRGCN on Hungary chickenpox.

Counterpart of reference ``examples/recurrent/lrgcn_example.py``:
LRGCN(4->32, 1 relation, 1 basis) with (H, C) threaded across snapshots.
Relations are per-relation padded Graphs (see
``models.recurrent.lrgcn.split_relations`` for typed edge lists).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.models import LRGCN
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report


class RecurrentGCN(nn.Module):
    @nn.compact
    def __call__(self, x, rel_graphs, h=None, c=None):
        h, c = LRGCN(out_channels=32, num_relations=1, num_bases=1,
                     name="recurrent")(x, rel_graphs, h, c)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], (h, c)


def main(epochs: int):
    train, test = chickenpox(lags=4)
    rel_graphs = [train.graph()]  # single relation: the chickenpox graph
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0], rel_graphs)

    def loss_and_state(p, carry, x, y, g):
        pred, carry = model.apply(p, x, [g], *carry)
        return mse(pred, y), carry

    n = train.features.shape[1]
    carry0 = (jnp.zeros((n, 32)), jnp.zeros((n, 32)))
    fit_and_report(loss_and_state, params, train, test, carry0, epochs)


if __name__ == "__main__":
    main(epochs_from_argv())
