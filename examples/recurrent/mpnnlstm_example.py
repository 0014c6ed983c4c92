"""MPNN-LSTM on Hungary chickenpox.

Counterpart of reference ``examples/recurrent/mpnnlstm_example.py``:
MPNNLSTM(4->32, window 1, 20 nodes) + ReLU + Linear(2*32+4 -> 1) head.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax

from pytorch_geometric_temporal_tpu.models import MPNNLSTM
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report


class RecurrentGCN(nn.Module):
    @nn.compact
    def __call__(self, x, graph):
        h = MPNNLSTM(hidden_size=32, num_nodes=20, window=1, dropout=0.5,
                     name="recurrent")(x, graph)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]


def main(epochs: int):
    train, test = chickenpox(lags=4)
    model = RecurrentGCN()
    variables = model.init(jax.random.PRNGKey(42), train.features[0],
                           train.graph())

    def loss_and_state(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    fit_and_report(loss_and_state, variables, train, test, (), epochs)


if __name__ == "__main__":
    main(epochs_from_argv(50))
