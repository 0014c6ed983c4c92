"""GConvLSTM on Hungary chickenpox.

Counterpart of reference ``examples/recurrent/gconvlstm_example.py``:
GConvLSTM(4->32, K=1) + ReLU + Linear head, (H, C) threaded across
snapshots, 200 full-BPTT epochs.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.models import GConvLSTM
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report


class RecurrentGCN(nn.Module):
    filters: int = 32

    @nn.compact
    def __call__(self, x, graph, h=None, c=None):
        h, c = GConvLSTM(out_channels=self.filters, K=1, name="recurrent")(
            x, graph, h, c
        )
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], (h, c)


def main(epochs: int):
    train, test = chickenpox(lags=4)
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0], train.graph())

    def loss_and_state(p, carry, x, y, g):
        pred, carry = model.apply(p, x, g, *carry)
        return mse(pred, y), carry

    n = train.features.shape[1]
    carry0 = (jnp.zeros((n, 32)), jnp.zeros((n, 32)))
    fit_and_report(loss_and_state, params, train, test, carry0, epochs)


if __name__ == "__main__":
    main(epochs_from_argv())
