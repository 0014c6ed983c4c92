"""A3T-GCN on Hungary chickenpox.

Counterpart of reference ``examples/recurrent/a3tgcn_example.py`` AND
``a3tgcn2_example.py``: the 4 lags become the attention periods, so each
snapshot's features (N, 4) are viewed as (N, 1, 4).  Our A3TGCN accepts
arbitrary leading batch dims, so the reference's separate batched A3TGCN2
class is the same module here.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax

from pytorch_geometric_temporal_tpu.models import A3TGCN
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report


class RecurrentGCN(nn.Module):
    filters: int = 32
    periods: int = 4

    @nn.compact
    def __call__(self, x, graph):
        h = A3TGCN(out_channels=self.filters, periods=self.periods,
                   name="recurrent")(x[:, None, :], graph)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]


def main(epochs: int):
    train, test = chickenpox(lags=4)
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0], train.graph())

    def loss_and_state(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    fit_and_report(loss_and_state, params, train, test, (), epochs)


if __name__ == "__main__":
    main(epochs_from_argv(50))
