"""T-GCN on Hungary chickenpox.

Counterpart of reference ``examples/recurrent/tgcn_example.py`` AND
``tgcn2_example.py``: our TGCN accepts arbitrary leading batch dims
(..., N, F), so the reference's separate batched TGCN2 class is the same
module here — see ``batch_example.py`` for the batched protocol.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_geometric_temporal_tpu.models import TGCN
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report


class RecurrentGCN(nn.Module):
    filters: int = 32

    @nn.compact
    def __call__(self, x, graph, h=None):
        h = TGCN(out_channels=self.filters, name="recurrent")(x, graph, h)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], h


def main(epochs: int):
    train, test = chickenpox(lags=4)
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0], train.graph())

    def loss_and_state(p, carry, x, y, g):
        pred, carry = model.apply(p, x, g, carry)
        return mse(pred, y), carry

    carry0 = jnp.zeros((train.features.shape[1], 32))
    fit_and_report(loss_and_state, params, train, test, carry0, epochs)


if __name__ == "__main__":
    main(epochs_from_argv())
