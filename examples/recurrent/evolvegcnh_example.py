"""EvolveGCN-H on Hungary chickenpox.

Counterpart of reference ``examples/recurrent/evolvegcnh_example.py``:
top-k pooled node features drive the weight GRU; the evolved weight is
explicit carried state.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import flax.linen as nn
import jax

from pytorch_geometric_temporal_tpu.models import EvolveGCNH
from pytorch_geometric_temporal_tpu.train import mse

from _common import chickenpox, epochs_from_argv, fit_and_report


class RecurrentGCN(nn.Module):
    @nn.compact
    def __call__(self, x, graph, weight=None):
        h, weight = EvolveGCNH(num_of_nodes=20, in_channels=4,
                               name="recurrent")(x, graph, weight)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], weight


def main(epochs: int):
    train, test = chickenpox(lags=4)
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0], train.graph())

    def loss_and_state(p, carry, x, y, g):
        pred, carry = model.apply(p, x, g, carry)
        return mse(pred, y), carry

    w0 = params["params"]["recurrent"]["initial_weight"]
    fit_and_report(loss_and_state, params, train, test, w0, epochs)


if __name__ == "__main__":
    main(epochs_from_argv())
