"""End-to-end accuracy protocols on the real bundled datasets.

Closes BASELINE configs 2 and 4 with driver-visible numbers: every run
trains on the REAL bytes shipped in ``data/bundled/`` (no downloads), with
the reference example protocol (train_ratio 0.2, Adam(0.01), full-sequence
BPTT with the per-snapshot MSE averaged over time, test MSE reported):

- **PedalMe** (config 2): DCRNN / TGCN / A3TGCN — protocol shape from
  reference ``examples/recurrent/{dcrnn,tgcn,a3tgcn}_example.py:14-56``
  (those scripts run Chickenpox; BASELINE names PedalMe for this model
  trio, so the same protocol runs on the PedalMe bundled bytes).
- **TwitterTennis rg17** (config 4): EvolveGCN-O / EvolveGCN-H /
  DyGrEncoder on the dynamic-edge snapshots — protocol shape from
  reference ``examples/recurrent/{evolvegcno,evolvegcnh,dygrencoder}_
  example.py``.
- **EnglandCovid + MontevideoBus** (:func:`extra_bundled_accuracy`): the
  remaining two bundled real datasets, same protocol shape (no reference
  example pairs a model with them).

Epoch counts follow the reference scripts (200, except 50 for the TGCN
family).  One documented protocol difference for the EvolveGCN pair: the
reference carries the evolved weight across epochs (detaching the autograd
graph between them, ``evolvegcno_example.py:49-50``) and resets it only at
test time; the functional Seq models restart each epoch from the learned
initial weight — consistent with how the test pass itself starts, and free
of hidden module state.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import numpy as np


def _train_seq(model, params, xs, ys, graph, epochs, lr=1e-2):
    """Full-sequence-model protocol: pred = model(xs, graph) then per-
    snapshot-MSE averaged over time; one update per epoch, all epochs in
    one jitted fori_loop (single device dispatch)."""
    import jax
    import jax.numpy as jnp
    import optax

    opt = optax.adam(lr)

    def loss_fn(p, xs, ys, g):
        pred = model.apply(p, xs, g)
        return jnp.mean((pred - ys) ** 2)

    @partial(jax.jit, static_argnums=(4,))
    def run(params, xs, ys, g, num_epochs):
        def body(_, c):
            p, s, _ = c
            loss, grads = jax.value_and_grad(loss_fn)(p, xs, ys, g)
            updates, s = opt.update(grads, s, p)
            return optax.apply_updates(p, updates), s, loss

        return jax.lax.fori_loop(
            0, num_epochs, body, (params, opt.init(params), jnp.float32(0.0))
        )

    params, _, last_loss = run(params, xs, ys, graph, epochs)
    return params, float(last_loss), jax.jit(loss_fn)


def _pedalme_signals(lags=4):
    from pytorch_geometric_temporal_tpu.data import PedalMeDatasetLoader
    from pytorch_geometric_temporal_tpu.signal import (
        StackedSignal,
        temporal_signal_split,
    )

    dataset = PedalMeDatasetLoader().get_dataset(lags=lags)
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    return (StackedSignal.from_signal(train_sig),
            StackedSignal.from_signal(test_sig))


def pedalme_accuracy(epochs_long=200, epochs_short=50) -> Dict[str, float]:
    """DCRNN/TGCN/A3TGCN test MSE on bundled PedalMe (BASELINE config 2).

    Model heads mirror the reference trio exactly: cell(4->32) + ReLU +
    Linear(32->1); DCRNN and A3TGCN reset state every snapshot (their
    reference scripts never thread H), TGCN threads H across snapshots
    within an epoch (``tgcn_example.py:27-41``).
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_geometric_temporal_tpu.models import A3TGCN, DCRNN, TGCN
    from pytorch_geometric_temporal_tpu.train import SnapshotTrainer, mse

    train, test = _pedalme_signals(lags=4)
    n = train.features.shape[1]
    out: Dict[str, float] = {}

    class DCRNNNet(nn.Module):
        @nn.compact
        def __call__(self, x, graph):
            h = DCRNN(out_channels=32, K=1, name="recurrent")(x, graph)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    class TGCNNet(nn.Module):
        @nn.compact
        def __call__(self, x, graph, h):
            h = TGCN(out_channels=32, name="recurrent")(x, graph, h)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], h

    class A3TGCNNet(nn.Module):
        @nn.compact
        def __call__(self, x, graph):
            # reference feeds x.view(N, 1, lags): one feature, lag periods
            h = A3TGCN(out_channels=32, periods=4, name="recurrent")(
                x[:, None, :], graph
            )
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    # --- DCRNN (200 epochs, stateless across snapshots) ---------------
    model = DCRNNNet()
    params = model.init(jax.random.PRNGKey(0), train.features[0],
                        train.graph())

    def dcrnn_loss(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    tr = SnapshotTrainer(dcrnn_loss, optax.adam(1e-2))
    params, _ = tr.fit(params, train, epochs=epochs_long,
                       log_every=epochs_long)
    out["pedalme_dcrnn_test_mse"] = float(tr.evaluate(params, test))

    # --- TGCN (50 epochs, H threaded within the epoch) -----------------
    model = TGCNNet()
    carry0 = jnp.zeros((n, 32))
    params = model.init(jax.random.PRNGKey(0), train.features[0],
                        train.graph(), carry0)

    def tgcn_loss(p, carry, x, y, g):
        pred, carry = model.apply(p, x, g, carry)
        return mse(pred, y), carry

    tr = SnapshotTrainer(tgcn_loss, optax.adam(1e-2))
    params, _ = tr.fit(params, train, epochs=epochs_short,
                       init_carry=carry0, log_every=epochs_short)
    out["pedalme_tgcn_test_mse"] = float(tr.evaluate(params, test, carry0))

    # --- A3TGCN (50 epochs, stateless) ---------------------------------
    model = A3TGCNNet()
    params = model.init(jax.random.PRNGKey(0), train.features[0],
                        train.graph())

    def a3_loss(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    tr = SnapshotTrainer(a3_loss, optax.adam(1e-2))
    params, _ = tr.fit(params, train, epochs=epochs_short,
                       log_every=epochs_short)
    out["pedalme_a3tgcn_test_mse"] = float(tr.evaluate(params, test))
    return out


def _twitter_signals():
    from pytorch_geometric_temporal_tpu.data import TwitterTennisDatasetLoader
    from pytorch_geometric_temporal_tpu.signal import (
        StackedSignal,
        temporal_signal_split,
    )

    dataset = TwitterTennisDatasetLoader(event_id="rg17").get_dataset()
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    return (StackedSignal.from_signal(train_sig),
            StackedSignal.from_signal(test_sig))


def twitter_tennis_accuracy(epochs=200) -> Dict[str, float]:
    """EvolveGCN-O/H + DyGrEncoder test MSE on bundled TwitterTennis rg17
    (BASELINE config 4) — real dynamic-edge snapshots, per-step padded
    edge lists riding the scan.
    """
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_geometric_temporal_tpu.models import (
        DyGrEncoder,
        EvolveGCNHSeq,
        EvolveGCNOSeq,
    )
    from pytorch_geometric_temporal_tpu.ops.graph import Graph
    from pytorch_geometric_temporal_tpu.train import SnapshotTrainer, mse

    train, test = _twitter_signals()
    n = train.features.shape[1]
    f = train.features.shape[2]
    out: Dict[str, float] = {}

    def gstack(sig):
        return Graph(sig.senders, sig.receivers, sig.weights,
                     sig.num_nodes, sig.num_edges)

    # --- EvolveGCN-O / EvolveGCN-H (full-sequence Seq models) ----------
    class OSeqNet(nn.Module):
        @nn.compact
        def __call__(self, xs, g):
            h = EvolveGCNOSeq(in_channels=f, name="recurrent")(xs, g)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    class HSeqNet(nn.Module):
        @nn.compact
        def __call__(self, xs, g):
            h = EvolveGCNHSeq(num_of_nodes=n, in_channels=f,
                              name="recurrent")(xs, g)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    for name, net in (("evolvegcno", OSeqNet()), ("evolvegcnh", HSeqNet())):
        params = net.init(jax.random.PRNGKey(0), train.features,
                          gstack(train))
        params, _, loss_fn = _train_seq(
            net, params, train.features, train.targets, gstack(train), epochs
        )
        out[f"twittertennis_{name}_test_mse"] = float(
            loss_fn(params, test.features, test.targets, gstack(test))
        )

    # --- DyGrEncoder (snapshot loop, (H, C) threaded) ------------------
    class DygraeNet(nn.Module):
        @nn.compact
        def __call__(self, x, graph, h, c):
            # conv_out_channels follows the feature width (GatedGraphConv
            # needs in<=out; the reference script's 4 fits chickenpox's
            # F=4, TwitterTennis encoded features are wider)
            h_tilde, h, c = DyGrEncoder(
                conv_out_channels=f, conv_num_layers=1, conv_aggr="mean",
                lstm_out_channels=32, lstm_num_layers=1, name="recurrent",
            )(x, graph, h, c)
            return nn.Dense(1, name="linear")(nn.relu(h_tilde))[..., 0], h, c

    model = DygraeNet()
    h0 = jnp.zeros((n, 32))
    c0 = jnp.zeros((n, 32))
    params = model.init(jax.random.PRNGKey(0), train.features[0],
                        train.graph(0), h0, c0)

    def dy_loss(p, carry, x, y, g):
        h, c = carry
        pred, h, c = model.apply(p, x, g, h, c)
        return mse(pred, y), (h, c)

    tr = SnapshotTrainer(dy_loss, optax.adam(1e-2))
    params, _ = tr.fit(params, train, epochs=epochs, init_carry=(h0, c0),
                       log_every=epochs)
    out["twittertennis_dygrae_test_mse"] = float(
        tr.evaluate(params, test, (h0, c0))
    )
    return out




def extra_bundled_accuracy(epochs_covid=100, epochs_bus=50) -> Dict[str, float]:
    """EnglandCovid + MontevideoBus test MSE (the remaining two bundled
    real datasets).  No reference example script pairs a model with these
    datasets, so the protocol follows the reference example *shape*
    (train_ratio 0.2, Adam(0.01), full-BPTT MSE averaged over snapshots):
    DCRNN on EnglandCovid (per-snapshot dynamic edge lists ride the scan)
    and GConvGRU on MontevideoBus.
    """
    import flax.linen as nn
    import jax
    import optax

    from pytorch_geometric_temporal_tpu.data import (
        EnglandCovidDatasetLoader,
        MontevideoBusDatasetLoader,
    )
    from pytorch_geometric_temporal_tpu.models import DCRNN, GConvGRU
    from pytorch_geometric_temporal_tpu.signal import (
        StackedSignal,
        temporal_signal_split,
    )
    from pytorch_geometric_temporal_tpu.train import SnapshotTrainer, mse

    out: Dict[str, float] = {}

    class CovidNet(nn.Module):
        @nn.compact
        def __call__(self, x, graph):
            h = DCRNN(out_channels=16, K=1, name="recurrent")(x, graph)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    dataset = EnglandCovidDatasetLoader().get_dataset(lags=8)
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    train = StackedSignal.from_signal(train_sig)
    test = StackedSignal.from_signal(test_sig)
    model = CovidNet()
    params = model.init(jax.random.PRNGKey(0), train.features[0],
                        train.graph(0))

    def covid_loss(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    tr = SnapshotTrainer(covid_loss, optax.adam(1e-2))
    params, _ = tr.fit(params, train, epochs=epochs_covid,
                       log_every=epochs_covid)
    out["englandcovid_dcrnn_test_mse"] = float(tr.evaluate(params, test))

    class BusNet(nn.Module):
        @nn.compact
        def __call__(self, x, graph):
            h = GConvGRU(out_channels=32, K=1, name="recurrent")(x, graph)
            return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]

    dataset = MontevideoBusDatasetLoader().get_dataset(lags=4)
    train_sig, test_sig = temporal_signal_split(dataset, 0.2)
    train = StackedSignal.from_signal(train_sig)
    test = StackedSignal.from_signal(test_sig)
    model = BusNet()
    params = model.init(jax.random.PRNGKey(0), train.features[0],
                        train.graph())

    def bus_loss(p, carry, x, y, g):
        return mse(model.apply(p, x, g), y), carry

    tr = SnapshotTrainer(bus_loss, optax.adam(1e-2))
    params, _ = tr.fit(params, train, epochs=epochs_bus,
                       log_every=epochs_bus)
    out["montevideobus_gconvgru_test_mse"] = float(tr.evaluate(params, test))
    return out


if __name__ == "__main__":
    import json

    rec = {}
    rec.update(pedalme_accuracy())
    rec.update(twitter_tennis_accuracy())
    rec.update(extra_bundled_accuracy())
    print(json.dumps({k: round(v, 4) for k, v in rec.items()}))
