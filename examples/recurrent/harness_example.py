"""Full training-harness composition — the Lightning-interop equivalent.

The reference wires DCRNN into PyTorch Lightning for orchestration
(``/root/reference/examples/recurrent/lightning_example.py:12-65``:
optimizer config, train/val steps, metric logging, early stopping).  The
JAX-native composition here provides every one of those capabilities from
library components, in one jit-compiled resumable step:

- :class:`TrainState` — (step, params, opt state) as one pytree,
- :class:`CheckpointManager` — async orbax saves + resume-from-latest,
- :class:`DivergenceGuard` — NaN/explosion rollback (Lightning has no
  equivalent; its job is done by hand-written callbacks),
- metric logging via :class:`StepTimer` + a val-loss history,
- early stopping on validation loss (patience, min_delta — the
  ``EarlyStopping`` callback's semantics).

Same protocol as the reference script: chickenpox, lags=32, DCRNN(K=1)
filters=16 + linear head, Adam(1e-2), MSE, train_ratio 0.2.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import tempfile

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from pytorch_geometric_temporal_tpu.models import DCRNN
from pytorch_geometric_temporal_tpu.train import (
    CheckpointManager,
    DivergenceGuard,
    TrainState,
    apply_gradients,
    mse,
)
from pytorch_geometric_temporal_tpu.utils.profiling import StepTimer

from _common import chickenpox, epochs_from_argv


class RecurrentGCN(nn.Module):
    filters: int = 16

    @nn.compact
    def __call__(self, x, graph):
        h = DCRNN(out_channels=self.filters, K=1, name="recurrent")(x, graph)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0]


def main(epochs=20, patience=10, min_delta=0.0):
    # chickenpox() applies the reference protocol's temporal_signal_split
    # (train_ratio 0.2) and stacks both splits device-resident
    train, val = chickenpox(lags=32)
    graph = train.graph()

    model = RecurrentGCN()
    optimizer = optax.adam(1e-2)
    params = model.init(jax.random.PRNGKey(0), train.features[0], graph)
    state = TrainState.create(params, optimizer)

    # one compiled epoch: scan over the stacked snapshots, one optimizer
    # update per snapshot (the reference's per-batch training_step)
    @jax.jit
    def train_epoch(state, feats, targs):
        def step(st, xy):
            x, y = xy
            loss, grads = jax.value_and_grad(
                lambda p: mse(model.apply(p, x, graph), y)
            )(st.params)
            return apply_gradients(st, grads, optimizer), loss

        state, losses = jax.lax.scan(step, state, (feats, targs))
        return state, losses.mean()

    @jax.jit
    def val_loss(params, feats, targs):
        def one(carry, xy):
            x, y = xy
            return carry, mse(model.apply(params, x, graph), y)

        _, losses = jax.lax.scan(one, (), (feats, targs))
        return losses.mean()

    ckpt_dir = os.environ.get("CKPT_DIR", tempfile.mkdtemp(prefix="harness_"))
    mgr = CheckpointManager(ckpt_dir, max_to_keep=2)
    restored = mgr.restore(template=state)
    if restored is not None:
        state = restored
        print(f"resumed from step {int(state.step)} in {ckpt_dir}")

    guard = DivergenceGuard(explode_factor=10.0)
    timer = StepTimer(items_per_step=train.features.shape[0])
    history = []
    best_val, bad_epochs = float("inf"), 0
    start_epoch = int(state.step) // train.features.shape[0]
    for epoch in range(start_epoch, epochs):
        prev_state = state  # rollback target: the FULL pre-epoch state
        with timer:
            state, train_mse = train_epoch(state, train.features,
                                           train.targets)
            train_mse = float(train_mse)  # blocks: StepTimer needs sync
        _, _, ok = guard.check(state.params, state.opt_state, train_mse)
        if not ok:
            # restore step along with params/opt_state — keeping the
            # diverged epoch's advanced counter would skew the
            # step//num_snapshots resume arithmetic
            state = prev_state
            print(f"epoch {epoch}: diverged (loss {train_mse:.4f}), "
                  "rolled back")
            continue
        v = float(val_loss(state.params, val.features, val.targets))
        history.append({"epoch": epoch, "train_mse": round(train_mse, 4),
                        "val_mse": round(v, 4)})
        mgr.save(int(state.step), state)
        print(f"epoch {epoch}: train {train_mse:.4f} val {v:.4f}")
        # EarlyStopping(monitor='val_loss', patience, min_delta) semantics
        if v < best_val - min_delta:
            best_val, bad_epochs = v, 0
        else:
            bad_epochs += 1
            if bad_epochs >= patience:
                print(f"early stop at epoch {epoch} "
                      f"(no val improvement for {patience} epochs)")
                break
    mgr.wait()
    print(timer.summary())
    print(f"best val MSE {best_val:.4f}; checkpoints in {ckpt_dir}")
    return best_val, history


if __name__ == "__main__":
    main(epochs=epochs_from_argv(20))
