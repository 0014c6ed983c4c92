"""Checkpointed training with resume — the Lightning-interop equivalent.

The reference delegates checkpointing and training orchestration to
PyTorch Lightning (``examples/recurrent/lightning_example.py``); here the
same capabilities are library-level: SnapshotTrainer drives the loop,
orbax checkpoints persist (params, optimizer state, epoch), and a second
"process" resumes mid-training from the latest checkpoint and continues to
the same final loss it would have reached uninterrupted.
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
    SnapshotTrainer,
    latest_step,
    mse,
    restore_checkpoint,
    save_checkpoint,
)

from _common import chickenpox, epochs_from_argv


class RecurrentGCN(nn.Module):
    @nn.compact
    def __call__(self, x, graph, h=None):
        h = DCRNN(out_channels=32, K=1, name="recurrent")(x, graph, h)
        return nn.Dense(1, name="linear")(nn.relu(h))[..., 0], h


def main(epochs: int):
    train, test = chickenpox(lags=4)
    model = RecurrentGCN()
    params = model.init(jax.random.PRNGKey(42), train.features[0],
                        train.graph())

    def loss_and_state(p, carry, x, y, g):
        pred, carry = model.apply(p, x, g, carry)
        return mse(pred, y), carry

    trainer = SnapshotTrainer(loss_and_state, optax.adam(1e-2))
    carry0 = jnp.zeros((train.features.shape[1], 32))
    opt_state = trainer.init(params)

    ckpt_dir = tempfile.mkdtemp(prefix="pgtt_ckpt_")
    half = max(epochs // 2, 1)

    # ---- phase 1: train half the epochs, checkpoint, "crash" ----------
    for epoch in range(half):
        params, opt_state, loss = trainer.train_epoch(
            params, opt_state, train, carry0
        )
    save_checkpoint(ckpt_dir, {"params": params, "opt_state": opt_state},
                    step=half)
    print(f"checkpointed at epoch {half} (train MSE {float(loss):.4f})")

    # ---- phase 2: a fresh process resumes from the latest checkpoint --
    step = latest_step(ckpt_dir)
    template = {"params": model.init(jax.random.PRNGKey(0),
                                     train.features[0], train.graph()),
                "opt_state": trainer.init(params)}
    restored = restore_checkpoint(ckpt_dir, step=step, template=template)
    params2, opt_state2 = restored["params"], restored["opt_state"]
    print(f"resumed from epoch {step}")
    for epoch in range(step, epochs):
        params2, opt_state2, loss = trainer.train_epoch(
            params2, opt_state2, train, carry0
        )
    print(f"final train MSE {float(loss):.4f}")
    print(f"test MSE: {float(trainer.evaluate(params2, test, carry0)):.4f}")


if __name__ == "__main__":
    main(epochs_from_argv(40))
