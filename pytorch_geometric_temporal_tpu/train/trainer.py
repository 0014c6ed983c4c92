"""Jit-compiled training loops.

The reference has no trainer (training lives in example scripts,
``examples/recurrent/gconvgru_example.py:38-46``); here the two canonical
protocols are first-class, fully fused, device-resident steps:

- :class:`SnapshotTrainer` — the snapshot-loop protocol: loss accumulated
  over ALL snapshots of a :class:`~..signal.StackedSignal`, one optimizer
  update per epoch (full-sequence BPTT).  The whole epoch (scan over T,
  backward, update) is ONE jitted function: zero per-snapshot Python
  dispatch, optional ``jax.checkpoint`` rematerialization to keep memory
  O(1) in T.
- :class:`BatchTrainer` — the index-batched seq2seq protocol (reference
  ``examples/indexBatching/DCRNN/pems_main.py:60-76``): per-batch update,
  optional z-score de-normalization + masked MAE.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from ..signal.stacked import StackedSignal
from . import losses as losses_lib


class SnapshotTrainer:
    """Full-BPTT snapshot-loop training, one jitted fn per epoch.

    Args:
        loss_and_state_fn: ``(params, carry, x, y, graph) -> (loss, carry)``
            called per snapshot; ``carry`` threads recurrent state across
            snapshots (pass ``None``-free pytrees; use () if stateless).
        optimizer: an optax optimizer.
        remat: wrap the per-snapshot computation in ``jax.checkpoint`` so
            the backward pass recomputes activations (O(1) memory in T).
    """

    def __init__(self, loss_and_state_fn: Callable, optimizer,
                 remat: bool = False):
        self.optimizer = optimizer
        step = loss_and_state_fn
        if remat:
            step = jax.checkpoint(step)

        def epoch_loss(params, signal: StackedSignal, init_carry):
            def body(carry, x, y, g):
                state, acc = carry
                loss, state = step(params, state, x, y, g)
                return (state, acc + loss), ()

            (state, total), _ = signal.scan(body, (init_carry, jnp.float32(0.0)))
            return total / signal.snapshot_count, state

        def train_epoch(params, opt_state, signal, init_carry):
            (loss, _), grads = jax.value_and_grad(epoch_loss, has_aux=True)(
                params, signal, init_carry
            )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_epoch = jax.jit(train_epoch)
        self._eval_epoch = jax.jit(epoch_loss)

        def train_epochs(params, opt_state, signal, init_carry, num_epochs):
            def body(_, c):
                p, s, _ = c
                return train_epoch(p, s, signal, init_carry)

            return jax.lax.fori_loop(
                0, num_epochs, body,
                (params, opt_state, jnp.float32(0.0)),
            )

        self._train_epochs = jax.jit(train_epochs, static_argnums=(4,))

    def init(self, params):
        return self.optimizer.init(params)

    def train_epoch(self, params, opt_state, signal, init_carry=()):
        return self._train_epoch(params, opt_state, signal, init_carry)

    def evaluate(self, params, signal, init_carry=()):
        loss, _ = self._eval_epoch(params, signal, init_carry)
        return loss

    def fit(self, params, signal, epochs: int, init_carry=(),
            callback: Optional[Callable] = None, log_every: int = 1):
        """Run ``epochs`` updates with ONE device dispatch per ``log_every``
        epochs (a ``fori_loop`` of whole epochs inside jit) — minimizes
        host→device round trips.  The callback receives the *device* loss
        scalar of the chunk's last epoch — ``float()`` it only if you want
        to block."""
        opt_state = self.init(params)
        loss = None
        done = 0
        while done < epochs:
            chunk = min(max(log_every, 1), epochs - done)
            params, opt_state, loss = self._train_epochs(
                params, opt_state, signal, init_carry, chunk
            )
            done += chunk
            if callback is not None:
                callback(done - 1, loss)
        if loss is not None:
            jax.block_until_ready(loss)
        return params, opt_state


class BatchTrainer:
    """Per-batch seq2seq training (index-batching protocol).

    Args:
        apply_fn: ``(params, x_batch) -> predictions``.
        optimizer: optax optimizer.
        loss_fn: ``(pred, target) -> scalar``; defaults to masked MAE on
            de-normalized values when a scaler is given (reference protocol,
            ``pems_main.py:68-71``), else plain MSE.
        scaler: optional ZScoreScaler applied inversely before the loss.
    """

    def __init__(self, apply_fn, optimizer, loss_fn=None, scaler=None):
        self.optimizer = optimizer

        if loss_fn is None:
            if scaler is not None:
                def loss_fn(pred, target):
                    return losses_lib.masked_mae_loss(
                        scaler.inverse(pred), scaler.inverse(target)
                    )
            else:
                loss_fn = losses_lib.mse

        def compute_loss(params, x, y):
            return loss_fn(apply_fn(params, x), y)

        def train_step(params, opt_state, x, y):
            loss, grads = jax.value_and_grad(compute_loss)(params, x, y)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._train_step = jax.jit(train_step)
        self._eval_step = jax.jit(compute_loss)

    def init(self, params):
        return self.optimizer.init(params)

    def train_step(self, params, opt_state, x, y):
        return self._train_step(params, opt_state, x, y)

    def eval_step(self, params, x, y):
        return self._eval_step(params, x, y)

    def fit(self, params, loader, epochs: int, val_loader=None,
            callback: Optional[Callable] = None):
        """Per-batch training loop.  Losses accumulate ON DEVICE; the host
        syncs once per epoch (at the callback), not once per batch."""
        import jax.numpy as jnp

        opt_state = self.init(params)
        for epoch in range(epochs):
            total, nb = jnp.float32(0.0), 0
            for x, y in loader:
                params, opt_state, loss = self.train_step(
                    params, opt_state, x, y
                )
                total = total + loss
                nb += 1
            val = None
            if val_loader is not None:
                vt, vn = jnp.float32(0.0), 0
                for x, y in val_loader:
                    vt = vt + self.eval_step(params, x, y)
                    vn += 1
                val = float(vt) / max(vn, 1)
            if callback is not None:
                callback(epoch, float(total) / max(nb, 1), val)
        return params, opt_state
