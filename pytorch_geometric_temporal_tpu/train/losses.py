"""Loss functions and forecasting metrics.

Replaces the reference's example-level utilities
(``examples/indexBatching/DCRNN/utils.py:10-18`` masked MAE with NaN-zeroing;
z-score de-normalization at loss time ``pems_main.py:71``), promoted here to
library code.
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mae(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def rmse(pred, target):
    return jnp.sqrt(mse(pred, target))


def masked_mae_loss(y_pred, y_true, null_val: float = 0.0):
    """MAE over entries where ``y_true != null_val``; NaNs zeroed.

    Exact semantics of reference ``utils.py:10-18``: the mask is mean-
    normalized, multiplied into the elementwise loss, and NaNs (from
    all-masked slices) are replaced with zero.
    """
    mask = (y_true != null_val).astype(y_pred.dtype)
    mask = mask / jnp.maximum(jnp.mean(mask), 1e-16)
    loss = jnp.abs(y_pred - y_true) * mask
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
    return jnp.mean(loss)


def masked_mse_loss(y_pred, y_true, null_val: float = 0.0):
    mask = (y_true != null_val).astype(y_pred.dtype)
    mask = mask / jnp.maximum(jnp.mean(mask), 1e-16)
    loss = ((y_pred - y_true) ** 2) * mask
    loss = jnp.where(jnp.isnan(loss), 0.0, loss)
    return jnp.mean(loss)


def mape(pred, target, eps: float = 1e-8):
    return jnp.mean(jnp.abs((pred - target) / jnp.maximum(jnp.abs(target), eps)))
