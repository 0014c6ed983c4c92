"""Training-health guards (absent in the reference — SURVEY §5 notes its
Dask path swallows worker errors entirely).

Lightweight failure detection: NaN/Inf loss detection with bounded history,
and a divergence guard that restores the last good checkpoint.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp


def loss_is_finite(loss) -> jnp.ndarray:
    """Device-side scalar: True when the loss is finite (no host sync)."""
    return jnp.isfinite(loss)


class DivergenceGuard:
    """Detects NaN/exploding loss and rolls back to the last good state.

    Usage::

        guard = DivergenceGuard(explode_factor=10.0)
        for epoch ...:
            params, opt_state, loss = train_epoch(...)
            params, opt_state, ok = guard.check(params, opt_state, loss)
            if not ok: lr_schedule.backoff()  # or stop

    ``check`` syncs the loss scalar to host — call it at logging cadence,
    not per step, on latency-sensitive transports.
    """

    def __init__(self, explode_factor: float = 10.0, patience: int = 1):
        self.explode_factor = explode_factor
        self.patience = patience
        self._best: Optional[float] = None
        self._good_state: Any = None
        self._bad_streak = 0

    def check(self, params, opt_state, loss):
        val = float(loss)
        healthy = (val == val) and (
            self._best is None or val < self._best * self.explode_factor
        )
        if healthy:
            self._best = val if self._best is None else min(self._best, val)
            self._good_state = (params, opt_state)
            self._bad_streak = 0
            return params, opt_state, True
        self._bad_streak += 1
        if self._good_state is not None and self._bad_streak >= self.patience:
            params, opt_state = self._good_state
        return params, opt_state, False
