"""Feature scalers (z-score normalization used by the traffic datasets).

Mirrors the reference's inline normalization (``dataset/metr_la.py:82-86``)
and loss-time de-normalization (``pems_main.py:71``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["mean", "std"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ZScoreScaler:
    mean: jnp.ndarray
    std: jnp.ndarray

    @staticmethod
    def fit(data, axis=None) -> "ZScoreScaler":
        data = np.asarray(data)
        return ZScoreScaler(
            mean=jnp.asarray(np.mean(data, axis=axis, dtype=np.float64),
                             dtype=jnp.float32),
            std=jnp.asarray(np.std(data, axis=axis, dtype=np.float64),
                            dtype=jnp.float32),
        )

    def transform(self, x):
        return (x - self.mean) / jnp.where(self.std == 0, 1.0, self.std)

    def inverse(self, x):
        return x * self.std + self.mean
