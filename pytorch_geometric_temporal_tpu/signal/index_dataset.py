"""Index-batched windowed datasets (the PGT-I memory-efficiency idea).

Parity with reference ``signal/index_dataset.py:8-57``: a dataset over
*window start indices* rather than materialized windows —
``x = data[i : i+horizon]``, ``y = data[i+horizon : i+2*horizon]``.

TPU-native redesign: instead of the reference's three modes (numpy / GPU
tensor views / lazy Dask chunks), :class:`IndexDataset` keeps the raw numpy
semantics for host iteration, and :meth:`device_batches` /
:class:`DeviceWindower` provide the device-resident path — the full series
lives on device once and windows are gathered with one fused ``take`` per
batch inside jit (zero per-batch host↔device traffic, the moral equivalent
of the reference's ``gpu=True`` without per-item tensor views).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class IndexDataset:
    """Host-side windowed dataset over indices (reference-compatible)."""

    def __init__(self, indices, data, horizon: int, lazy: bool = False):
        self.indices = np.asarray(indices)
        self.data = data
        self.horizon = int(horizon)
        self.lazy = lazy  # kept for API parity; numpy arrays are never lazy

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, x) -> Tuple[np.ndarray, np.ndarray]:
        idx = self.indices[x]
        h = self.horizon
        return (
            np.asarray(self.data[idx : idx + h]),
            np.asarray(self.data[idx + h : idx + 2 * h]),
        )


class DeviceWindower:
    """Device-resident window gather: the TPU path for index batching.

    The data array (T, ...) is transferred to device once; a batch of start
    indices turns into a single gather producing (B, 2·horizon, ...) which
    is split into inputs and targets.  Jit-safe; combine with a sharded
    leading batch dim for data parallelism.
    """

    def __init__(self, data, horizon: int, sharding=None):
        self.horizon = int(horizon)
        arr = jnp.asarray(data)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        self.data = arr

    def __call__(self, start_indices) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = self.horizon
        offs = jnp.arange(2 * h)
        idx = jnp.asarray(start_indices)[:, None] + offs[None, :]
        win = jnp.take(self.data, idx, axis=0)  # (B, 2h, ...)
        return win[:, :h], win[:, h:]


class IndexLoader:
    """Minimal DataLoader equivalent over window start indices.

    Iterating yields ``(x, y)`` device batches of shape (B, horizon, ...)
    gathered on device by a shared :class:`DeviceWindower` — replaces torch
    ``DataLoader(IndexDataset)`` in the reference's index-batching path
    (``dataset/chickenpox.py:74-132``).
    """

    def __init__(self, indices, windower: "DeviceWindower", batch_size: int,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False,
                 world_size: int = 1, rank: int = 0):
        self.indices = np.asarray(indices)
        self.windower = windower
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.world_size = world_size
        self.rank = rank
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.indices) // self.world_size if self.world_size > 1 else len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        self._epoch += 1
        for batch in iter_index_batches(
            self.indices, self.batch_size, shuffle=self.shuffle,
            rng=self._rng, drop_last=self.drop_last,
            world_size=self.world_size, rank=self.rank,
        ):
            yield self.windower(jnp.asarray(batch))


def iter_index_batches(
    indices,
    batch_size: int,
    *,
    shuffle: bool = True,
    rng: Optional[np.random.Generator] = None,
    drop_last: bool = True,
    world_size: int = 1,
    rank: int = 0,
) -> Iterator[np.ndarray]:
    """Yield batches of window start indices, optionally sharded by rank.

    Replaces torch ``DataLoader`` + ``DistributedSampler`` over an
    ``IndexDataset`` (reference ``dataset/metr_la.py:220-228``): with
    ``world_size > 1`` each rank sees a disjoint 1/world_size slice per
    epoch, like ``DistributedSampler(shuffle=...)``.
    """
    indices = np.asarray(indices)
    if shuffle:
        rng = rng or np.random.default_rng(0)
        indices = rng.permutation(indices)
    if world_size > 1:
        indices = indices[rank::world_size]
    n = len(indices)
    stop = n - (n % batch_size) if drop_last else n
    for i in range(0, stop, batch_size):
        yield indices[i : i + batch_size]
