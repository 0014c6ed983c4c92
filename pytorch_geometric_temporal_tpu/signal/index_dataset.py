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

Out-of-core path (the reference's ``lazy=True`` Dask mode, reference
``signal/index_dataset.py:54-55``): series too large for host RAM live on
disk as ``.npy`` and are opened memory-mapped.  ``IndexDataset(indices,
path, horizon, lazy=True)`` reads only the touched windows;
:class:`StreamingWindower` is the matching device feeder — it gathers each
batch's windows from the mapped file into one contiguous buffer and ships
it, re-opening the map periodically so clean page-cache residency never
accumulates in the process RSS.  :func:`load_time_shard` is the multi-host
complement: each host maps only the contiguous time range its ranks'
indices touch (PeMS-scale year-long series shard across hosts by time).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

PathLike = Union[str, "os.PathLike[str]"]


def _open_series(data, lazy: bool):
    """ndarray | memmap | .npy path -> array-like (mapped when lazy)."""
    if isinstance(data, (str, os.PathLike)):
        return np.load(data, mmap_mode="r" if lazy else None)
    return data


class IndexDataset:
    """Host-side windowed dataset over indices (reference-compatible).

    ``data`` may be an ndarray, an ``np.memmap``, or a path to a ``.npy``
    file.  With ``lazy=True`` a path is opened memory-mapped and an
    ndarray is left untouched — ``__getitem__`` then materializes only the
    two requested windows, so year-long multi-thousand-node series never
    enter host RAM wholesale (reference ``signal/index_dataset.py:54-55``,
    where the same flag holds Dask arrays).
    """

    def __init__(self, indices, data, horizon: int, lazy: bool = False):
        self.indices = np.asarray(indices)
        self.data = _open_series(data, lazy)
        self.horizon = int(horizon)
        self.lazy = lazy

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


class StreamingWindower:
    """Out-of-core window feeder: memory-mapped host series → device batches.

    The disk-resident counterpart of :class:`DeviceWindower` for series
    that fit neither in HBM nor in host RAM (all-California PeMS: 11160
    nodes × a year of 5-min steps ≈ 9.4 GB f32).  Holds a *path* to a
    ``.npy`` file; per batch it gathers the requested windows from the
    memory map into one contiguous (B, 2h, ...) buffer and device-puts it.
    Only the touched pages are ever read, and the map is re-opened every
    ``reopen_every`` batches so clean file-backed pages don't accumulate
    in the process RSS across an epoch (they'd be reclaimable, but bounded
    beats reclaimable when other hosts share the box).

    Same ``__call__`` contract as :class:`DeviceWindower`, so
    :class:`IndexLoader` drives either interchangeably.
    """

    def __init__(self, path: PathLike, horizon: int, sharding=None,
                 reopen_every: int = 64):
        self.path = os.fspath(path)
        self.horizon = int(horizon)
        self.sharding = sharding
        self.reopen_every = int(reopen_every)
        self._mm = None
        self._batches_since_open = 0
        self._buf = None  # reused host batch buffer (avoids malloc churn)
        # validate header once (shape/dtype live in the .npy header)
        mm = np.load(self.path, mmap_mode="r")
        self.shape = mm.shape
        self.dtype = mm.dtype
        del mm

    def _map(self):
        if self._mm is None or self._batches_since_open >= self.reopen_every:
            self._mm = np.load(self.path, mmap_mode="r")
            self._batches_since_open = 0
        self._batches_since_open += 1
        return self._mm

    def host_batch(self, start_indices) -> np.ndarray:
        """(B, 2·horizon, ...) contiguous host buffer for these starts.

        The returned array is a REUSED internal buffer (overwritten by the
        next call) — copy it if you need to hold more than one batch.
        ``__call__`` copies it to device immediately, so the reuse is
        invisible on that path.
        """
        mm = self._map()
        h2 = 2 * self.horizon
        idx = np.asarray(start_indices)
        if idx.size:
            if int(idx.max()) + h2 > self.shape[0]:
                bad = int(idx[int(np.argmax(idx))])
                raise ValueError(
                    f"window start {bad} + 2*horizon ({h2}) overruns the "
                    f"series (length {self.shape[0]}); valid starts are "
                    f"[0, {self.shape[0] - h2}]"
                )
            if int(idx.min()) < 0:
                bad = int(idx[int(np.argmin(idx))])
                raise ValueError(
                    f"negative window start {bad}: numpy would wrap it to "
                    f"the series tail; valid starts are "
                    f"[0, {self.shape[0] - h2}]"
                )
        shape = (len(idx), h2) + self.shape[1:]
        if self._buf is None or self._buf.shape != shape:
            self._buf = np.empty(shape, self.dtype)
        out = self._buf
        for j, i in enumerate(idx):
            out[j] = mm[i : i + h2]
        return out

    def __call__(self, start_indices) -> Tuple[jnp.ndarray, jnp.ndarray]:
        win = jnp.asarray(self.host_batch(start_indices))
        if self.sharding is not None:
            win = jax.device_put(win, self.sharding)
        h = self.horizon
        return win[:, :h], win[:, h:]


def load_time_shard(data, indices, horizon: int, lazy: bool = True):
    """Per-host time shard: the contiguous slice these indices touch.

    Multi-host index batching gives each host a disjoint index slice
    (``iter_index_batches(world_size, rank)``); the host then needs only
    ``[min(idx), max(idx) + 2·horizon)`` of the series.  Returns
    ``(shard, shifted_indices)`` where ``shard`` is a view of the mapped
    file (``lazy=True``) or an in-RAM copy, and ``shifted_indices`` index
    into it.  Replaces the reference's per-worker Dask chunk reads.
    """
    indices = np.asarray(indices)
    if indices.size == 0:
        raise ValueError("load_time_shard needs at least one index "
                         "(this rank's index slice is empty)")
    series = _open_series(data, lazy=True)
    lo = int(indices.min())
    hi = min(int(indices.max()) + 2 * horizon, series.shape[0])
    shard = series[lo:hi]
    if not lazy:
        shard = np.array(shard)
    return shard, indices - lo


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
        # Must agree with iteration: the iterator shards
        # ``indices[rank::world_size]``, whose length is rank-dependent
        # when ``len(indices) % world_size != 0``.
        n = len(self.indices)
        if self.world_size > 1:
            n = len(range(self.rank, n, self.world_size))
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
