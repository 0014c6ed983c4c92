"""Out-of-core index batching: memory-mapped series never materialize.

The reference's ``IndexDataset(lazy=True)`` holds Dask arrays so workers
only read the chunks their windows touch (reference
``signal/index_dataset.py:54-55``).  Our equivalent memory-maps an ``.npy``
series; these tests build a ~96 MB on-disk series (a scaled stand-in for
the 9.4 GB all-California PeMS year) and assert that

- lazy ``IndexDataset`` items match the eager path bit-for-bit,
- a full streaming epoch through ``IndexLoader(StreamingWindower)`` keeps
  the process RSS growth far below the file size,
- ``load_time_shard`` hands each host exactly the slice its indices touch.
"""

import numpy as np
import pytest

from pytorch_geometric_temporal_tpu.signal import (
    DeviceWindower,
    IndexDataset,
    IndexLoader,
    StreamingWindower,
    load_time_shard,
)
from pytorch_geometric_temporal_tpu.utils.profiling import host_memory_stats

T, N, F = 6000, 4000, 2  # 6000*4000*2*4 B = 192 MB on disk
H = 12


@pytest.fixture(scope="module")
def series_path(tmp_path_factory):
    """Write the series chunk-by-chunk so creation itself stays small."""
    path = tmp_path_factory.mktemp("ooc") / "series.npy"
    chunk = 250
    mm = np.lib.format.open_memmap(
        path, mode="w+", dtype=np.float32, shape=(T, N, F)
    )
    mm.flush()
    del mm
    for lo in range(0, T, chunk):
        mm = np.load(path, mmap_mode="r+")
        t = np.arange(lo, min(lo + chunk, T), dtype=np.float32)
        mm[lo : lo + chunk] = (
            t[:, None, None] + np.arange(N, dtype=np.float32)[None, :, None]
        ) % 97.0
        mm.flush()
        del mm
    return path


def test_lazy_dataset_matches_eager(series_path):
    idx = np.array([0, 7, T - 2 * H])
    lazy = IndexDataset(idx, series_path, H, lazy=True)
    assert lazy.lazy and isinstance(lazy.data, np.memmap)
    eager = IndexDataset(idx, np.load(series_path), H)
    for i in range(len(idx)):
        xl, yl = lazy[i]
        xe, ye = eager[i]
        np.testing.assert_array_equal(xl, xe)
        np.testing.assert_array_equal(yl, ye)


def test_streaming_epoch_bounded_rss(series_path):
    """A full epoch over the 96 MB file reads bounded host memory.

    Asserts on the host streaming path (``host_batch``): on TPU hardware
    the device batch lands in HBM, so host RSS is exactly what this path
    allocates.  (Running the same loop through ``jnp.asarray`` on the CPU
    *test* backend would add jax-CPU allocator arenas to RSS — device
    buffers, not data-path residency.)
    """
    from pytorch_geometric_temporal_tpu.signal import iter_index_batches

    file_bytes = T * N * F * 4
    windower = StreamingWindower(series_path, H, reopen_every=2)
    assert windower.shape == (T, N, F)
    # every start index — the epoch walks the ENTIRE file
    indices = np.arange(T - 2 * H + 1)
    rss0 = host_memory_stats()["rss"]
    peak_delta = 0
    total = 0.0
    nb = 0
    for batch in iter_index_batches(indices, 32, shuffle=True,
                                    drop_last=True):
        win = windower.host_batch(batch)
        assert win.shape == (32, 2 * H, N, F)
        total += float(win[0, 0, 0, 0]) + float(win[-1, -1, -1, -1])
        nb += 1
        peak_delta = max(peak_delta, host_memory_stats()["rss"] - rss0)
    assert nb == len(indices) // 32
    assert np.isfinite(total)
    # Streaming must not accumulate the file: residency is bounded by the
    # reused 24 MB batch buffer + mapped pages between reopens (2 batches
    # · 32 shuffled windows · ~0.77 MB/window ≈ 49 MB) — a constant that
    # does NOT scale with the series (measured ~71 MB here), far below the
    # 192 MB file and ~0.8% of the 9.4 GB PeMS year it stands in for.
    assert peak_delta < file_bytes * 0.45, (
        f"RSS grew {peak_delta/1e6:.0f} MB on a {file_bytes/1e6:.0f} MB file"
    )


def test_streaming_matches_device_windower(series_path):
    sub = np.load(series_path, mmap_mode="r")[:200]
    small = np.array(sub)
    dev = DeviceWindower(small, H)
    stream = StreamingWindower(series_path, H)
    idx = np.array([0, 3, 100])
    xd, yd = dev(idx)
    xs, ys = stream(idx)
    np.testing.assert_allclose(np.asarray(xd), np.asarray(xs))
    np.testing.assert_allclose(np.asarray(yd), np.asarray(ys))


def test_load_time_shard(series_path):
    # rank 1 of 2: odd indices
    indices = np.arange(T - 2 * H + 1)[1::2][:50]
    shard, shifted = load_time_shard(series_path, indices, H)
    assert isinstance(shard, np.memmap)  # lazy view, not a copy
    assert shard.shape[0] == int(indices.max()) + 2 * H - int(indices.min())
    full = np.load(series_path, mmap_mode="r")
    i = int(indices[3])
    np.testing.assert_array_equal(
        np.asarray(shard[shifted[3] : shifted[3] + H]),
        np.asarray(full[i : i + H]),
    )
    in_ram, _ = load_time_shard(series_path, indices[:4], H, lazy=False)
    assert isinstance(in_ram, np.ndarray) and not isinstance(in_ram, np.memmap)


def test_streaming_rejects_overrun_start(series_path):
    windower = StreamingWindower(series_path, H)
    with pytest.raises(ValueError, match="overruns"):
        windower.host_batch(np.array([0, T - H]))  # needs 2H headroom


def test_load_time_shard_rejects_empty(series_path):
    with pytest.raises(ValueError, match="at least one index"):
        load_time_shard(series_path, np.array([], dtype=np.int64), H)


def test_index_loader_len_matches_iteration_under_sharding():
    """len(loader) must equal the yielded batch count for EVERY rank,
    including world sizes that do not divide the index count."""
    data = np.arange(101 * 3, dtype=np.float32).reshape(101, 3)
    windower = DeviceWindower(data, H)
    indices = np.arange(101 - 2 * H + 1)  # 78 starts
    for world_size in (1, 2, 3, 4, 5):
        for rank in range(world_size):
            for drop_last in (False, True):
                loader = IndexLoader(
                    indices, windower, batch_size=8, drop_last=drop_last,
                    world_size=world_size, rank=rank,
                )
                assert len(loader) == sum(1 for _ in loader), (
                    world_size, rank, drop_last,
                )


def test_streaming_rejects_negative_start(series_path):
    windower = StreamingWindower(series_path, H)
    with pytest.raises(ValueError, match="negative window start"):
        windower.host_batch(np.array([3, -2]))
