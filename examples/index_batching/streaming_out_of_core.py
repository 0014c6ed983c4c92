"""Out-of-core training: a PeMS-scale series streamed from disk.

The reference's answer to series that exceed host RAM is
``IndexDataset(lazy=True)`` holding Dask arrays (reference
``torch_geometric_temporal/signal/index_dataset.py:54-55``); ours memory-
maps a ``.npy`` series and streams batches through
:class:`StreamingWindower` with bounded residency (see
``tests/test_out_of_core.py`` for the RSS assertion).

This example synthesizes an all-California-PeMS-shaped series
(11 160 sensors — reference ``examples/indexBatching/DCRNN/pems_main.py:
142``; shortened time axis so the demo writes ~2 GB max, scaled by
``--days``), writes it to disk chunk-by-chunk, then trains DCRNNSeq over
it without the series ever entering host RAM wholesale:

- window start indices shuffle per epoch (``iter_index_batches``),
- each batch's windows are gathered from the memory map into one
  contiguous buffer and shipped to device,
- on multi-host, ``load_time_shard`` + ``world_size``/``rank`` give each
  host only its slice.

Run: ``python streaming_out_of_core.py [--days 2] [--steps 20]``.
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_temporal_tpu.models import DCRNNSeq
from pytorch_geometric_temporal_tpu.ops import Graph
from pytorch_geometric_temporal_tpu.signal import (
    StreamingWindower,
    iter_index_batches,
)
from pytorch_geometric_temporal_tpu.train import masked_mae_loss
from pytorch_geometric_temporal_tpu.utils.profiling import host_memory_stats

N = 11_160           # all-California PeMS sensor count
F = 2                # speed + time-of-day
STEPS_PER_DAY = 288  # 5-minute sampling
H = 12


def write_series(path, days, seed=0, chunk=288):
    """Chunked on-disk synthesis — creation itself stays out-of-core."""
    t = days * STEPS_PER_DAY
    rng = np.random.default_rng(seed)
    mm = np.lib.format.open_memmap(path, mode="w+", dtype=np.float32,
                                   shape=(t, N, F))
    mm.flush()
    del mm
    base = rng.uniform(40.0, 70.0, size=N).astype(np.float32)
    for lo in range(0, t, chunk):
        hi = min(lo + chunk, t)
        mm = np.load(path, mmap_mode="r+")
        tod = (np.arange(lo, hi) % STEPS_PER_DAY) / STEPS_PER_DAY
        noise = rng.normal(scale=3.0, size=(hi - lo, N)).astype(np.float32)
        speed = np.clip(base[None, :] - 15.0 * np.sin(
            2 * np.pi * tod
        )[:, None].astype(np.float32) + noise, 0.0, 80.0)
        mm[lo:hi, :, 0] = speed
        mm[lo:hi, :, 1] = np.broadcast_to(
            tod[:, None].astype(np.float32), (hi - lo, N)
        )
        mm.flush()
        del mm
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--days", type=int, default=2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--world-size", type=int, default=1)
    args = ap.parse_args()

    path = os.path.join(tempfile.mkdtemp(prefix="pems_ooc_"), "series.npy")
    t = write_series(path, args.days)
    file_gb = t * N * F * 4 / 2**30
    print(f"wrote {file_gb:.2f} GB series ({t} steps x {N} sensors) to "
          f"{path}")

    # k-NN-style banded sensor graph (stand-in for the PeMS adjacency)
    rng = np.random.default_rng(1)
    deg = 6
    s = np.repeat(np.arange(N), deg)
    r = np.clip(s + rng.integers(-8, 9, size=s.shape[0]), 0, N - 1)
    w = rng.uniform(0.3, 1.0, s.shape[0]).astype(np.float32)
    graph = Graph.from_edge_index(np.stack([s, r]), w, num_nodes=N)

    # reopen_every bounds mapped-page residency: ~4 batches' touched
    # windows (~34 MB at this batch size) stay resident between remaps
    windower = StreamingWindower(path, H, reopen_every=4)
    model = DCRNNSeq(out_channels=F, K=2, unroll=H)
    x0, _ = windower(np.zeros(args.batch_size, np.int64))
    params = model.init(jax.random.PRNGKey(0), x0, graph)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(p, st, x, y):
        loss, grads = jax.value_and_grad(
            lambda p: masked_mae_loss(model.apply(p, x, graph), y)
        )(p)
        up, st = opt.update(grads, st)
        return optax.apply_updates(p, up), st, loss

    indices = np.arange(t - 2 * H + 1)
    done = 0
    rss0 = None
    for batch in iter_index_batches(indices, args.batch_size, shuffle=True,
                                    world_size=args.world_size,
                                    rank=args.rank):
        x, y = windower(batch)
        params, opt_state, loss = train_step(params, opt_state, x, y)
        # per-step sync keeps the demo's memory profile flat: without
        # it, every queued dispatch pins its host staging buffers until
        # the device catches up (drop the sync in production and let
        # the pipeline run ahead)
        loss = float(loss)
        done += 1
        if rss0 is None:
            # baseline AFTER the first step: model params, the BCSR
            # operator, and the compile arena are runtime memory — the
            # number we track is what STREAMING adds on top of them
            rss0 = host_memory_stats().get("rss", 0)
        if done % 5 == 0 or done == args.steps:
            rss = host_memory_stats().get("rss", 0)
            print(f"step {done}: loss {loss:.4f}  "
                  f"streaming RSS +{(rss - rss0)/1e6:.0f} MB "
                  f"(series on disk: {file_gb*1024:.0f} MB)")
        if done >= args.steps:
            break
    print("done — the series never entered host RAM wholesale")


if __name__ == "__main__":
    main()
