"""Component-level timing of the hybrid BCSR spmm (tile vs remainder).

Measures, on the bench's banded 50k/2M graph (5% random cross edges):
  - tile Pallas kernel alone,
  - the remainder (XLA row-gather + Pallas one-hot scatter kernel),
  - the XLA segment-sum remainder (the pre-round-3 path, for comparison),
  - the fused hybrid,
all with dispatch-corrected timing (``device_time_per_iter`` — this
platform's remote tunnel adds ~25 ms of FIXED per-execution overhead that
polluted every round-2 number measured at 50-100 iters).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_geometric_temporal_tpu.ops import BCSRMatrix, Graph
from pytorch_geometric_temporal_tpu.ops.bcsr import (
    _bcsr_matmul_pallas,
    _f_layout,
    _rem_scatter_call,
    _remainder_xla,
    _tile_kernel_call,
    hybrid_hbm_bytes,
)

HBM_PEAK_GBS = 819.0  # TPU v5e HBM bandwidth (~819 GB/s)
from pytorch_geometric_temporal_tpu.utils.profiling import (
    device_time_per_iter,
)


def make_bench_graph(n=50_000, deg=40, band=96, cross=0.05, seed=1):
    rng = np.random.default_rng(seed)
    e = n * deg
    e_loc = int(e * (1 - cross))
    s = rng.integers(0, n, size=e_loc)
    r = np.clip(s + rng.integers(-band, band + 1, size=e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, size=e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, size=e - e_loc)])
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    deg_r = np.bincount(r, weights=w, minlength=n).astype(np.float32)
    w = w / np.maximum(deg_r[r], 1e-6)
    return Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n), e, rng


def main():
    f = 64
    g, e, rng = make_bench_graph()
    mat = BCSRMatrix.from_graph(g, dtype=jnp.bfloat16,
                                min_block_edges="auto", expected_f=f)
    h = mat.fwd
    print(f"nnzb={h.nnzb} num_rem={h.num_rem} rem_steps="
          f"{h.rem_step_rb.shape[0]} tile_steps={h.step_rows.shape[0]} "
          f"n_pad={h.num_rows}", flush=True)

    x = jnp.asarray(rng.normal(size=(h.num_rows, f)).astype(np.float32))

    def stabil(fn):
        return lambda a: fn(a) * 0.5 + a * 0.5

    def report(name, dt, edges):
        print(f"{name:22s} {dt*1e6:9.1f} us  "
              f"({edges/dt/1e9:6.2f} G edges/s)", flush=True)
        return dt

    # full hybrid through the public path
    dt_h = device_time_per_iter(
        stabil(lambda a: _bcsr_matmul_pallas(h, a)), x)
    report("hybrid (pallas)", dt_h, e)

    # tile kernel alone (pre-padded bf16 input)
    xp, f_pad, f_tiles, f_tile = _f_layout(x, 512)
    xp16 = xp.astype(jnp.bfloat16)

    def tile_only(a):
        out = _tile_kernel_call(h, a, f_pad, f_tiles, f_tile, False)
        return out.astype(jnp.bfloat16) * 0.5 + a * 0.5

    dt_t = device_time_per_iter(tile_only, xp16)
    report("tile kernel", dt_t, e - h.num_rem)

    # remainder: gather + scatter kernel (aliased over a zero base)
    base = jnp.zeros((h.num_rows, f_pad), jnp.float32)

    def rem_only(a):
        xg = a[h.rem_cols]
        out = _rem_scatter_call(h, xg, base + 0.0, f_pad, f_tiles, f_tile,
                                False)
        return out.astype(jnp.bfloat16) * 0.5 + a * 0.5

    dt_r = device_time_per_iter(rem_only, xp16)
    report("remainder (kernel)", dt_r, h.num_rem)

    # the pre-round-3 XLA segment-sum remainder, for comparison
    def rem_xla(a):
        out = _remainder_xla(h, a)
        return out.astype(jnp.bfloat16) * 0.5 + a * 0.5

    dt_rx = device_time_per_iter(rem_xla, xp16, iters=100)
    report("remainder (XLA)", dt_rx, h.num_rem)

    # Roofline: the kernel is HBM-bandwidth-bound (see hybrid_hbm_bytes);
    # report achieved bytes/s per phase against the v5e's ~819 GB/s peak.
    bts = hybrid_hbm_bytes(h, f)
    for name, nbytes, dt in (
        ("tile", bts["tile"], dt_t),
        ("remainder", bts["remainder"], dt_r),
        ("hybrid", bts["total"], dt_h),
    ):
        gbs = nbytes / dt / 1e9
        print(f"roofline {name:10s} {nbytes/1e6:8.1f} MB/iter  "
              f"{gbs:6.1f} GB/s  ({gbs / HBM_PEAK_GBS * 100:5.1f}% of "
              f"{HBM_PEAK_GBS:.0f} GB/s peak)", flush=True)
    # The remainder's binding limit is NOT bandwidth: XLA's row gather
    # runs at a fixed ~2 ns/row regardless of index pattern (sequential
    # indices measure the same 65 GB/s as random — per-index rate-bound).
    p_rows = int(h.rem_cols.shape[0])
    print(f"remainder gather floor: {p_rows} rows x ~2 ns = "
          f"{p_rows*2e-3:.0f} us of the {dt_r*1e6:.0f} us measured "
          f"(rate-bound; see docs/performance.md)", flush=True)


if __name__ == "__main__":
    main()
