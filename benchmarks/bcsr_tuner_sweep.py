"""On-device validation of the BCSR autotuner (θ spill threshold + pack).

The tuner picks two knobs from host-side structure alone:

- ``tune_min_block_edges`` (θ): which blocks become dense MXU tiles vs
  COO-remainder edges, from a measured time model (C_TILE_NS per kept
  tile, C_EDGE_NS per spilled edge — ``ops/bcsr.py``).
- ``tune_pack``: tiles per tile-kernel grid step, from the measured
  ~254 ns/step + ~39 ns/slot cost model.

This sweep MEASURES the hybrid spmm on the real device across a grid of
(θ, pack) for three qualitatively different 50k-node graphs — banded
(road-network-like), banded + 1% uniform cross edges, and fully uniform
— and reports how far the tuner's pick is from the measured best.  The
acceptance bar (VERDICT r3 #7): auto within 10% of measured-best on all
three shapes.

Run: ``python benchmarks/bcsr_tuner_sweep.py``  (TPU; ~3-5 min).
Results from the last accepted run are recorded in
``benchmarks/TUNER_SWEEP.md``.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from pytorch_geometric_temporal_tpu.ops import BCSRMatrix, Graph
from pytorch_geometric_temporal_tpu.ops.bcsr import (
    _bcsr_matmul_pallas,
    tune_min_block_edges,
    tune_pack,
)
from pytorch_geometric_temporal_tpu.utils.profiling import (
    device_time_per_iter,
)

N, DEG, F = 50_000, 40, 64


def make_graph(shape: str, n=N, deg=DEG, seed=1):
    rng = np.random.default_rng(seed)
    e = n * deg
    if shape == "banded":
        cross = 0.0
    elif shape == "banded+1%":
        cross = 0.01
    elif shape == "uniform":
        cross = 1.0
    else:
        raise ValueError(shape)
    e_loc = int(e * (1 - cross))
    s = rng.integers(0, n, size=e_loc)
    r = np.clip(s + rng.integers(-96, 97, size=e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, size=e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, size=e - e_loc)])
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    deg_r = np.bincount(r, weights=w, minlength=n).astype(np.float32)
    w = w / np.maximum(deg_r[r], 1e-6)
    return Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n), e, rng


def measure(g, e, rng, theta, pack, iters=200):
    mat = BCSRMatrix.from_graph(g, dtype=jnp.bfloat16,
                                min_block_edges=theta, expected_f=F,
                                pack=pack)
    h = mat.fwd
    x = jnp.asarray(rng.normal(size=(h.num_rows, F)).astype(np.float32))

    def stabil(a, half):
        return _bcsr_matmul_pallas(half, a) * 0.5 + a * 0.5

    # the operator rides as a jit operand (closing over it would bake the
    # tiles into the HLO — remote-compile payload limit)
    dt = device_time_per_iter(stabil, x, iters=iters, operands=(h,))
    return dt, h


def main():
    report = {}
    for shape in ("banded", "banded+1%", "uniform"):
        g, e, rng = make_graph(shape)
        s_h, r_h, _ = g.host_edges()
        s_np = np.asarray(s_h)[: g.num_edges]
        r_np = np.asarray(r_h)[: g.num_edges]
        theta_auto = tune_min_block_edges(r_np, s_np, g.num_nodes,
                                          dtype=jnp.bfloat16, expected_f=F)
        # measure auto first (also yields the auto pack via from_graph)
        dt_auto, h_auto = measure(g, e, rng, theta_auto, "auto")
        pack_auto = h_auto.pack
        print(f"[{shape}] auto: theta={theta_auto} pack={pack_auto} "
              f"{dt_auto*1e6:.1f}us ({e/dt_auto/1e9:.2f} G edges/s) "
              f"nnzb={h_auto.nnzb} rem={h_auto.num_rem}", flush=True)

        # Axis-aligned sweep (a full grid would be ~20 remote compiles per
        # shape): packs at θ_auto, then θs at pack_auto.
        best = (dt_auto, theta_auto, pack_auto)
        configs = [(theta_auto, p) for p in (1, 2, 3, 4, 8)
                   if p != pack_auto]
        configs += [(t, pack_auto) for t in sorted({1, 16, 64})
                    if t != theta_auto]
        for theta, pack in configs:
            try:
                dt, h = measure(g, e, rng, theta, pack)
            except Exception as ex:  # OOM guard for tiny-θ uniform
                print(f"  theta={theta} pack={pack} FAILED {ex}",
                      flush=True)
                continue
            print(f"  theta={theta} pack={pack} {dt*1e6:8.1f}us "
                  f"nnzb={h.nnzb} rem={h.num_rem}", flush=True)
            if dt < best[0]:
                best = (dt, theta, pack)
        gap = dt_auto / best[0] - 1.0
        report[shape] = {
            "auto": {"theta": int(theta_auto), "pack": int(pack_auto),
                     "us": round(dt_auto * 1e6, 1)},
            "best": {"theta": int(best[1]),
                     "pack": int(best[2]) if best[2] != "auto" else -1,
                     "us": round(best[0] * 1e6, 1)},
            "auto_vs_best_pct": round(gap * 100.0, 1),
        }
        print(f"[{shape}] auto is {gap*100:.1f}% off measured best "
              f"(theta={best[1]}, pack={best[2]})", flush=True)
    print(json.dumps(report))
    ok = all(v["auto_vs_best_pct"] <= 10.0 for v in report.values())
    print("TUNER", "WITHIN 10% ON ALL SHAPES" if ok else "OUT OF BOUNDS")


if __name__ == "__main__":
    main()
