"""Strategy × P table of ICI bytes per aggregation + predicted scaling.

Real multi-chip hardware is not reachable from this environment, so the
scaling claim is bounded analytically (VERDICT r3 #8): per-device ICI
egress volume is computed from the actual built partitions
(``PartitionedGraph.ici_bytes_per_step`` — halo sizes come from the real
partition cut, not a model), and combined with the measured single-chip
hybrid-kernel time to predict per-step efficiency:

    t_comp(P) = t_comp(1) / P          (aggregation is node-parallel)
    t_comm(P) = egress / BW_ICI        (ring algorithms, egress from table)
    eff(P)    = t_comp(P) / max(t_comp(P), t_comm(P))

The ICI bandwidth assumption is stated explicitly: ~45 GB/s one-way per
link on v5e's 2D torus; ring collectives are modeled on ONE link
(conservative — a 2D torus can ride two).

Run: ``python benchmarks/ici_volume.py [--markdown]``.  The committed
table lives in ``docs/performance.md`` ("Scaling" section).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pytorch_geometric_temporal_tpu.parallel import PartitionedGraph

ICI_ONEWAY_GBS = 45.0  # v5e, per link, one-way (conservative single-link)

# measured single-chip hybrid kernel time on this graph (round-4 bench:
# 483 us for N=50k, E=2M, F=64 — benchmarks/bcsr_breakdown.py)
T_SINGLE_CHIP_S = 483e-6
F = 64


def make_graph(n=50_000, deg=40, band=96, cross=0.05, seed=1):
    from pytorch_geometric_temporal_tpu.ops import Graph

    rng = np.random.default_rng(seed)
    e = n * deg
    e_loc = int(e * (1 - cross))
    s = rng.integers(0, n, size=e_loc)
    r = np.clip(s + rng.integers(-band, band + 1, size=e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, size=e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, size=e - e_loc)])
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    return Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)


def table(graph, f=F, ps=(2, 4, 8, 16), dtype_bytes=4):
    rows = []
    for p in ps:
        row = {"P": p}
        for by, name in (("receiver", "gather"), ("sender", "scatter"),
                         ("halo", "halo")):
            pg = PartitionedGraph.from_graph(graph, p, by=by)
            bts = pg.ici_bytes_per_step(f, dtype_bytes)
            t_comm = bts / (ICI_ONEWAY_GBS * 1e9)
            t_comp = T_SINGLE_CHIP_S / p
            eff = t_comp / max(t_comp, t_comm)
            row[name] = {"bytes": bts, "eff": eff}
            if by == "halo":
                row["halo_rows"] = pg.halo_size
        rows.append(row)
    return rows


def main():
    graph = make_graph()
    rows = table(graph)
    md = "--markdown" in sys.argv
    hdr = ("| P | gather MB (eff) | scatter MB (eff) | halo rows | "
           "halo MB (eff) |")
    print(hdr if md else hdr.replace("|", " "))
    if md:
        print("|---|---|---|---|---|")
    for r in rows:
        cells = [str(r["P"])]
        for k in ("gather", "scatter"):
            cells.append(f"{r[k]['bytes']/1e6:.2f} ({r[k]['eff']*100:.0f}%)")
        cells.append(str(r["halo_rows"]))
        cells.append(
            f"{r['halo']['bytes']/1e6:.3f} ({r['halo']['eff']*100:.0f}%)"
        )
        line = "| " + " | ".join(cells) + " |"
        print(line if md else line.replace("|", " "))
    print()
    print(f"assumptions: F={F} f32, single-chip hybrid kernel "
          f"{T_SINGLE_CHIP_S*1e6:.0f} us, ICI {ICI_ONEWAY_GBS:.0f} GB/s "
          "one-way single-link ring; fwd aggregation only (backward "
          "doubles volume AND compute, efficiency unchanged)")


if __name__ == "__main__":
    main()
