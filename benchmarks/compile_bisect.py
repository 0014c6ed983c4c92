"""Bisect the stacked-operator compile-time blow-up (VERDICT r4 weak #5).

Symptom: first compile of a ``lax.scan`` over ``stack_bcsr`` operators was
seconds at N=10k/T=3 but ~6 min at N=20k/T=4 on this platform's remote
compile helper.  This script separates the candidate factors by measuring,
for each (N, T) configuration:

- host build time (``BCSRMatrix.from_graph`` + ``stack_bcsr``),
- ``jit(...).lower()`` time (tracing + StableHLO emission — pure host),
- ``.compile()`` time for a SINGLE ``bcsr_spmm`` call (no scan): isolates
  Mosaic kernel compilation, which scales with the kernel grid (step count
  S), from scan machinery,
- ``.compile()`` time for the scan over the stacked operator,

with the operator always passed as a jit OPERAND (never closed over — a
closed-over operator is serialized into the HLO as constants, and the
remote compile endpoint both uploads that payload and constant-folds it;
that alone reproduces a minutes-long "compile").

Run on TPU: ``python benchmarks/compile_bisect.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_stack(rng, n, t, deg=30, band=64, pack=3):
    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.ops import (
        BCSRMatrix,
        Graph,
        stack_bcsr,
    )

    graphs = []
    for _ in range(t):
        e = n * deg
        s = rng.integers(0, n, size=e)
        r = np.clip(s + rng.integers(-band, band + 1, size=e), 0, n - 1)
        w = rng.uniform(0.1, 1.0, e).astype(np.float32)
        d = np.bincount(r, weights=w, minlength=n).astype(np.float32)
        w = w / np.maximum(d[r], 1e-6)
        graphs.append(Graph.from_edge_index(np.stack([s, r]), w,
                                            num_nodes=n))
    mats = [BCSRMatrix.from_graph(g, dtype=jnp.bfloat16,
                                  min_block_edges="auto", pack=pack)
            for g in graphs]
    return graphs, stack_bcsr(mats), mats


def run(configs=((10_000, 3), (10_000, 4), (20_000, 3), (20_000, 4)),
        f=64):
    import jax
    import jax.numpy as jnp

    from pytorch_geometric_temporal_tpu.ops import bcsr_spmm

    rng = np.random.default_rng(0)
    rows = []
    for n, t in configs:
        t0 = time.perf_counter()
        graphs, st, mats = make_stack(rng, n, t)
        t_build = time.perf_counter() - t0
        x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))

        def single(a, m):
            return bcsr_spmm(m, a)

        def scan_all(a, stk):
            def step(h, mat_t):
                return jnp.tanh(bcsr_spmm(mat_t, h)), None

            h, _ = jax.lax.scan(step, a, stk)
            return h

        row = {"n": n, "t": t, "S_fwd": int(st.fwd.step_rows.shape[1]),
               "nnzb": int(st.fwd.nnzb), "build_s": round(t_build, 1)}
        for name, fn, args in (("single", single, (x, mats[0])),
                               ("scan", scan_all, (x, st))):
            jfn = jax.jit(fn)
            t0 = time.perf_counter()
            lowered = jfn.lower(*args)
            t_lower = time.perf_counter() - t0
            t0 = time.perf_counter()
            lowered.compile()
            t_compile = time.perf_counter() - t0
            row[f"{name}_lower_s"] = round(t_lower, 2)
            row[f"{name}_compile_s"] = round(t_compile, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


if __name__ == "__main__":
    run()
