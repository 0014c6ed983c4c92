"""Measure ASTGCN's attention share of the train step (ROADMAP follow-up).

The ROADMAP hypothesized "ASTGCN block attention could share QK
computations across blocks".  Sharing is NOT mathematically available:
block 2's attention reads block 1's *output* (different input, different
projections), and within a block the temporal attention reads ``x`` while
the spatial attention reads ``x_tilde = x·E`` — again different inputs.
What CAN be measured is the headroom such a fusion would chase: this
script times the reference-config ASTGCN train step (B=16, N=207, T=12,
2 blocks, 64 filters) against MSTGCN — the codebase's attention-free twin
(same block structure: ChebConv + time conv + residual + LayerNorm, minus
the temporal/spatial attention).  The delta bounds EVERYTHING
attention-related — projections, bilinear forms, softmaxes, the
attention-weighted Chebyshev, their backward — from above.

Run on TPU: ``python benchmarks/astgcn_attention_cost.py``.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(b=16, n=207, f=2, t=12, k=3, blocks=2, filters=64, iters=200):
    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_geometric_temporal_tpu.models import ASTGCN
    from pytorch_geometric_temporal_tpu.ops import Graph
    from pytorch_geometric_temporal_tpu.utils.profiling import (
        device_time_per_iter,
    )

    rng = np.random.default_rng(0)
    ei = np.unique(rng.integers(0, n, size=(2, 1800)), axis=1)
    g = Graph.from_edge_index(ei, num_nodes=n)
    x = jnp.asarray(rng.normal(size=(b, n, f, t)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(b, n, t)).astype(np.float32))

    model = ASTGCN(
        nb_block=blocks, in_channels=f, K=k, nb_chev_filter=filters,
        nb_time_filter=filters, time_strides=1, num_for_predict=t,
        len_input=t, num_of_vertices=n,
    )
    params = model.init(jax.random.PRNGKey(0), x, g)
    opt = optax.adam(1e-3)

    def step(carry, xb, yb):
        p, st = carry

        def loss(pp):
            return jnp.mean((model.apply(pp, xb, g) - yb) ** 2)

        _, grads = jax.value_and_grad(loss)(p)
        up, st = opt.update(grads, st, p)
        return (optax.apply_updates(p, up), st)

    dt_full = device_time_per_iter(step, (params, opt.init(params)),
                                   iters=iters, operands=(x, y))

    # ablation = MSTGCN, the attention-free twin (identical block
    # skeleton, no temporal/spatial attention modules) — its step time
    # is the zero-attention-cost reference point
    from pytorch_geometric_temporal_tpu.models import MSTGCN

    mst = MSTGCN(
        nb_block=blocks, in_channels=f, K=k, nb_chev_filter=filters,
        nb_time_filter=filters, time_strides=1, num_for_predict=t,
        len_input=t,
    )
    mparams = mst.init(jax.random.PRNGKey(0), x, g)

    def mstep(carry, xb, yb):
        p, st = carry

        def loss(pp):
            return jnp.mean((mst.apply(pp, xb, g) - yb) ** 2)

        _, grads = jax.value_and_grad(loss)(p)
        up, st = opt.update(grads, st, p)
        return (optax.apply_updates(p, up), st)

    dt_ab = device_time_per_iter(mstep, (mparams, opt.init(mparams)),
                                 iters=iters, operands=(x, y))
    rec = {
        "astgcn_step_ms": round(dt_full * 1e3, 3),
        "mstgcn_step_ms": round(dt_ab * 1e3, 3),
        "attention_share_pct": round((dt_full - dt_ab) / dt_full * 100, 1),
    }
    print(json.dumps(rec))
    return rec


if __name__ == "__main__":
    run()
