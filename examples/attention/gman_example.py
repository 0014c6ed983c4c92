"""GMAN on synthetic history->horizon traffic forecasting.

Mirrors the reference GMAN contract: X (B, num_his, N), spatial embedding
SE (N, K*d), temporal embedding TE (B, num_his+num_pred, 2) of
(day-of-week, time-of-day) indices.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_geometric_temporal_tpu.models import GMAN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    L, K, d = 1, 4, 4
    B, N, his, pred, spd = 4, 30, 12, 12, 288
    x = jnp.asarray(rng.normal(size=(B, his, N)).astype(np.float32))
    se = jnp.asarray(rng.normal(size=(N, K * d)).astype(np.float32))
    te = jnp.asarray(
        np.stack([rng.integers(0, 7, (B, his + pred)),
                  rng.integers(0, spd, (B, his + pred))], axis=-1)
    )
    y = jnp.asarray(rng.normal(size=(B, pred, N)).astype(np.float32))

    model = GMAN(L=L, K=K, d=d, num_his=his, bn_decay=0.1, steps_per_day=spd)
    variables = model.init(jax.random.PRNGKey(0), x, se, te)
    params, batch_stats = variables["params"], variables["batch_stats"]
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, se, te, True,
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.abs(out - y)), updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), bs, opt_state, loss

    for i in range(args.steps):
        params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                    opt_state)
        if i % 5 == 0:
            print(f"step {i}: MAE {float(loss):.4f}")
    print(f"final MAE {float(loss):.4f}")


if __name__ == "__main__":
    main()
