"""Data-parallel training step factory (replaces Dask-DDP).

Reference equivalent: ``DistributedSampler`` shards window indices and DDP
all-reduces gradients (``pems_ddp.py:83-85``, ``metr_la.py:220-228``).
Here: the batch dim is sharded over the 'dp' mesh axis, parameters are
replicated, and the gradient all-reduce is emitted by XLA from the sharding
constraints — one jitted function, no wrapper module, no hooks.

Combine with ``iter_index_batches(world_size=..., rank=...)`` across hosts;
within one host/slice a single sharded batch covers all chips.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_dp_train_step(
    loss_fn: Callable,
    optimizer,
    mesh: Mesh,
    axis_name: str = "dp",
    donate: bool = True,
):
    """Build a jitted data-parallel train step.

    Args:
        loss_fn: ``(params, x, y) -> scalar`` (already includes the model).
        optimizer: optax optimizer.
        mesh: device mesh with the ``axis_name`` axis.

    Returns:
        ``step(params, opt_state, x, y) -> (params, opt_state, loss)`` with
        x/y expected sharded on their leading dim (use
        :func:`~.mesh.shard_batch`); params/opt_state replicated.
    """
    repl = NamedSharding(mesh, PartitionSpec())
    batch = NamedSharding(mesh, PartitionSpec(axis_name))

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, batch, batch),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1) if donate else (),
    )
