"""Multi-host initialization and per-host data sharding helpers.

The reference's multi-worker story is Dask spawning torch-DDP processes
(``examples/indexBatching/DCRNN/pems_ddp.py:198-207``).  On TPU pods every
host runs the same program; ``jax.distributed.initialize`` wires the hosts
together and jit-compiled collectives span all chips.  Data is fed per host:
each host loads its own shard of window indices (``world_size``/``rank``
arguments on the index loaders).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX (no-op on single host / TPU auto-config).

    On Cloud TPU pods arguments are auto-detected; on other fabrics pass
    them explicitly.  Returns a dict with process_index/count to use as
    ``rank``/``world_size`` for the index loaders.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "rank": jax.process_index(),
        "world_size": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def assert_same_across_hosts(x) -> None:
    """Cheap cross-host consistency check for replicated values (e.g.
    params after restore): computes a global max-abs-diff via psum."""
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(x)
    if not leaves or jax.process_count() == 1:
        return
    s = sum(jnp.sum(jnp.asarray(l, jnp.float32)) for l in leaves)
    gathered = jax.pmap(lambda v: jax.lax.all_gather(v, "i"), axis_name="i")(
        jnp.broadcast_to(s, (jax.local_device_count(),))
    )
    host = jax.device_get(gathered)[0]
    if not bool(jnp.allclose(host, host[0])):
        raise AssertionError("replicated value differs across hosts")
