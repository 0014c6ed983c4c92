"""Device mesh helpers.

The reference's distribution story is Dask + torch DDP (gloo) over window
indices (``examples/indexBatching/DCRNN/pems_ddp.py:55-216``).  The
TPU-native equivalent is a ``jax.sharding.Mesh`` over the pod slice with
named axes, shardings annotated at jit boundaries, and XLA emitting the
collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(axes: Dict[str, int], devices: Optional[Sequence] = None) -> Mesh:
    """Create a mesh with named axes, e.g. ``make_mesh({'dp': 4, 'graph': 2})``.

    An axis size of -1 absorbs the remaining devices.
    """
    devices = list(devices if devices is not None else jax.devices())
    names = list(axes)
    sizes = [axes[n] for n in names]
    if sizes.count(-1) > 1:
        raise ValueError("at most one axis may be -1")
    known = int(np.prod([s for s in sizes if s != -1]))
    if -1 in sizes:
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh needs {total} devices, have {len(devices)}")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(*spec))


def replicate(tree, mesh: Mesh):
    """Place a pytree fully replicated over the mesh."""
    s = NamedSharding(mesh, PartitionSpec())
    return jax.device_put(tree, s)


def shard_batch(tree, mesh: Mesh, axis_name: str = "dp"):
    """Shard every array's leading dim over ``axis_name`` (data parallel)."""

    def put(x):
        spec = PartitionSpec(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)
