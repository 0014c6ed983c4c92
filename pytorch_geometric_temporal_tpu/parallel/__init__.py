from .data_parallel import make_dp_train_step
from .mesh import make_mesh, named_sharding, replicate, shard_batch
from .partition import PartitionedGraph, spmm_partitioned

__all__ = [
    "make_dp_train_step",
    "make_mesh",
    "named_sharding",
    "replicate",
    "shard_batch",
    "PartitionedGraph",
    "spmm_partitioned",
]
