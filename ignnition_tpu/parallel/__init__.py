from . import distributed
from .edgeshard import (
    comm_bytes_per_step,
    make_edgeshard_apply,
    make_edgeshard_train_step,
    partition_batch,
)
from .mesh import make_mesh, replicated
from .steps import (
    batch_partition_specs,
    edge_array_keys,
    make_parallel_apply,
    make_parallel_train_step,
    stack_batches,
)

__all__ = [
    "distributed",
    "make_mesh",
    "replicated",
    "batch_partition_specs",
    "comm_bytes_per_step",
    "edge_array_keys",
    "make_edgeshard_apply",
    "make_edgeshard_train_step",
    "make_parallel_apply",
    "make_parallel_train_step",
    "partition_batch",
    "stack_batches",
]
