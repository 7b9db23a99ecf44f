from . import distributed
from .edgeshard import (
    comm_bytes_per_step,
    make_edgeshard_apply,
    make_edgeshard_train_step,
    partition_batch,
)
from .locality import boundary_edge_count, locality_order, reorder_sample
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
    "boundary_edge_count",
    "comm_bytes_per_step",
    "edge_array_keys",
    "locality_order",
    "make_edgeshard_apply",
    "make_edgeshard_train_step",
    "make_parallel_apply",
    "make_parallel_train_step",
    "partition_batch",
    "reorder_sample",
    "stack_batches",
]
