from . import distributed
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
    "edge_array_keys",
    "make_parallel_apply",
    "make_parallel_train_step",
    "stack_batches",
]
