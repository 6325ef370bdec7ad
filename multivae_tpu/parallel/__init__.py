"""Parallelism layer: device meshes, shardings, and the GPipe pipeline."""

from .pipeline import (
    pipe_mesh,
    pipeline_apply,
    stack_stages,
)
from .mesh import (
    batch_sharding,
    data_mesh,
    ensemble_batch_sharding,
    ensemble_sharding,
    make_mesh,
    replicated,
    shard_batch,
    tp_mesh,
    tp_param_spec,
    tp_shardings,
)

__all__ = [
    "batch_sharding",
    "data_mesh",
    "ensemble_batch_sharding",
    "ensemble_sharding",
    "make_mesh",
    "pipe_mesh",
    "pipeline_apply",
    "replicated",
    "stack_stages",
    "shard_batch",
    "tp_mesh",
    "tp_param_spec",
    "tp_shardings",
]
