"""Parallelism layer: (model, data) device meshes and shardings."""

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
    "replicated",
    "shard_batch",
    "tp_mesh",
    "tp_param_spec",
    "tp_shardings",
]
