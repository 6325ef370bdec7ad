"""Parallelism layer: (model, data) device meshes and shardings."""

from .mesh import (
    batch_sharding,
    data_mesh,
    ensemble_batch_sharding,
    ensemble_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "data_mesh",
    "ensemble_batch_sharding",
    "ensemble_sharding",
    "make_mesh",
    "replicated",
    "shard_batch",
]
